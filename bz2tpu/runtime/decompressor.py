"""Decompression driver.

The reference decompresses entirely on the host, single-threaded, one byte
per pull (reference include/InputStream.hpp:51-95, app.cpp:149-168). Our
format layer already vectorizes the heavy stages (pointer-doubling inverse
BWT, bulk inverse RLE1 — bz2tpu/oracle/decoder.py); this module is the
stream-level entry point. A batched JAX decode path (parallel per-block
Huffman decode + device inverse BWT) is the planned upgrade; the scalar
Huffman bit walk is currently host-side.
"""

from __future__ import annotations

from bz2tpu.oracle.decoder import (  # noqa: F401 — re-exported error types
    Bz2CrcError,
    Bz2FormatError,
    decompress,
)
