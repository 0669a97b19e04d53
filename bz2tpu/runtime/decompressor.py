"""Decompression driver.

The reference decompresses entirely on the host in C++ (reference
include/InputStream.hpp:51-95, include/BlockDecompressor.hpp, app.cpp:
149-168); our native counterpart is bz2tpu/native/_bz2dec.c (C, streaming,
all-conformant-streams). When the extension is unavailable the vectorized
NumPy decoder (bz2tpu/oracle/decoder.py) serves as the fallback. Both raise
the same exception types.
"""

from __future__ import annotations

from bz2tpu import native
from bz2tpu.oracle.decoder import Bz2CrcError, Bz2FormatError  # noqa: F401
from bz2tpu.oracle.decoder import decompress as _oracle_decompress


def decompress(stream: bytes, verify_crc: bool = True) -> bytes:
    if native.HAVE_NATIVE:
        try:
            return native.decode_stream(bytes(stream), verify_crc)
        except native.CrcError as e:
            raise Bz2CrcError(str(e)) from None
        except ValueError as e:
            raise Bz2FormatError(str(e)) from None
    return _oracle_decompress(stream, verify_crc=verify_crc)
