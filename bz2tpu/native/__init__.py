"""Host-native (C) runtime pieces: stream decoder and CRC32.

The compute path of the framework is JAX/XLA on TPU; this package is the
native host runtime around it, mirroring where the reference keeps C++
(its whole decode stack and CRC are host C++: reference
include/BlockDecompressor.hpp, include/CRC32.hpp). Falls back to the pure
NumPy implementations when the extension is not built.
"""

from __future__ import annotations

try:  # pragma: no cover - exercised via the public wrappers
    from bz2tpu.native import _bz2dec as _impl

    HAVE_NATIVE = True
    decode_stream = _impl.decode_stream
    crc32 = _impl.crc32
    rle1_split = _impl.rle1_split
    scan_blocks = _impl.scan_blocks
    decode_block_at = _impl.decode_block_at
    inverse_rle1 = _impl.inverse_rle1
    CrcError = _impl.CrcError
except (ImportError, AttributeError):  # extension not built, or stale build
    # predating newer entry points (AttributeError from _impl.<name>)
    HAVE_NATIVE = False
    decode_stream = None
    crc32 = None
    rle1_split = None
    scan_blocks = None
    decode_block_at = None
    inverse_rle1 = None
    CrcError = None
