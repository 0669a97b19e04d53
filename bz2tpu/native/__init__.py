"""Host-native (C) runtime pieces: stream decoder and CRC32.

The compute path of the framework is JAX/XLA on TPU; this package is the
native host runtime around it, mirroring where the reference keeps C++
(its whole decode stack and CRC are host C++: reference
include/BlockDecompressor.hpp, include/CRC32.hpp). Falls back to the pure
NumPy implementations when the extension is not built.
"""

from __future__ import annotations

import os


def _build_inplace() -> bool:
    """Compile _bz2dec.c next to this file (one cc call, ~1 s).

    A fresh checkout has no .so; without this the whole C fast path
    (sequential/parallel decode, RLE1 intake, CRC) silently degrades to
    NumPy. Set BZ2TPU_NO_NATIVE_BUILD=1 to disable the auto-build.
    """
    if os.environ.get("BZ2TPU_NO_NATIVE_BUILD"):
        return False
    import subprocess
    import sysconfig

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "_bz2dec.c")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_bz2dec" + ext)
    if not os.path.exists(src):
        return False
    cc = sysconfig.get_config_var("CC") or "cc"
    cmd = [*cc.split(), "-O3", "-Wall", "-shared", "-fPIC",
           "-I", sysconfig.get_path("include"), src, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)  # atomic: parallel builders race safely
        return True
    except Exception:
        return False


def _load():
    import importlib

    try:
        from bz2tpu.native import _bz2dec as impl
    except ImportError:
        if not _build_inplace():
            raise
        from bz2tpu.native import _bz2dec as impl
    if not hasattr(impl, "inverse_rle1"):  # stale .so: rebuild once
        if _build_inplace():
            impl = importlib.reload(impl)
    return impl


try:  # pragma: no cover - exercised via the public wrappers
    _impl = _load()

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
