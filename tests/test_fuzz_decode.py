"""Decoder robustness fuzzing: corrupted and random streams must raise
clean ValueError-family errors — never crash, hang, or return garbage
silently. Exercises both the native C core and the NumPy fallback."""

import bz2 as stdlib_bz2

import numpy as np
import pytest

from bz2tpu import native
from bz2tpu.oracle.decoder import Bz2FormatError, decompress as np_decompress
from bz2tpu.runtime.decompressor import decompress

from conftest import make_corpus


def _decoders():
    out = [("numpy", lambda d: np_decompress(d))]
    if native.HAVE_NATIVE:
        out.append(("native", lambda d: native.decode_stream(d)))
    return out


@pytest.mark.parametrize("name,dec", _decoders())
def test_bitflip_fuzz(rng, name, dec):
    data = make_corpus(rng, "text", 60_000)
    comp = stdlib_bz2.compress(data, 1)
    for trial in range(120):
        buf = bytearray(comp)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(4, len(buf)))] ^= 1 << int(rng.integers(8))
        try:
            out = dec(bytes(buf))
            # Undetected corruption must at least produce *some* bytes; a
            # flip that leaves the stream fully valid is possible but the
            # CRC makes silent wrong output astronomically unlikely.
            assert isinstance(out, bytes)
        except ValueError:
            pass  # clean rejection is the expected outcome


@pytest.mark.parametrize("name,dec", _decoders())
def test_random_garbage(rng, name, dec):
    for size in (0, 1, 4, 14, 100, 5000):
        blob = b"BZh1" + rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        with pytest.raises(ValueError):
            dec(blob)


@pytest.mark.parametrize("name,dec", _decoders())
def test_truncation_sweep(rng, name, dec):
    data = make_corpus(rng, "text", 30_000)
    comp = stdlib_bz2.compress(data, 1)
    for frac in (0.1, 0.3, 0.5, 0.9, 0.99):
        with pytest.raises(ValueError):
            dec(comp[: int(len(comp) * frac)])


def test_driver_rejects_garbage(rng):
    with pytest.raises((Bz2FormatError, ValueError)):
        decompress(b"not a bzip2 stream at all")


def test_parallel_decode_falls_back_on_spurious_marker(rng):
    # A valid >=1MiB stream followed by junk containing the 48-bit block
    # marker: the optimistic scan finds a bogus header, the worker fails,
    # and decompress() must fall back to sequential decode of the real data.
    from bz2tpu.runtime.decompressor import _decompress_parallel

    data = make_corpus(rng, "text", 3_000_000)
    comp = stdlib_bz2.compress(data, 1)
    junk = comp + bytes.fromhex("314159265359") + b"\x00" * 6
    assert _decompress_parallel(junk, True) is None  # signals fallback
    assert decompress(junk) == data


def test_stream_short_reads(rng):
    # file-likes may return short reads before EOF; no byte may be lost.
    import io

    import bz2 as stdlib
    from bz2tpu.runtime.stream import compress_stream

    class Dribble(io.RawIOBase):
        def __init__(self, data):
            self._d = data
            self._p = 0

        def read(self, n=-1):
            if self._p >= len(self._d):
                return b""
            step = min(1234, n if n > 0 else 1234)
            out = self._d[self._p : self._p + step]
            self._p += len(out)
            return out

    data = make_corpus(rng, "text", 300_000)
    sink = io.BytesIO()
    compress_stream(Dribble(data), sink, level=1, parallel=2, chunk_blocks=2)
    assert stdlib.decompress(sink.getvalue()) == data
