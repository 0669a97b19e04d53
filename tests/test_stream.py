"""Streaming compression: bounded-memory file API + bit stitcher."""

import bz2 as stdlib_bz2
import io

import numpy as np
import pytest

from bz2tpu.format.bitio import BitWriter, concat_bitstreams
from bz2tpu.runtime.stream import BitStitcher, compress_stream
from bz2tpu.utils.metrics import RunMetrics

from conftest import make_corpus


def test_stitcher_matches_concat(rng):
    parts = []
    for _ in range(20):
        nbits = int(rng.integers(1, 200))
        w = BitWriter()
        for _ in range(nbits):
            w.write_bit(int(rng.integers(2)))
        parts.append((np.frombuffer(w.getvalue(), np.uint8), w.bit_length))
    want, _ = concat_bitstreams(parts)
    sink = io.BytesIO()
    st = BitStitcher(sink)
    for data, nbits in parts:
        st.append(data, nbits)
    st.finish()
    np.testing.assert_array_equal(np.frombuffer(sink.getvalue(), np.uint8), want)


def test_compress_stream_round_trip(rng):
    # Multi-chunk streaming at level 1 with small batches: 500 kB -> 6 blocks,
    # processed in rounds of 2 with leftover carry between rounds.
    data = make_corpus(rng, "text", 500_000)
    sink = io.BytesIO()
    m = RunMetrics()
    compress_stream(io.BytesIO(data), sink, level=1, parallel=2, chunk_blocks=2, metrics=m)
    out = sink.getvalue()
    assert stdlib_bz2.decompress(out) == data
    assert m.blocks >= 5


def test_compress_stream_run_across_chunk_boundary(rng):
    # Long runs that cross the held-back block boundary re-split cleanly.
    data = (b"a" * 150_000) + make_corpus(rng, "runs", 250_000)
    sink = io.BytesIO()
    compress_stream(io.BytesIO(data), sink, level=1, parallel=2, chunk_blocks=2)
    assert stdlib_bz2.decompress(sink.getvalue()) == data


def test_compress_stream_small_input(rng):
    data = b"tiny"
    sink = io.BytesIO()
    compress_stream(io.BytesIO(data), sink, level=9, parallel=4)
    assert stdlib_bz2.decompress(sink.getvalue()) == data


def test_compress_stream_empty():
    sink = io.BytesIO()
    compress_stream(io.BytesIO(b""), sink, level=9)
    assert stdlib_bz2.decompress(sink.getvalue()) == b""


def test_device_stitch_mode_bit_identical(rng, monkeypatch):
    # The default on-device batch concatenation must be byte-identical to
    # the per-block host stitch (BZ2TPU_DEVICE_STITCH=0 path).
    import io

    import bz2tpu.runtime.compressor as rc
    from bz2tpu.runtime.stream import compress_stream

    data = make_corpus(rng, "text", 500_000)
    monkeypatch.setattr(rc, "_DEVICE_STITCH", False)
    want = io.BytesIO()
    compress_stream(io.BytesIO(data), want, level=1, chunk_blocks=2, parallel=2)
    monkeypatch.setattr(rc, "_DEVICE_STITCH", True)
    got = io.BytesIO()
    compress_stream(io.BytesIO(data), got, level=1, chunk_blocks=2, parallel=2)
    assert got.getvalue() == want.getvalue()
    assert rc.compress(data, level=1, parallel=2) == want.getvalue()
