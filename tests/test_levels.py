"""Level sweep: every block-size level 1-9, both directions vs stdlib bz2."""

import bz2 as stdlib_bz2

import pytest

from bz2tpu.oracle import compress as oracle_compress
from bz2tpu.runtime.decompressor import decompress

from conftest import make_corpus


@pytest.mark.parametrize("level", range(1, 10))
def test_oracle_encode_all_levels(rng, level):
    data = make_corpus(rng, "text", 30_000)
    out = oracle_compress(data, level=level)
    assert out[:4] == b"BZh%d" % level
    assert stdlib_bz2.decompress(out) == data
    assert decompress(out) == data


@pytest.mark.parametrize("level", range(1, 10))
def test_decode_stock_all_levels(rng, level):
    # Stock fills real level-sized blocks; 250 kB spans >1 block at level 1-2.
    data = make_corpus(rng, "text", 250_000)
    assert decompress(stdlib_bz2.compress(data, level)) == data


def test_jax_pipeline_levels(rng):
    from bz2tpu.runtime.compressor import compress

    for level in (1, 2):  # higher levels only change padding, not logic
        data = make_corpus(rng, "runs", 150_000)
        out = compress(data, level=level)
        assert out[:4] == b"BZh%d" % level
        assert stdlib_bz2.decompress(out) == data


@pytest.mark.slow
def test_level9_full_capacity_round_trip(rng):
    # VERDICT r1: the 900k code paths (while-loop trip counts, run-digit
    # bounds, packed_words sizing) must be exercised by the suite, not only
    # by bench.py. One full-capacity level-9 block plus one crossing the
    # block boundary.
    import bz2 as stdlib_bz2
    import io

    from bz2tpu.format import constants as C
    from bz2tpu.runtime.stream import compress_stream

    n = C.block_capacity(9) + 1234  # crosses into a second block
    data = make_corpus(rng, "text", n)
    sink = io.BytesIO()
    compress_stream(io.BytesIO(data), sink, level=9, chunk_blocks=2)
    out = sink.getvalue()
    assert stdlib_bz2.decompress(out) == data
    # It really used level-9 blocks: exactly 2 block headers.
    from bz2tpu import native

    headers, ends = native.scan_blocks(out)
    assert len(headers) == 2 and len(ends) == 1


@pytest.mark.slow
def test_level9_capacity_boundary_exact(rng):
    # Exactly at capacity: a single full block.
    import bz2 as stdlib_bz2
    import io

    from bz2tpu import native
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.stream import compress_stream

    import numpy as np

    # Run-free bytes (no two adjacent equal): RLE1 output length == input
    # length exactly, so capacity bytes fill exactly one block.
    data = (np.arange(C.block_capacity(9), dtype=np.int64) % 251).astype(np.uint8).tobytes()
    sink = io.BytesIO()
    compress_stream(io.BytesIO(data), sink, level=9)
    out = sink.getvalue()
    assert stdlib_bz2.decompress(out) == data
    headers, _ = native.scan_blocks(out)
    assert len(headers) == 1


def test_level5_pipeline_round_trip(rng):
    # An intermediate level through the real pipeline (capacity 500k):
    # levels are not "just padding" — cuts, maxsel, and shapes change.
    import bz2 as stdlib_bz2

    from bz2tpu.runtime.compressor import compress

    data = make_corpus(rng, "text", 620_000)
    out = compress(data, level=5, parallel=2)
    assert stdlib_bz2.decompress(out) == data
