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
