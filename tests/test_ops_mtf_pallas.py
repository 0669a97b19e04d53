"""Pallas MTF rank kernel (interpreter mode) vs oracle and XLA path."""

import numpy as np
import jax.numpy as jnp
import pytest

from bz2tpu.ops.mtf_pallas import mtf_ranks_pallas


def _oracle_ranks(seq, n_in_use):
    mtf = list(range(n_in_use))
    out = []
    for v in seq:
        j = mtf.index(v)
        out.append(j)
        mtf.pop(j)
        mtf.insert(0, v)
    return out


@pytest.mark.parametrize(
    "n_sym,length,chunk",
    [(5, 100, 64), (256, 1000, 128), (30, 4095, 512), (3, 17, 256)],
)
def test_vs_oracle(rng, n_sym, length, chunk):
    seq = [int(rng.integers(n_sym))]
    while len(seq) < length:
        v = int(rng.integers(n_sym))
        if v != seq[-1]:
            seq.append(v)
    cap = length + 37
    padded = np.full(cap, -1, np.int32)
    padded[:length] = seq
    got = np.asarray(
        mtf_ranks_pallas(
            jnp.asarray(padded),
            jnp.int32(n_sym),
            m=jnp.int32(length),
            chunk=chunk,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got[:length], _oracle_ranks(seq, n_sym))


def test_full_mtf_stage_with_pallas(rng):
    from bz2tpu.oracle.encoder import bwt_encode as oracle_bwt, mtf_rle2_encode as oracle_mtf
    from bz2tpu.ops.mtf import mtf_rle2_encode

    from conftest import make_corpus

    arr = np.frombuffer(make_corpus(rng, "text", 3000), dtype=np.uint8)
    last, _ = oracle_bwt(arr)
    padded = np.zeros(4096, np.uint8)
    padded[: arr.size] = last
    # interpret=True is plumbed only in mtf_ranks_pallas; on CPU the
    # pallas_call in compiled mode is unsupported, so exercise via interpret
    # by monkeypatching the entry.
    import bz2tpu.ops.mtf_pallas as mp

    orig = mp.mtf_ranks_pallas
    try:
        mp.mtf_ranks_pallas = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        got = mtf_rle2_encode(
            jnp.asarray(padded), jnp.int32(arr.size), chunk=512, use_pallas=True
        )
    finally:
        mp.mtf_ranks_pallas = orig
    want = oracle_mtf(last)
    n_sym = int(got["n_sym"])
    assert n_sym == want.symbols.size
    np.testing.assert_array_equal(np.asarray(got["symbols"])[:n_sym], want.symbols)
