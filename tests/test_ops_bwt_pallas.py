"""Interpret-mode differential tests for the Pallas BWT kernels.

bitonic_sort_pallas vs lax.sort, rerank_pallas vs the XLA head/cummax
chain in ops/bwt.py, and bwt_encode_pallas vs bwt_encode bit-for-bit —
the same cross-check pattern as tests/test_ops_mtf_pallas.py.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from bz2tpu.ops.bwt import bwt_encode, _head_positions, _tied
from bz2tpu.ops.bwt_pallas import (
    bitonic_sort_pallas,
    bwt_encode_pallas,
    rerank_pallas,
)

from conftest import make_corpus


def _ref_sort(operands):
    outs = lax.sort(tuple(jnp.asarray(o) for o in operands), num_keys=len(operands))
    return tuple(np.asarray(o) for o in outs)


def test_bitonic_pairs_random(rng):
    for n in (128, 200, 1024, 5000):
        keys = rng.integers(0, 50, n).astype(np.int32)  # many duplicates
        vals = rng.permutation(n).astype(np.int32)
        got = bitonic_sort_pallas(
            (jnp.asarray(keys), jnp.asarray(vals)), interpret=True
        )
        want = _ref_sort((keys, vals))
        np.testing.assert_array_equal(np.asarray(got[0]), want[0])
        np.testing.assert_array_equal(np.asarray(got[1]), want[1])


def test_bitonic_three_operands(rng):
    n = 2000
    k1 = rng.integers(0, 20, n).astype(np.int32)
    k2 = rng.integers(-1, 20, n).astype(np.int32)  # -1 appears (padding ranks)
    val = np.arange(n, dtype=np.int32)
    got = bitonic_sort_pallas(
        (jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(val)), interpret=True
    )
    want = _ref_sort((k1, k2, val))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_bitonic_permutation_inverse(rng):
    # The inverse-permute use: keys are a permutation, values arbitrary.
    n = 900
    order = rng.permutation(n).astype(np.int32)
    vals = rng.integers(0, n, n).astype(np.int32)  # duplicates allowed
    _, got = bitonic_sort_pallas(
        (jnp.asarray(order), jnp.asarray(vals)), interpret=True
    )
    want = np.zeros(n, np.int32)
    want[order] = vals
    np.testing.assert_array_equal(np.asarray(got), want)


def _ref_rerank(cols):
    """The XLA chain from ops/bwt.py full_round, on sorted key columns."""
    head = jnp.ones((1,), jnp.bool_)
    neq = None
    for c in cols:
        c = jnp.asarray(c)
        d = c[1:] != c[:-1]
        neq = d if neq is None else (neq | d)
    head = jnp.concatenate([head, neq])
    pos = _head_positions(head)
    active = jnp.sum(_tied(head).astype(jnp.int32))
    return np.asarray(pos), int(active)


def test_rerank_single_key(rng):
    for n in (256, 777, 4096):
        k = np.sort(rng.integers(0, n // 3, n)).astype(np.int32)
        pos, active = rerank_pallas((jnp.asarray(k),), tile=1024, interpret=True)
        want_pos, want_active = _ref_rerank((k,))
        np.testing.assert_array_equal(np.asarray(pos), want_pos)
        assert int(active) == want_active


def test_rerank_two_keys(rng):
    n = 3000
    k1 = np.sort(rng.integers(0, 40, n)).astype(np.int32)
    k2 = rng.integers(-1, 25, n).astype(np.int32)
    # Sort k2 within k1 groups so the columns look like real sort output.
    order = np.lexsort((k2, k1))
    k1, k2 = k1[order], k2[order]
    pos, active = rerank_pallas(
        (jnp.asarray(k1), jnp.asarray(k2)), tile=512, interpret=True
    )
    want_pos, want_active = _ref_rerank((k1, k2))
    np.testing.assert_array_equal(np.asarray(pos), want_pos)
    assert int(active) == want_active


def test_rerank_all_distinct_and_all_equal():
    n = 512
    distinct = np.arange(n, dtype=np.int32)
    pos, active = rerank_pallas((jnp.asarray(distinct),), tile=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(pos), distinct)
    assert int(active) == 0
    equal = np.zeros(n, np.int32)
    pos, active = rerank_pallas((jnp.asarray(equal),), tile=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(pos), np.zeros(n, np.int32))
    assert int(active) == n


def _bwt_pair(data: bytes, capacity: int):
    arr = np.zeros(capacity, np.uint8)
    arr[: len(data)] = np.frombuffer(data, np.uint8)
    want_last, want_ptr = bwt_encode(jnp.asarray(arr), jnp.int32(len(data)))
    got_last, got_ptr = bwt_encode_pallas(
        jnp.asarray(arr), jnp.int32(len(data)), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_last), np.asarray(want_last))
    assert int(got_ptr) == int(want_ptr)


def test_bwt_pallas_matches_xla_text(rng):
    _bwt_pair(make_corpus(rng, "text", 700), 1024)


def test_bwt_pallas_matches_xla_random(rng):
    _bwt_pair(make_corpus(rng, "random", 1000), 1024)


def test_bwt_pallas_matches_xla_runs(rng):
    # Low-entropy periodic input: full round count, surviving ties.
    _bwt_pair(bytes(bytearray(range(1, 8)) * 100), 1024)
    _bwt_pair(b"ab" * 300, 1024)


def test_bwt_pallas_tiny_blocks():
    for data in (b"a", b"ab", b"aaa", b"abcd"):
        _bwt_pair(data, 256)


def test_bwt_pallas_partial_capacity(rng):
    # n far below capacity: padding keys must stay inert.
    _bwt_pair(make_corpus(rng, "text", 100), 2048)


def test_bwt_stage_pallas_batch(rng):
    # The pipeline wiring (BZ2TPU_PALLAS_BWT=1 path) over a small batch.
    from bz2tpu.ops.pipeline import bwt_stage, bwt_stage_pallas

    cap, B = 512, 3
    blocks = np.zeros((B, cap), np.uint8)
    ns = np.zeros(B, np.int32)
    for i, kind in enumerate(("text", "runs", "alternating")):
        d = np.frombuffer(make_corpus(rng, kind, 300 + 50 * i), np.uint8)
        blocks[i, : d.size] = d
        ns[i] = d.size
    got_last, got_ptr = bwt_stage_pallas(
        jnp.asarray(blocks), jnp.asarray(ns), interpret=True
    )
    want_last, want_ptr = bwt_stage(jnp.asarray(blocks), jnp.asarray(ns))
    np.testing.assert_array_equal(np.asarray(got_last), np.asarray(want_last))
    np.testing.assert_array_equal(np.asarray(got_ptr), np.asarray(want_ptr))
