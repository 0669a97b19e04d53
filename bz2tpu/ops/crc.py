"""Device CRC-32/BZIP2: lane-parallel table steps + GF(2) operator folds.

The reference computes CRCs strictly serially on the host, one byte at a
time (reference include/CRC32.hpp:62-74, include/BlockCompressor.hpp:137).
CRC over GF(2) is linear, so the TPU formulation decomposes it:

  * the buffer is cut into L equal lanes; all lanes advance together one
    byte-position per step (a (B, L) table gather per step — vectorized,
    k = N/L sequential steps instead of N);
  * per-lane results fold pairwise in log2(L) rounds using the precomputed
    "advance past m zero bytes" operator (a 32x32 GF(2) matrix, applied as
    32 conditional XORs);
  * arbitrary [start, end) ranges of one buffer need no per-range pass:
    bytes outside the range are masked to zero during the lane steps (zero
    bytes apply exactly the linear shift operator), and the result is
    corrected with inverse/forward operator ladders (the shift operator is
    invertible because the CRC polynomial has a nonzero constant term).

The host/NumPy oracle with the same decomposition is
bz2tpu/format/crc32.py; differential tests pin both to crc32_serial.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from bz2tpu.format.crc32 import (
    CRC32_TABLE,
    _op_compose,
    _op_identity,
    _op_shift_one_byte,
)

_MASK32 = np.uint32(0xFFFFFFFF)


def _op_inverse(op: np.ndarray) -> np.ndarray:
    """Invert a 32x32 GF(2) operator given as 32 uint32 columns."""
    # Gaussian elimination over GF(2) on the augmented [op | I] columns.
    a = op.astype(np.uint64).copy()
    inv = _op_identity().astype(np.uint64)
    for bit in range(32):
        pivot = None
        for c in range(bit, 32):
            if (a[c] >> bit) & 1:
                pivot = c
                break
        assert pivot is not None, "shift operator must be invertible"
        a[[bit, pivot]] = a[[pivot, bit]]
        inv[[bit, pivot]] = inv[[pivot, bit]]
        for c in range(32):
            if c != bit and ((a[c] >> bit) & 1):
                a[c] ^= a[bit]
                inv[c] ^= inv[bit]
    return inv.astype(np.uint32)


@functools.cache
def _ladder_tables(max_log: int) -> tuple[np.ndarray, np.ndarray]:
    """(fwd, inv): (max_log, 32) uint32 operator tables, fwd[k] advancing a
    CRC state past 2^k zero bytes and inv[k] undoing it. ``max_log`` is
    derived from the (static) chunk size so every reachable exponent is
    covered — a ladder shorter than log2(n) would silently drop high
    exponent bits and emit wrong CRCs."""
    fwd = np.empty((max_log, 32), dtype=np.uint32)
    m = _op_shift_one_byte()
    mi = _op_inverse(m)
    inv = np.empty((max_log, 32), dtype=np.uint32)
    for k in range(max_log):
        fwd[k] = m
        inv[k] = mi
        m = _op_compose(m, m)
        mi = _op_compose(mi, mi)
    return fwd, inv


@functools.cache
def _fold_ops(k: int, rounds: int) -> np.ndarray:
    """(rounds, 32) operators: round r advances past k * 2^r zero bytes."""
    from bz2tpu.format.crc32 import shift_operator

    ops = np.empty((rounds, 32), dtype=np.uint32)
    op = shift_operator(k)
    for r in range(rounds):
        ops[r] = op
        op = _op_compose(op, op)
    return ops


def _apply_op(op: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    """Apply a GF(2) operator (32 uint32 columns) to uint32 state(s)."""
    bits = (state[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    terms = jnp.where(bits.astype(bool), op, jnp.uint32(0))
    return jax.lax.reduce(
        terms, jnp.uint32(0), jax.lax.bitwise_xor, dimensions=[terms.ndim - 1]
    )


def _apply_ladder(ops: jnp.ndarray, exponent: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    """Apply op^exponent via the binary ladder (ops[k] = op^(2^k))."""

    def body(k, s):
        bit = ((exponent >> k) & 1).astype(bool)
        return jnp.where(bit, _apply_op(ops[k], s), s)

    return jax.lax.fori_loop(0, ops.shape[0], body, state)


@functools.partial(jax.jit, static_argnames=("lanes",))
def crc32_ranges(
    chunk: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray, *, lanes: int = 512
) -> jnp.ndarray:
    """Finalized CRC-32/BZIP2 of chunk[starts[b]:ends[b]] for each range b.

    Args:
      chunk: (N,) uint8 with N a multiple of `lanes` (pad with anything:
        bytes outside every range are masked off).
      starts/ends: (B,) int32 byte ranges, 0 <= start <= end <= N.

    One lane pass over the chunk serves every range: all B range masks ride
    the same (B, lanes) state array, so device traffic is O(B*N) table
    gathers but only one read of the chunk.
    """
    n = chunk.shape[0]
    assert n % lanes == 0 and n > 0
    k = n // lanes
    b = starts.shape[0]
    tab = jnp.asarray(CRC32_TABLE)
    lane_data = chunk.reshape(lanes, k)
    lane_base = (jnp.arange(lanes, dtype=jnp.int32) * k)[None, :]  # (1, L)
    starts_c = starts.astype(jnp.int32)[:, None]  # (B, 1)
    ends_c = ends.astype(jnp.int32)[:, None]

    def step(j, states):  # states: (B, L) uint32, raw (init 0) per lane
        gidx = lane_base + j
        mask = (gidx >= starts_c) & (gidx < ends_c)
        byte = jnp.where(mask, lane_data[:, j][None, :], 0).astype(jnp.uint32)
        idx = ((states >> jnp.uint32(24)) ^ byte) & jnp.uint32(0xFF)
        return (states << jnp.uint32(8)) ^ tab[idx]

    states = jax.lax.fori_loop(
        0, k, step, jnp.zeros((b, lanes), dtype=jnp.uint32)
    )

    rounds = int(np.log2(lanes))
    assert 1 << rounds == lanes, "lanes must be a power of two"
    fold = jnp.asarray(_fold_ops(k, rounds))
    for r in range(rounds):
        a_st = states[:, 0::2]
        b_st = states[:, 1::2]
        states = _apply_op(fold[r], a_st) ^ b_st
    raw_masked = states[:, 0]  # raw0 state of 0^start || x || 0^(N-end)

    # Exponents passed to the ladders are at most n (a static shape), so a
    # ladder of ceil(log2(n + 1)) rungs covers every reachable value.
    max_log = max(1, int(np.ceil(np.log2(n + 1))))
    fwd, inv = (jnp.asarray(t) for t in _ladder_tables(max_log))
    # Undo the trailing zero padding, then add the init-state contribution.
    raw_x = _apply_ladder(inv, (jnp.int32(n) - ends.astype(jnp.int32)), raw_masked)
    init_part = _apply_ladder(
        fwd,
        (ends - starts).astype(jnp.int32),
        jnp.full((b,), jnp.uint32(0xFFFFFFFF)),
    )
    return (raw_x ^ init_part) ^ jnp.uint32(0xFFFFFFFF)


def crc32_device(data: jnp.ndarray, length: jnp.ndarray | int, *, lanes: int = 512) -> jnp.ndarray:
    """Finalized CRC of data[:length] (padded fixed-shape buffer)."""
    starts = jnp.zeros((1,), dtype=jnp.int32)
    ends = jnp.asarray([length], dtype=jnp.int32).reshape(1)
    return crc32_ranges(data, starts, ends, lanes=lanes)[0]
