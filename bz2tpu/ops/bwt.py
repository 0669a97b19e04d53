"""Burrows-Wheeler transform via rank-doubling suffix sort (JAX).

The reference runs a ~2,400-LoC sequential divsufsort per GPU work-item
(reference kernel.cpp:61-2456, one bzip2 block per thread). A TPU core is a
vector machine, so the idiomatic design inverts this: ONE vectorized
prefix-doubling sort over the whole block (the same algorithm family as the
reference's own Larsson-Sadakane fallback, kernel.cpp:1241-1509, but as the
primary path), batched over blocks with vmap and sharded over chips.

Prefix doubling is O(n log n) worst case with NO data-dependent degradation
— it natively answers the reference's TRBudget/lsSort escape hatch
(kernel.cpp:2109-2142): low-entropy repetitive input simply runs its full
log2(n) rounds.

Round structure (cost = one 3-operand lexicographic sort per round):
  round 0 sorts (2-byte pair at i, 2-byte pair at i+2) -> rank over FOUR
  characters (the reference's sortTypeBstar similarly radix-sorts by the
  first two bytes, kernel.cpp:2152-2335); subsequent rounds double k from
  4. Sorts are unstable 3-key sorts with the rotation index as the last
  key, so the order emerging from the final round IS the suffix array —
  including the periodic-block case, where bit-identical rotations land in
  index order (any consistent order of identical rotations yields a valid
  BWT).

All shapes are static: a block is a (capacity,) uint8 array plus a valid
length scalar. Padding positions are assigned distinct sort keys strictly
greater than any valid key so they cluster at the tail of the order and
never perturb the suffix array of the valid prefix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _rerank(order: jnp.ndarray, key_r: jnp.ndarray, key_s: jnp.ndarray) -> jnp.ndarray:
    """New dense ranks from a sorted (rank, second) key sequence."""
    head = jnp.concatenate(
        [
            jnp.ones((1,), dtype=jnp.int32),
            ((key_r[1:] != key_r[:-1]) | (key_s[1:] != key_s[:-1])).astype(jnp.int32),
        ]
    )
    ranks_sorted = jnp.cumsum(head) - 1
    return jnp.zeros_like(ranks_sorted).at[order].set(ranks_sorted)


@functools.partial(jax.jit, static_argnames=("capacity",))
def bwt_encode(block: jnp.ndarray, n: jnp.ndarray, *, capacity: int | None = None):
    """BWT of the rotations of ``block[:n]``.

    Args:
      block: (capacity,) uint8, contents beyond ``n`` ignored.
      n: scalar int32 valid length, 1 <= n <= capacity.

    Returns:
      (last, orig_ptr): (capacity,) uint8 last column (zero-padded past n)
      and the sorted position of rotation 0.
    """
    if capacity is None:
        capacity = block.shape[-1]
    cap = capacity
    iota = jnp.arange(cap, dtype=jnp.int32)
    valid = iota < n
    data = block.astype(jnp.int32)

    def wrap(k):
        return jnp.where(valid, (iota + k) % n, 0)

    # Round 0: 16-bit character-pair keys at i and i+2 -> rank over 4 chars.
    # Padding gets 65536+i: distinct and strictly above every valid key, an
    # invariant every re-rank preserves (padding sorts last, so its new
    # ranks stay maximal).
    pair0 = data * 256 + data[wrap(1)]
    pair2 = pair0[wrap(2)]
    key_r = jnp.where(valid, pair0, 65536 + iota)
    key_s = jnp.where(valid, pair2, -1)
    # Rounds use UNSTABLE sorts (a stable TPU sort costs ~1.5x) with the
    # rotation index as a THIRD sort key: ties on (rank, second) — possible
    # only for bit-identical rotations of periodic blocks — break by index
    # deterministically, so the final round's order is always the suffix
    # array (matching the scalar oracle) with no extra tie-break pass.
    key_r, key_s, order = lax.sort((key_r, key_s, iota), num_keys=3)
    rank = _rerank(order, key_r, key_s)

    def round_(rank, k):
        second = jnp.where(valid, rank[wrap(k)], -1)
        key_r, key_s, order = lax.sort((rank, second, iota), num_keys=3)
        return _rerank(order, key_r, key_s), order

    def cond(state):
        rank, order, k = state
        all_distinct = jnp.max(rank) == cap - 1
        return (~all_distinct) & (k < n)

    def body(state):
        rank, order, k = state
        rank, order = round_(rank, k)
        return rank, order, k * 2

    _, sa, _ = lax.while_loop(cond, body, (rank, order, jnp.int32(4)))

    orig_ptr = jnp.argmax(sa == 0).astype(jnp.int32)
    last = jnp.where(valid, block[(sa - 1) % n], 0).astype(jnp.uint8)
    return last, orig_ptr


bwt_encode_batch = jax.jit(
    jax.vmap(lambda b, n: bwt_encode(b, n)), static_argnames=()
)
