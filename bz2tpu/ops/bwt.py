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

Round structure (sorts are the cost; everything else is scans):
  * round 0 ranks THREE characters with a single 24-bit key — a 2-operand
    unstable sort (measured ~1/3 cheaper than the 3-operand form);
  * doubling rounds sort (rank, rank[i+k], index) — the index key breaks
    any ties surviving past k >= n (bit-identical rotations of periodic
    blocks) deterministically;
  * ranks are POSITION-based (rank = sorted position of the group head,
    the Larsson-Sadakane convention), which makes refinement local: a
    group splitting only renumbers inside its own span;
  * SPARSE ROUNDS (opt-in, BZ2TPU_SPARSE_BWT=1): once few positions
    remain tied (measured on real text: ~27% after 24 chars, ~8% after
    96), tied positions are compacted into a capacity/4 (then
    capacity/16) buffer and only they are re-sorted — the refinement
    scatters straight into the suffix-array slot of each group span.
    Worst-case (periodic) input simply stays in full rounds. This is the
    right trade where sort bandwidth dominates (real HBM); on the axon
    terminal the compaction/scatter overhead measurably loses end-to-end,
    so the default path runs full rounds only.

All shapes are static: a block is a (capacity,) uint8 array plus a valid
length scalar. Padding positions are assigned distinct sort keys strictly
greater than any valid key so they cluster at the tail of the order and
never perturb the suffix array of the valid prefix.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

_SPARSE_ROUNDS = os.environ.get("BZ2TPU_SPARSE_BWT", "0") == "1"


def _head_positions(head: jnp.ndarray) -> jnp.ndarray:
    """Sorted-order group ranks: position of each element's group head."""
    iota = jnp.arange(head.shape[0], dtype=jnp.int32)
    return lax.cummax(jnp.where(head, iota, 0))


def _inverse_permute(order: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """out[order[i]] = vals[i], via a 2-operand sort keyed on ``order``.

    Equivalent to ``zeros.at[order].set(vals)`` but measured 24% faster
    end-to-end on the BWT stage here (tools/probe4_out.jsonl: the axon AOT
    executables are built +prefer-no-scatter, so the scatter lowering is
    the slow path while ``lax.sort`` is the one primitive this backend
    runs well). ``order`` must be a permutation of 0..n-1.
    """
    _, out = lax.sort((order, vals), num_keys=1)
    return out


def _tied(head: jnp.ndarray) -> jnp.ndarray:
    """Element (in sorted order) is in a group of size >= 2."""
    nxt = jnp.concatenate([head[1:], jnp.ones((1,), jnp.bool_)])
    return ~head | ~nxt


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
        # Doubling rounds guarantee k < n (loop cond), so the modulo is one
        # conditional subtract — TPU integer division is a long expansion.
        s = iota + k
        return jnp.where(valid, jnp.where(s >= n, s - n, s), 0)

    def wrap0(k):
        # Round 0 only: k in {1, 2} is not bounded by n for degenerate
        # blocks, and this runs once, so the true modulo stays.
        return jnp.where(valid, (iota + k) % n, 0)

    # --- round 0: rank over 3 chars with one 24-bit key (2-operand sort).
    # Padding gets 2^24 + i: distinct and strictly above every valid key,
    # an invariant every re-rank preserves (padding sorts last, stays
    # singleton, and is never active).
    key24 = data * 65536 + data[wrap0(1)] * 256 + data[wrap0(2)]
    key0 = jnp.where(valid, key24, (1 << 24) + iota)
    key_sorted, order = lax.sort((key0, iota), num_keys=1)
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
    )
    rank = _inverse_permute(order, _head_positions(head))
    active = jnp.sum(_tied(head).astype(jnp.int32))
    if _SPARSE_ROUNDS:
        active_mask = jnp.zeros(cap, jnp.bool_).at[order].set(_tied(head))
    else:
        active_mask = jnp.zeros((1,), jnp.bool_)  # unused placeholder

    # --- full doubling rounds (all positions) --------------------------
    def full_round(state):
        rank, sa, active_mask, active, k = state
        second = jnp.where(valid, rank[wrap(k)], -1)
        key_r, key_s, order = lax.sort((rank, second, iota), num_keys=3)
        head = jnp.concatenate(
            [
                jnp.ones((1,), jnp.bool_),
                (key_r[1:] != key_r[:-1]) | (key_s[1:] != key_s[:-1]),
            ]
        )
        rank = _inverse_permute(order, _head_positions(head))
        tied = _tied(head)
        if _SPARSE_ROUNDS:
            active_mask = jnp.zeros(cap, jnp.bool_).at[order].set(tied)
        return rank, order, active_mask, jnp.sum(tied.astype(jnp.int32)), k * 2

    def full_cond(threshold):
        def cond(state):
            _, _, _, active, k = state
            return (active > threshold) & (k < n)

        return cond

    # --- sparse doubling rounds (tied positions only) ------------------
    def sparse_round(ccap):
        def round_(state):
            rank, sa, active_mask, active, k = state
            idx_a = jnp.nonzero(active_mask, size=ccap, fill_value=cap)[0].astype(
                jnp.int32
            )
            real = idx_a < cap
            safe = jnp.clip(idx_a, 0, cap - 1)
            r_a = jnp.where(real, rank[safe], (1 << 30))
            s_a = jnp.where(real, rank[jnp.where(real, (idx_a + k) % n, 0)], -1)
            r_s, s_s, i_s = lax.sort((r_a, s_a, idx_a), num_keys=3)
            r_head = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), r_s[1:] != r_s[:-1]]
            )
            head = r_head | jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), s_s[1:] != s_s[:-1]]
            )
            pos = jnp.arange(ccap, dtype=jnp.int32)
            # Subgroup rank = old group base + offset of the subgroup head
            # within its (contiguous) old group.
            sub_head = lax.cummax(jnp.where(head, pos, 0))
            grp_head = lax.cummax(jnp.where(r_head, pos, 0))
            new_rank = r_s + (sub_head - grp_head)
            real_s = i_s < cap
            rank = rank.at[jnp.where(real_s, i_s, cap)].set(new_rank, mode="drop")
            sa = sa.at[jnp.where(real_s, new_rank, cap)].set(i_s, mode="drop")
            tied = _tied(head) & real_s
            active_mask = (
                jnp.zeros(cap, jnp.bool_)
                .at[jnp.where(tied, i_s, cap)]
                .set(True, mode="drop")
            )
            return rank, sa, active_mask, jnp.sum(tied.astype(jnp.int32)), k * 2

        return round_

    state = (rank, order, active_mask, active, jnp.int32(3))
    if _SPARSE_ROUNDS:
        # Sparse tiers win when sorts/bandwidth dominate (real HBM): on
        # text, rounds past ~24 chars touch <27% of positions (PERF.md).
        # On the axon terminal the compaction+scatter overhead outweighs
        # the sort savings (measured end-to-end), so this is opt-in.
        ccap1 = max(cap // 4, 1024)
        ccap2 = max(cap // 16, 1024)
        state = lax.while_loop(full_cond(ccap1), full_round, state)
        state = lax.while_loop(
            lambda s: (s[3] > ccap2) & (s[3] > 0) & (s[4] < n),
            sparse_round(ccap1),
            state,
        )
        state = lax.while_loop(
            lambda s: (s[3] > 0) & (s[4] < n), sparse_round(ccap2), state
        )
        # Sparse rounds maintain sa lazily (a still-tied subgroup writes
        # only its head slot), so groups alive at the k >= n exit —
        # bit-identical rotations — would leave stale slots. One final
        # (rank, index) sort rebuilds sa completely with the index
        # tie-break, matching the full-round path's invariant.
        rank_f = state[0]
        _, sa = lax.sort((rank_f, iota), num_keys=2)
    else:
        state = lax.while_loop(full_cond(0), full_round, state)
        sa = state[1]

    orig_ptr = jnp.argmax(sa == 0).astype(jnp.int32)
    prev = jnp.where(sa == 0, n - 1, sa - 1)  # mod-free: 0 <= sa < cap
    last = jnp.where(valid, block[prev], 0).astype(jnp.uint8)
    return last, orig_ptr


bwt_encode_batch = jax.jit(
    jax.vmap(lambda b, n: bwt_encode(b, n)), static_argnames=()
)
