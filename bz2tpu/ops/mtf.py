"""MTF + RLE2 encoding as vectorized scans (JAX).

The reference runs move-to-front as a strictly sequential 256-entry list
update per BWT byte inside each work-item (reference kernel.cpp:2514-2649).
That recurrence vectorizes via two observations:

1. **Recency identity.** MTF rank of symbol s at position i equals the
   number of symbols whose last occurrence before i is later than s's last
   occurrence before i (never-seen symbols get virtual occurrence times
   -(dense(u)+1), reproducing the initial list order). Last-occurrence
   times for all 256 dense symbols are a running cummax over one-hot
   position times, computed chunk-by-chunk with a carried 256-lane maximum.

2. **Run collapsing.** rank_i == 0 iff seq[i] == seq[i-1], and repeats do
   not change the MTF list (the symbol is already at the front). So the
   dense (chunk, 256) work only needs the *run-collapsed* sequence — for
   BWT output (long symbol clusters) that is typically 3-10x shorter. The
   chunk loop is a lax.while_loop whose trip count tracks the collapsed
   length, so compute scales with data entropy, not block capacity.

RLE2 (zero-run RUNA/RUNB coding, reference kernel.cpp:2612-2640) is closed
form in the collapsed domain: the zero run preceding collapsed position k
has length gap_k = i_k - i_{k-1} - 1, a run of length z emits
m = floor(log2(z+1)) digits, and digit t is bit t of (z+1) (bijective
base 2). Emission is scatter-free: each output position maps back to its
collapsed span, so digits and symbols are gathers. No sequential state
remains anywhere in the stage.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# Plain int (NOT jnp.int32): a module-scope jnp constant would initialize
# the XLA backend at import time, breaking jax.distributed.initialize in
# multi-host processes that import bz2tpu before calling it.
_NEG = -(1 << 30)
_USE_PALLAS_DEFAULT = os.environ.get("BZ2TPU_PALLAS", "0") == "1"
_MAX_RUN_DIGITS = 21  # floor(log2(900_001 + 1)) = 19; margin for any capacity


def _hist_by_sort(vals: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Histogram of ``vals`` into bins 0..n_bins-1 via sort + searchsorted.

    Entries outside [0, n_bins) are ignored (map them to >= n_bins before
    calling, e.g. a sentinel). Measured 2.2x faster than the scatter-add
    .at[].add(1) histogram on this backend (tools/probe8_out.jsonl:
    44 ms vs 97 ms per (8, 900k) batch row) — one cheap 1-operand sort
    plus a 257-query binary search instead of a scatter pass.
    """
    s = lax.sort((vals,), num_keys=1)[0]
    edges = jnp.arange(n_bins + 1, dtype=vals.dtype)
    cuts = jnp.searchsorted(s, edges, side="left")
    return (cuts[1:] - cuts[:-1]).astype(jnp.int32)


def _mtf_ranks_collapsed(seq: jnp.ndarray, m: jnp.ndarray, n_in_use: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """MTF ranks for a run-collapsed dense symbol sequence.

    seq: (cap,) int32 dense symbols, adjacent entries distinct, -1 padding
    beyond ``m``. Returns (cap,) int32 ranks (garbage at padding).
    """
    cap = seq.shape[0]
    pad = (-cap) % chunk
    seqp = jnp.pad(seq, (0, pad), constant_values=-1)
    n_chunks = seqp.shape[0] // chunk
    chunks = seqp.reshape(n_chunks, chunk)

    lanes = jnp.arange(256, dtype=jnp.int32)
    carry0 = jnp.where(lanes < n_in_use, -(lanes + 1), jnp.int32(_NEG))
    t_local = jnp.arange(chunk, dtype=jnp.int32)
    ranks0 = jnp.zeros((n_chunks, chunk), jnp.int32)

    k256 = jnp.arange(256, dtype=jnp.int32)

    def chunk_body(c, carry, ranks):
        # Rank of position i = #{lanes u: last-occurrence(u) before i >
        # last-occurrence(s_i) before i}. With the carry folded into row 0,
        # the INCLUSIVE cummax row i-1 is exactly "last occurrence before
        # i" for every lane — including lane s_i itself (s_{i-1} != s_i in
        # the collapsed domain), so the self lane never overcounts and no
        # exclusive shift or extra maximum pass is needed.
        #
        # All (chunk, 256) arrays run in int16 — half the scan/compare
        # traffic of int32. Local times fit 13 bits; the int32 carry enters
        # as its RANK mapped to [-512, -257): carry values are distinct on
        # used lanes and every unused lane (_NEG-tied, ranked arbitrarily)
        # stays strictly below every used lane, so all comparisons are
        # order-preserved.
        seq_c = chunks[c]
        order = jnp.argsort(carry)
        carry_v = (
            jnp.zeros(256, jnp.int32).at[order].set(k256) - 512
        ).astype(jnp.int16)
        onehot_t = jnp.where(
            seq_c[:, None] == lanes[None, :],
            t_local[:, None].astype(jnp.int16),
            jnp.int16(-32768),
        )
        arr = onehot_t.at[0].max(carry_v)
        incl = lax.cummax(arr, axis=0)
        self_idx = jnp.clip(seq_c, 0, 255)
        # Position 0 ranks against the carry; positions 1.. against row i-1.
        r0 = jnp.sum((carry > carry[self_idx[0]]).astype(jnp.int32))
        prev_rows = incl[:-1]  # rows 0..chunk-2 serve positions 1..chunk-1
        self_tail = jnp.take_along_axis(prev_rows, self_idx[1:, None], axis=1)
        r_tail = jnp.sum((prev_rows > self_tail).astype(jnp.int32), axis=1)
        r = jnp.concatenate([r0[None], r_tail])
        # Lanes that occurred in this chunk move their (int32, global-time)
        # carry forward; absent lanes keep it.
        occurred = incl[-1] >= 0
        carry = jnp.where(occurred, c * chunk + incl[-1].astype(jnp.int32), carry)
        return carry, ranks.at[c].set(r)

    def cond(state):
        c, _, _ = state
        return c * chunk < m

    def body(state):
        c, carry, ranks = state
        carry, ranks = chunk_body(c, carry, ranks)
        return c + 1, carry, ranks

    _, _, ranks = lax.while_loop(cond, body, (jnp.int32(0), carry0, ranks0))
    return ranks.reshape(-1)[:cap]


@functools.partial(jax.jit, static_argnames=("chunk", "use_pallas"))
def mtf_rle2_encode(
    last: jnp.ndarray,
    n: jnp.ndarray,
    *,
    chunk: int = 4096,  # 4096/8192/16384/32768 swept: 0.95/1.00/0.99/1.01 s
    use_pallas: bool = _USE_PALLAS_DEFAULT,
):
    """MTF + RLE2 encode the BWT last column.

    Args:
      last: (cap,) uint8 BWT output, padding beyond ``n`` ignored.
      n: scalar int32 valid length.

    Returns dict with:
      symbols: (cap + 2,) int32 — MTF/RLE2 symbol stream (RUNA=0, RUNB=1,
        value j -> j+1, EOB=n_in_use+1), -1 padding; n_sym entries valid.
      n_sym: scalar int32 — number of symbols incl. EOB.
      used: (256,) bool — byte-presence map.
      n_in_use: scalar int32.
      freqs: (258,) int32 — symbol histogram over the valid stream.
    """
    if chunk > 32768:
        # The scan runs its (chunk, 256) arrays in int16; local times must
        # fit 15 bits or the cummax last-occurrence invariant breaks.
        raise ValueError(f"mtf chunk must be <= 32768, got {chunk}")
    cap = last.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    valid = iota < n
    lasti = last.astype(jnp.int32)

    used_counts = _hist_by_sort(jnp.where(valid, lasti, 256), 256)
    used = used_counts > 0
    n_in_use = jnp.sum(used.astype(jnp.int32))
    dense = jnp.cumsum(used.astype(jnp.int32)) - 1
    seq = jnp.where(valid, dense[lasti], -1)

    # --- collapse runs: keep only change positions ---
    # Compaction by one 3-operand stable sort on a front/back key instead
    # of two masked scatters: change positions keep relative order at the
    # front, the rest sink. Same scatter-is-the-slow-path reasoning as the
    # BWT re-rank (ops/bwt.py:_inverse_permute, tools/probe4_out.jsonl).
    prev = jnp.concatenate([jnp.full((1,), -2, jnp.int32), seq[:-1]])
    change = valid & (seq != prev)
    m = jnp.sum(change.astype(jnp.int32))  # collapsed length
    front_key = jnp.where(change, iota, cap + iota)
    _, cseq_s, cidx_s = lax.sort((front_key, seq, iota), num_keys=1)
    k_pos = jnp.arange(cap, dtype=jnp.int32)
    cseq = jnp.where(k_pos < m, cseq_s, -1)
    cidx = jnp.where(k_pos < m, cidx_s, 0)

    if use_pallas:
        from bz2tpu.ops.mtf_pallas import mtf_ranks_pallas

        cranks = mtf_ranks_pallas(cseq, n_in_use, m=m, chunk=min(chunk, 2048))
    else:
        cranks = _mtf_ranks_collapsed(cseq, m, n_in_use, chunk)

    # --- RLE2 in the collapsed domain ---
    k_iota = jnp.arange(cap, dtype=jnp.int32)
    k_valid = k_iota < m
    # Zero run ending just before collapsed position k (repeats of the
    # previous symbol); collapsed position 0 with rank 0 (symbol already at
    # the list front) prepends one more zero to the run it starts.
    prev_idx = jnp.concatenate([jnp.zeros((1,), jnp.int32), cidx[:-1]])
    gap = jnp.where(k_iota > 0, cidx - prev_idx - 1, 0)
    r0_zero = cranks[0] == 0
    # Trailing repeats after the last change position.
    tail_gap = jnp.where(m > 0, n - 1 - cidx[jnp.maximum(m - 1, 0)], 0)

    # Each collapsed position k emits: digits(gap'_k) then (rank_k + 1),
    # where gap'_1 absorbs position 0 when r0_zero (and position 0 then
    # emits nothing). A virtual terminal slot k == m emits digits of the
    # trailing run. Emission counts:
    gap_eff = jnp.where((k_iota == 1) & r0_zero, gap + 1, gap)
    zp1 = jnp.where(k_valid & (gap_eff > 0), gap_eff + 1, 2)
    mdig = jnp.where(
        k_valid & (gap_eff > 0),
        jnp.floor(jnp.log2(zp1.astype(jnp.float32))).astype(jnp.int32),
        0,
    )
    sym_here = k_valid & ~((k_iota == 0) & r0_zero)
    emit = mdig + sym_here.astype(jnp.int32)
    # Terminal slot: trailing-run digits + EOB, handled after the scatter.
    offsets = jnp.cumsum(emit) - emit
    total = offsets[-1] + emit[-1]

    out = jnp.full(cap + 2 + _MAX_RUN_DIGITS + 1, -1, jnp.int32)
    otrash = out.shape[0] - 1
    # Emission without ANY output scatter: output position j belongs to the
    # collapsed position k whose span [offsets[k], offsets[k]+emit[k]) holds
    # j — recovered by filling span-start markers forward (one small scatter
    # + cummax); within the span the first mdig[k] items are run digits and
    # the last is the symbol, so out[j] is pure gather/elementwise.
    has_emit = k_valid & (emit > 0)
    k_of = jnp.zeros(cap + 1, jnp.int32).at[
        jnp.where(has_emit, offsets, cap)
    ].max(jnp.where(has_emit, k_iota, 0))[:cap]
    k_of = lax.cummax(k_of)
    j_iota = k_iota
    t_of = j_iota - offsets[k_of]
    body_val = jnp.where(
        t_of < mdig[k_of],
        (zp1[k_of] >> t_of) & 1,  # RUNA/RUNB digit t of the preceding run
        cranks[k_of] + 1,  # the symbol itself, after its run digits
    )
    out = out.at[: cap].set(jnp.where(j_iota < total, body_val, -1))
    # Trailing run digits + EOB, written as one small dynamic slice at the
    # end. r0_zero with m == 1 means the whole block is one symbol: the run
    # is tail_gap + 1 zeros (position 0 included) and no symbol was emitted.
    tz = jnp.where((m == 1) & r0_zero, tail_gap + 1, tail_gap)
    tzp1 = jnp.where(tz > 0, tz + 1, 2)
    tdig = jnp.where(tz > 0, jnp.floor(jnp.log2(tzp1.astype(jnp.float32))).astype(jnp.int32), 0)
    eob = n_in_use + 1
    t_lane = jnp.arange(_MAX_RUN_DIGITS + 1, dtype=jnp.int32)
    tail_vals = jnp.where(
        t_lane < tdig,
        (tzp1 >> t_lane) & 1,
        jnp.where(t_lane == tdig, eob, -1),
    )
    out = lax.dynamic_update_slice(out, tail_vals, (total,))
    n_sym = total + tdig + 1
    out = out.at[otrash].set(-1)
    out = out[: cap + 2]

    freqs = _hist_by_sort(jnp.where(out >= 0, out, 258), 258)
    return {
        "symbols": out,
        "n_sym": n_sym,
        "used": used,
        "n_in_use": n_in_use,
        "freqs": freqs,
    }
