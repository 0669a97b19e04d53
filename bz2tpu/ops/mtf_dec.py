"""Device inverse MTF + RUNA/RUNB run expansion (decode side).

The reference inverts MTF one symbol at a time with a 256-entry list
rotate and expands zero runs in the same serial loop (reference
include/BlockDecompressor.hpp:187-242, include/MoveToFront.hpp:31-75).
Both halves vectorize:

  * zero-run values: a maximal RUNA/RUNB digit segment (bijective base 2,
    LSB first — reference kernel.cpp:2612-2640 is the encoder's mirror)
    sums (digit+1) << position_in_segment, a segmented reduction over
    closed-form scans;
  * inverse MTF: each literal "move index j to front" is a fixed
    permutation rot_j of the 256-entry list, and list composition
    A[B] is associative — so per-chunk permutations compose sequentially
    inside chunks (a shift-and-select per step, no gathers) and an
    associative scan chains the chunk permutations; emitted bytes are
    initial_list[prefix_perm[local_emit_index]];
  * run bytes repeat the most recent literal byte (the list front never
    changes during a run), a forward-fill;
  * the expanded BWT column materializes with one searchsorted gather
    over the per-symbol output-length prefix sum.

Differential-tested against the oracle's serial decoder
(tests/test_ops_decode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bz2tpu.format import constants as C

_CHUNK = 128  # literals per permutation chunk (depth/width tradeoff)


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def mtf_rle2_decode(
    symbols: jnp.ndarray,
    n_sym: jnp.ndarray,
    initial_list: jnp.ndarray,
    eob: jnp.ndarray,
    *,
    out_capacity: int,
):
    """Expand MTF/RLE2 symbols into the BWT last column.

    Args:
      symbols: (M,) int32 symbols incl. the final EOB, -1 padded; M must be
        a multiple of the 128-literal chunk size.
      n_sym: scalar int32 (position of EOB + 1).
      initial_list: (256,) int32 — used byte values ascending, 0-padded.
      eob: scalar int32 EOB symbol value.
      out_capacity: static output buffer size (>= block capacity).

    Returns dict with bwt (out_capacity,) uint8, n_bwt, ok (False if a run
    overflows the output buffer or a digit run exceeds any legal length).
    """
    m = symbols.shape[0]
    assert m % _CHUNK == 0
    idx = jnp.arange(m, dtype=jnp.int32)
    valid = (idx < n_sym) & (symbols >= 0)
    sym = jnp.where(valid, symbols, eob)
    is_run = valid & (sym <= C.RUNB)
    is_lit = valid & (sym >= 2) & (sym != eob)

    # --- zero-run segment values (bijective base 2, LSB first) ---
    prev_run = jnp.concatenate([jnp.zeros((1,), jnp.bool_), is_run[:-1]])
    head = is_run & ~prev_run
    seg_start = jax.lax.cummax(jnp.where(head, idx, -1))
    pos_in_seg = idx - seg_start
    too_long = jnp.any(is_run & (pos_in_seg >= 25))
    contrib = jnp.where(
        is_run, (sym + 1) << jnp.clip(pos_in_seg, 0, 24), 0
    )
    csum = jnp.cumsum(contrib)
    # Segment end (exclusive): first non-run index after the head.
    nonrun_at = jnp.where(~is_run, idx, jnp.int32(2**31 - 1))
    after = jnp.concatenate([nonrun_at[1:], jnp.full((1,), m, jnp.int32)])
    seg_end = jnp.minimum(jnp.flip(jax.lax.cummin(jnp.flip(after))), m)
    excl_before = jnp.where(idx > 0, csum[jnp.maximum(idx - 1, 0)], 0)
    run_total = csum[jnp.clip(seg_end - 1, 0, m - 1)] - excl_before

    # --- literal compaction ---
    lit_rank = jnp.cumsum(is_lit.astype(jnp.int32)) - is_lit.astype(jnp.int32)
    n_lit = jnp.sum(is_lit.astype(jnp.int32))
    js = jnp.zeros(m, jnp.int32).at[
        jnp.where(is_lit, lit_rank, m)
    ].set(sym - 1, mode="drop")  # padding j=0 is the identity rotation

    # --- inverse MTF: chunked permutation scan over the literal sequence ---
    # Permutation entries are list indices 0..255, so the whole scan runs
    # in uint8 — 4x less traffic than int32 on the decode's widest arrays.
    n_chunks = m // _CHUNK
    jc = js.reshape(n_chunks, _CHUNK)
    k256 = jnp.arange(256, dtype=jnp.int32)

    def chunk_step(i, carry):
        q, emit = carry  # q: (n_chunks, 256) local perm; emit: (n_chunks, CHUNK)
        j = jc[:, i][:, None]  # (n_chunks, 1)
        e = jnp.take_along_axis(q, j, axis=1)[:, 0]
        emit = emit.at[:, i].set(e)
        q_shift = jnp.roll(q, 1, axis=1)
        q = jnp.where(k256[None, :] == 0, e[:, None], jnp.where(k256[None, :] <= j, q_shift, q))
        return q, emit

    q0 = jnp.broadcast_to(k256[None, :], (n_chunks, 256)).astype(jnp.uint8)
    qs, emit_local = jax.lax.fori_loop(
        0, _CHUNK, chunk_step, (q0, jnp.zeros((n_chunks, _CHUNK), jnp.uint8))
    )

    def compose(a, b):  # apply a first, then b: combined[k] = a[b[k]]
        return jnp.take_along_axis(a, b, axis=-1)

    q_incl = jax.lax.associative_scan(compose, qs, axis=0)
    q_excl = jnp.concatenate([q0[:1], q_incl[:-1]], axis=0)
    glob_emit = jnp.take_along_axis(q_excl, emit_local, axis=1)  # (n_chunks, CHUNK)
    lit_vals_flat = initial_list[glob_emit.reshape(-1)]  # (m,) byte per literal rank

    # --- per-symbol byte values ---
    lit_val_at = lit_vals_flat[jnp.clip(lit_rank, 0, m - 1)]  # literal positions
    last_lit_idx = jax.lax.cummax(jnp.where(is_lit, idx, -1))
    run_val = jnp.where(
        last_lit_idx >= 0,
        lit_vals_flat[jnp.clip(lit_rank[jnp.clip(last_lit_idx, 0, m - 1)], 0, m - 1)],
        initial_list[0],
    )

    # --- output expansion ---
    out_len = jnp.where(head, run_total, jnp.where(is_lit, 1, 0))
    out_cum = jnp.cumsum(out_len)
    n_bwt = out_cum[-1]
    ok = (n_bwt <= out_capacity) & (n_bwt > 0) & ~too_long
    q_pos = jnp.arange(out_capacity, dtype=jnp.int32)
    src = jnp.searchsorted(out_cum, q_pos, side="right").astype(jnp.int32)
    src = jnp.clip(src, 0, m - 1)
    byte = jnp.where(head[src], run_val[src], lit_val_at[src])
    bwt = jnp.where(q_pos < n_bwt, byte, 0).astype(jnp.uint8)
    return {"bwt": bwt, "n_bwt": n_bwt, "ok": ok}
