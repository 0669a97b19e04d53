"""Device RLE1 intake: scan-based run detection + block splitting.

The reference runs its first-stage RLE byte-at-a-time in a host state
machine (reference include/BlockCompressor.hpp:69-96,134-154: runs of
4..255 become 4 literals + a count byte, CRC over the original bytes).
Here the whole stage is data-parallel on device:

  * run heads are change flags; 'pieces' (the oracle's unit, at most 255
    raw bytes, restarting the run state) come from dividing each
    position's run offset by 255 — so every output byte's position is a
    closed-form function of per-position scans (cumsum / cummax), and the
    encoded bytes land with two bounded scatters;
  * block splitting at piece boundaries is a searchsorted over the piece
    output cumsum (greedy capacity packing, identical to the oracle
    splitter bz2tpu/oracle/encoder.py:97-132);
  * per-block CRCs over the ORIGINAL bytes come from bz2tpu/ops/crc.py
    range CRCs — no second pass over the data on the host.

Differential-tested against the oracle splitter and the native C intake
(tests/test_ops_intake.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from bz2tpu.format import constants as C

_BIG = np.int32(2**31 - 1)


def out_capacity(n: int) -> int:
    """Static worst-case RLE1 output size for n input bytes (5/4 growth)."""
    return n + n // 4 + 8


@functools.partial(jax.jit, static_argnames=())
def rle1_encode(data: jnp.ndarray, length: jnp.ndarray):
    """RLE1-encode data[:length] (fixed-shape, device).

    Args:
      data: (N,) uint8, padded arbitrarily past `length`.
      length: scalar int32 valid byte count.

    Returns dict with:
      out: (out_capacity(N),) uint8 encoded bytes
      out_len: scalar int32
      piece_out_cum: (N,) int32 inclusive cumulative OUTPUT length per piece
        index (entries past n_pieces = INT32_MAX sentinels, so a
        searchsorted gives greedy block cuts)
      piece_raw_cum: (N,) int32 inclusive cumulative RAW length per piece
      n_pieces: scalar int32
    """
    n = data.shape[0]
    no = out_capacity(n)
    idx = jnp.arange(n, dtype=jnp.int32)
    length = jnp.asarray(length, dtype=jnp.int32)
    valid = idx < length
    d = jnp.where(valid, data.astype(jnp.int32), -1)
    prev = jnp.concatenate([jnp.full((1,), -2, jnp.int32), d[:-1]])
    change = valid & (d != prev)

    run_start = jax.lax.cummax(jnp.where(change, idx, -1))
    off_in_run = idx - run_start
    piece_in_run = off_in_run // 255
    off_in_piece = off_in_run % 255
    piece_head = valid & (off_in_piece == 0)
    piece_id = jnp.cumsum(piece_head.astype(jnp.int32)) - 1

    # run_end[i] = first run-head index AFTER i (or `length`).
    nxt = jnp.where(change, idx, _BIG)
    after = jnp.concatenate([nxt[1:], jnp.full((1,), _BIG, jnp.int32)])
    run_end = jnp.minimum(jnp.flip(jax.lax.cummin(jnp.flip(after))), length)
    piece_start = run_start + 255 * piece_in_run
    piece_end = jnp.minimum(piece_start + 255, run_end)
    piece_raw = piece_end - piece_start
    piece_out = jnp.where(piece_raw >= C.RLE1_MIN_RUN, 5, piece_raw)

    # Output byte positions: literals for offsets 0..3; the count byte of a
    # >=4-raw piece rides with offset 3 (it exists iff the piece has a 4th
    # raw byte).
    contrib = (valid & (off_in_piece < C.RLE1_MIN_RUN)).astype(jnp.int32) + (
        valid & (off_in_piece == C.RLE1_MIN_RUN - 1)
    ).astype(jnp.int32)
    cum = jnp.cumsum(contrib)
    out_pos = cum - contrib
    out_len = cum[-1]

    out = jnp.zeros(no, dtype=jnp.uint8)
    lit_mask = valid & (off_in_piece < C.RLE1_MIN_RUN)
    out = out.at[jnp.where(lit_mask, out_pos, no)].set(data, mode="drop")
    cnt_mask = valid & (off_in_piece == C.RLE1_MIN_RUN - 1)
    cnt_val = (piece_raw - C.RLE1_MIN_RUN).astype(jnp.uint8)
    out = out.at[jnp.where(cnt_mask, out_pos + 1, no)].set(cnt_val, mode="drop")

    # Per-piece cumulative sums, dense by piece index (sentinel tail).
    piece_out_cum = jnp.full(n, _BIG, jnp.int32)
    piece_out_cum = piece_out_cum.at[
        jnp.where(piece_head, piece_id, n)
    ].set(out_pos + piece_out, mode="drop")
    piece_raw_cum = jnp.full(n, _BIG, jnp.int32)
    piece_raw_cum = piece_raw_cum.at[
        jnp.where(piece_head, piece_id, n)
    ].set(piece_end, mode="drop")
    n_pieces = jnp.sum(piece_head.astype(jnp.int32))
    return {
        "out": out,
        "out_len": out_len,
        "piece_out_cum": piece_out_cum,
        "piece_raw_cum": piece_raw_cum,
        "n_pieces": n_pieces,
    }


@functools.partial(jax.jit, static_argnames=("cap", "max_blocks"))
def block_cuts(
    piece_out_cum: jnp.ndarray,
    piece_raw_cum: jnp.ndarray,
    n_pieces: jnp.ndarray,
    *,
    cap: int,
    max_blocks: int,
):
    """Stock bzip2's block-fill rule at piece boundaries (oracle
    rle1_split): a block takes pieces through the FIRST one whose
    cumulative output reaches ``cap`` (bzlib nblockMAX; the crossing
    piece overshoots by up to 4 bytes), or the rest when none crosses.

    Returns (out_cuts, raw_cuts, n_blocks): block b covers output bytes
    [out_cuts[b-1], out_cuts[b]) and raw bytes [raw_cuts[b-1], raw_cuts[b])
    (with implicit leading 0). Unused slots repeat the final cut.
    """
    last = jnp.maximum(n_pieces - 1, 0)
    total_out = jnp.where(n_pieces > 0, piece_out_cum[last], 0)

    def body(b, st):
        out_base, out_cuts, raw_cuts, n_blocks = st
        active = out_base < total_out
        hi = jnp.searchsorted(piece_out_cum, out_base + cap, side="left")
        hi = jnp.minimum(hi.astype(jnp.int32), n_pieces - 1)
        new_out = jnp.where(active, piece_out_cum[jnp.maximum(hi, 0)], out_base)
        new_raw = jnp.where(
            active, piece_raw_cum[jnp.maximum(hi, 0)], raw_cuts[jnp.maximum(b - 1, 0)]
        )
        prev_raw = jnp.where(b > 0, raw_cuts[jnp.maximum(b - 1, 0)], 0)
        out_cuts = out_cuts.at[b].set(jnp.where(active, new_out, out_base))
        raw_cuts = raw_cuts.at[b].set(jnp.where(active, new_raw, prev_raw))
        n_blocks = n_blocks + active.astype(jnp.int32)
        return new_out, out_cuts, raw_cuts, n_blocks

    init = (
        jnp.int32(0),
        jnp.zeros(max_blocks, jnp.int32),
        jnp.zeros(max_blocks, jnp.int32),
        jnp.int32(0),
    )
    _, out_cuts, raw_cuts, n_blocks = jax.lax.fori_loop(0, max_blocks, body, init)
    return out_cuts, raw_cuts, n_blocks
