"""MTF + RLE2 encoding as vectorized scans (JAX).

The reference runs move-to-front as a strictly sequential 256-entry list
update per BWT byte inside each work-item (reference kernel.cpp:2514-2649).
That recurrence vectorizes via the recency identity:

    MTF rank of symbol s at position i
      = #{symbols u : last occurrence of u before i  >  last occurrence of
         s before i}

with never-seen symbols given virtual occurrence times -(dense(u)+1), which
reproduces the initial MTF list order [0, 1, 2, ...]. Last-occurrence times
for all 256 dense symbols are a running cummax over one-hot position times,
computed chunk-by-chunk under lax.scan: each chunk does a (T, 256)
vectorized cummax (VPU-friendly) and carries a 256-lane running maximum.

RLE2 (zero-run RUNA/RUNB coding, reference kernel.cpp:2612-2640) follows in
closed form: a zero-run of length z emits m = floor(log2(z+1)) digits, and
digit k is bit k of (z+1) (bijective base 2) — so runs are located with a
run-start mask, their lengths with a segment sum, and all digits scattered
in parallel. No sequential state remains anywhere in the stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_NEG = jnp.int32(-(1 << 30))
_MAX_RUN_DIGITS = 21  # floor(log2(900_001 + 1)) = 19; margin for any capacity


def _mtf_ranks(seq: jnp.ndarray, n_in_use: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """MTF rank per position for a dense symbol sequence.

    seq: (cap,) int32, dense symbols in [0, n_in_use), -1 for padding.
    Returns (cap,) int32 ranks (garbage at padding positions).
    """
    cap = seq.shape[0]
    pad = (-cap) % chunk
    seqp = jnp.pad(seq, (0, pad), constant_values=-1)
    n_chunks = seqp.shape[0] // chunk
    chunks = seqp.reshape(n_chunks, chunk)

    lanes = jnp.arange(256, dtype=jnp.int32)
    # Virtual initial occurrence times reproduce the list order 0..n_in_use-1
    # (dense symbol 0 "most recent"); unused lanes can never win a recency
    # comparison.
    carry0 = jnp.where(lanes < n_in_use, -(lanes + 1), _NEG)

    t_local = jnp.arange(chunk, dtype=jnp.int32)

    def body(carry, inp):
        seq_c, base = inp
        times = base + t_local
        onehot_t = jnp.where(seq_c[:, None] == lanes[None, :], times[:, None], _NEG)
        incl = lax.cummax(onehot_t, axis=0)
        # Exclusive: last occurrence strictly before each position.
        excl = jnp.concatenate([jnp.full((1, 256), _NEG, jnp.int32), incl[:-1]], axis=0)
        last = jnp.maximum(carry[None, :], excl)
        self_idx = jnp.clip(seq_c, 0, 255)
        last_self = jnp.take_along_axis(last, self_idx[:, None], axis=1)
        ranks = jnp.sum((last > last_self).astype(jnp.int32), axis=1)
        new_carry = jnp.maximum(carry, incl[-1])
        return new_carry, ranks

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    _, ranks = lax.scan(body, carry0, (chunks, bases))
    return ranks.reshape(-1)[:cap]


@functools.partial(jax.jit, static_argnames=("chunk",))
def mtf_rle2_encode(last: jnp.ndarray, n: jnp.ndarray, *, chunk: int = 2048):
    """MTF + RLE2 encode the BWT last column.

    Args:
      last: (cap,) uint8 BWT output, padding beyond ``n`` ignored.
      n: scalar int32 valid length.

    Returns dict with:
      symbols: (cap + 2,) int32 — MTF/RLE2 symbol stream (RUNA=0, RUNB=1,
        value j -> j+1, EOB=n_in_use+1), -1 padding; slot cap+1 is a
        scatter trash slot and always -1... n_sym entries are valid.
      n_sym: scalar int32 — number of symbols incl. EOB.
      used: (256,) bool — byte-presence map.
      n_in_use: scalar int32.
      freqs: (258,) int32 — symbol histogram over the valid stream.
    """
    cap = last.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    valid = iota < n
    lasti = last.astype(jnp.int32)

    used_counts = jnp.zeros(256, jnp.int32).at[lasti].add(valid.astype(jnp.int32))
    used = used_counts > 0
    n_in_use = jnp.sum(used.astype(jnp.int32))
    dense = jnp.cumsum(used.astype(jnp.int32)) - 1
    seq = jnp.where(valid, dense[lasti], -1)

    ranks = _mtf_ranks(seq, n_in_use, chunk)

    is_z = valid & (ranks == 0)
    prev_z = jnp.concatenate([jnp.zeros((1,), jnp.bool_), is_z[:-1]])
    run_start = is_z & ~prev_z
    run_id = jnp.cumsum(run_start.astype(jnp.int32)) - 1  # >=0 at zero positions
    run_len = jnp.zeros(cap, jnp.int32).at[jnp.clip(run_id, 0, cap - 1)].add(
        is_z.astype(jnp.int32)
    )
    # Length of the run starting at each run-start position.
    z_here = run_len[jnp.clip(run_id, 0, cap - 1)]
    zp1 = jnp.where(run_start, z_here + 1, 2)
    m = jnp.floor(jnp.log2(zp1.astype(jnp.float32))).astype(jnp.int32)  # digits

    emit = jnp.where(run_start, m, jnp.where(valid & (ranks > 0), 1, 0))
    offsets = jnp.cumsum(emit) - emit
    total = offsets[-1] + emit[-1]
    n_sym = total + 1  # + EOB
    eob = n_in_use + 1

    out = jnp.full(cap + 2, -1, jnp.int32)
    trash = cap + 1
    # Non-zero MTF ranks: symbol rank+1.
    nz = valid & (ranks > 0) & ~run_start
    out = out.at[jnp.where(nz, offsets, trash)].set(jnp.where(nz, ranks + 1, -1))
    # Zero-run digits: digit k of a run is bit k of (z+1), RUNA=0 / RUNB=1.
    for k in range(_MAX_RUN_DIGITS):
        sel = run_start & (k < m)
        digit = (zp1 >> k) & 1
        out = out.at[jnp.where(sel, offsets + k, trash)].set(jnp.where(sel, digit, -1))
    out = out.at[total].set(eob)
    out = out.at[trash].set(-1)

    sym_valid = out >= 0
    freqs = jnp.zeros(258, jnp.int32).at[jnp.clip(out, 0, 257)].add(
        sym_valid.astype(jnp.int32)
    )
    return {
        "symbols": out,
        "n_sym": n_sym,
        "used": used,
        "n_in_use": n_in_use,
        "freqs": freqs,
    }
