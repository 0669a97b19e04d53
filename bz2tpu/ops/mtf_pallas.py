"""Pallas TPU kernel for the MTF rank scan.

The XLA path (bz2tpu/ops/mtf.py) runs ~5 separate ops per (chunk, 256)
tile — one-hot, cummax, shift, max-with-carry, compare+reduce — each
bouncing the tile through HBM. This kernel fuses the whole recurrence into
one VMEM-resident pass: the grid walks chunks sequentially (TPU grid steps
execute in order), the 256-lane last-occurrence carry lives in a VMEM
scratch that persists across grid steps, and each step does the one-hot /
cummax / compare / reduce pipeline without leaving VMEM.

This is the hot-loop design intended for real TPU hardware, where the XLA
path is HBM-bandwidth-bound; selected via mtf_rle2_encode(use_pallas=True)
or BZ2TPU_PALLAS=1.

Cross-check: differential-tested against the XLA path and the scalar
oracle (tests/test_ops_mtf.py) in interpreter mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -(1 << 30)  # plain int: jnp constants become captured tracers in Pallas kernels


def _mtf_rank_kernel(scalars_ref, seq_ref, out_ref, carry_ref):
    c = pl.program_id(0)
    T = seq_ref.shape[0]
    n_in_use = scalars_ref[0]
    m = scalars_ref[1]  # collapsed length: tiles past it skip all work

    @pl.when(c == 0)
    def _init():
        lanes = lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        carry_ref[:, :] = jnp.where(lanes[0:1, :] < n_in_use, -(lanes[0:1, :] + 1), _NEG)

    @pl.when(c * T < m)
    def _tile():
        seq = seq_ref[:]  # (T,) int32, -1 padding
        lanes = lax.broadcasted_iota(jnp.int32, (T, 256), 1)
        t_local = lax.broadcasted_iota(jnp.int32, (T, 256), 0)
        times = c * T + t_local
        onehot = jnp.where(seq[:, None] == lanes, times, _NEG)
        # Inclusive running max along rows via log2(T) shift-max steps
        # (lax.cummax has no Mosaic lowering; pltpu.roll wraps, so wrapped
        # rows are masked out).
        incl = onehot
        s = 1
        while s < T:
            shifted = pltpu.roll(incl, shift=s, axis=0)
            incl = jnp.maximum(incl, jnp.where(t_local >= s, shifted, _NEG))
            s *= 2
        # Exclusive form: last occurrence strictly before each row.
        excl = jnp.where(t_local > 0, pltpu.roll(incl, shift=1, axis=0), _NEG)
        carry = carry_ref[:, :]  # (1, 256)
        last = jnp.maximum(carry, excl)
        # last-occurrence of each row's own symbol: masked row-max (avoids a
        # lane-axis gather, which TPU handles poorly).
        self_mask = seq[:, None] == lanes
        last_self = jnp.max(jnp.where(self_mask, last, _NEG), axis=1, keepdims=True)
        out_ref[:] = jnp.sum((last > last_self).astype(jnp.int32), axis=1)
        carry_ref[:, :] = jnp.maximum(carry, incl[-1:, :])


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def mtf_ranks_pallas(
    seq: jnp.ndarray,
    n_in_use: jnp.ndarray,
    *,
    m: jnp.ndarray | None = None,
    chunk: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """MTF rank per position of a dense collapsed sequence.

    seq: (cap,) int32 dense symbols in [0, n_in_use), -1 padding.
    m: valid (collapsed) length; tiles beyond it are skipped. Defaults to
    the full capacity.
    Returns (cap,) int32 ranks (garbage at padding positions).
    """
    cap = seq.shape[0]
    pad = (-cap) % chunk
    seqp = jnp.pad(seq, (0, pad), constant_values=-1)
    n_chunks = seqp.shape[0] // chunk
    if m is None:
        m = jnp.int32(cap)
    scalars = jnp.stack(
        [jnp.asarray(n_in_use, jnp.int32), jnp.asarray(m, jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c, s_ref: (c,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk,), lambda c, s_ref: (c,), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 256), jnp.int32)],
    )
    ranks = pl.pallas_call(
        _mtf_rank_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((seqp.shape[0],), jnp.int32),
        interpret=interpret,
    )(scalars, seqp)
    return ranks[:cap]
