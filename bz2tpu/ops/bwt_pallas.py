"""Pallas TPU kernels for the BWT doubling rounds.

The XLA path (bz2tpu/ops/bwt.py) spends each refinement round in
``lax.sort`` plus a ~8-op re-rank chain, every step a full HBM round
trip. These kernels are the VMEM-resident redesign for real TPU
hardware (the BASELINE north star named after the reference's substring
sort, reference kernel.cpp:61-1022):

  * ``bitonic_sort_pallas`` — a full bitonic sort network executed in
    ONE kernel: operand arrays are DMA'd from HBM into VMEM scratch
    once, all log2(N)*(log2(N)+1)/2 compare-exchange substages run on
    the VMEM residents (grid steps = bitonic phases, which Mosaic runs
    sequentially so the scratch persists), and results are DMA'd out
    once. Mosaic has no sort primitive and no vectorized dynamic
    scatter, so the XOR-partner exchange is built from cyclic rolls:
    with data laid out (rows, 128), partner index ``i ^ j`` is a lane
    roll for j < 128 and a row roll for j >= 128 (j is a power of two,
    so the XOR never crosses the lane/row split).
  * ``rerank_pallas`` — the fused post-sort re-rank: group heads
    (neighbor compare over the sorted key columns), head positions
    (an inclusive running max, lane-scan + row-scan + cross-tile SMEM
    carry), and the surviving-tie count, in one pass over the data
    instead of the XLA chain's ~8.
  * ``bwt_encode_pallas`` — a complete BWT built from the two kernels:
    3-char round 0, then PAIR-doubling rounds (rank, rank[i+k]) — pair
    rather than quad because a pair round's working set (3 arrays) fits
    VMEM at the 900k block size where quad's 5 would not.

Enabled with BZ2TPU_PALLAS_BWT=1 (ops/pipeline.bwt_stage maps blocks
through this path sequentially). Differential-tested in interpret mode
against the XLA path (tests/test_ops_bwt_pallas.py); the HBM-traffic
model lives in PERF.md ("round 4: Pallas BWT").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BIG = (1 << 30)  # plain ints: jnp constants become captured tracers


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _partner(x, j: int, rows: int):
    """x[i ^ j] for flattened (rows, 128) row-major data; j a power of 2."""
    if j < _LANES:
        lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        fwd = pltpu.roll(x, shift=_LANES - j, axis=1)  # x[r, l + j (mod)]
        bwd = pltpu.roll(x, shift=j, axis=1)  # x[r, l - j (mod)]
        return jnp.where((lane & j) == 0, fwd, bwd)
    m = j // _LANES
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    fwd = pltpu.roll(x, shift=rows - m, axis=0)
    bwd = pltpu.roll(x, shift=m, axis=0)
    return jnp.where((row & m) == 0, fwd, bwd)


def _bitonic_kernel(n_arr: int, n_phases: int, rows: int, *refs):
    ins = refs[:n_arr]
    outs = refs[n_arr : 2 * n_arr]
    scr = refs[2 * n_arr : 3 * n_arr]
    sem = refs[3 * n_arr]
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _load():
        for a in range(n_arr):
            cp = pltpu.make_async_copy(ins[a], scr[a], sem)
            cp.start()
            cp.wait()

    row = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    i = row * _LANES + lane
    k = jnp.int32(2) << p  # phase block size (2, 4, ..., N)
    ascending = (i & k) == 0

    n_total = rows * _LANES
    j = n_total // 2
    while j >= 1:  # static substage ladder; phase p runs j = k/2 .. 1
        @pl.when(j < k)
        def _substage(j=j):
            vals = [scr[a][:, :] for a in range(n_arr)]
            part = [_partner(v, j, rows) for v in vals]
            # Lexicographic (arrays in order; the last is all-distinct,
            # so the exchange below never sees a full tie).
            lt = vals[n_arr - 1] < part[n_arr - 1]
            for a in range(n_arr - 2, -1, -1):
                lt = (vals[a] < part[a]) | ((vals[a] == part[a]) & lt)
            is_lower = (i & j) == 0
            keep = lt == (ascending == is_lower)
            for a in range(n_arr):
                scr[a][:, :] = jnp.where(keep, vals[a], part[a])

        j //= 2

    @pl.when(p == n_phases - 1)
    def _store():
        for a in range(n_arr):
            cp = pltpu.make_async_copy(scr[a], outs[a], sem)
            cp.start()
            cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_pallas(operands: tuple, *, interpret: bool = False) -> tuple:
    """Sort int32 arrays lexicographically by ALL operands in order.

    The final operand must be all-distinct for n < len (it is the
    deterministic tie-break — pass an iota value column, exactly like
    the XLA path's index key). Returns the co-sorted tuple. Arrays are
    padded to a power of two >= 256 internally (pad keys sort last).
    """
    n = operands[0].shape[0]
    N = max(256, _next_pow2(n))
    rows = N // _LANES
    n_arr = len(operands)
    n_phases = N.bit_length() - 1  # log2(N)

    padded = []
    pad_iota = jnp.arange(N - n, dtype=jnp.int32)
    for a, x in enumerate(operands):
        fill = (_BIG + pad_iota) if a == n_arr - 1 else jnp.full(
            N - n, _BIG, jnp.int32
        )
        padded.append(
            jnp.concatenate([x.astype(jnp.int32), fill]).reshape(rows, _LANES)
        )

    shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_bitonic_kernel, n_arr, n_phases, rows),
        grid=(n_phases,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_shape=[shape] * n_arr,
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.int32)] * n_arr
        + [pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(*padded)
    return tuple(o.reshape(N)[:n] for o in outs)


def _shift_back_one(x):
    """x[i - 1] over the flattened (rows, 128) layout (i = 0 wraps: the
    caller overwrites element 0 from its carry)."""
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    in_row = pltpu.roll(x, shift=1, axis=1)  # x[r, l-1 (mod)]
    cross = pltpu.roll(in_row, shift=1, axis=0)  # x[r-1, 127] lands at l==0
    return jnp.where(lane == 0, cross, in_row)


def _rerank_kernel(n_keys: int, tile_rows: int, n_tiles: int, *refs):
    keys = refs[:n_keys]
    pos_ref = refs[n_keys]
    active_ref = refs[n_keys + 1]
    carry = refs[n_keys + 2]  # SMEM: [prev_k0..prev_k{n-1}, prev_head, max_pos, singles]
    c = pl.program_id(0)
    T = tile_rows * _LANES

    @pl.when(c == 0)
    def _init():
        for a in range(n_keys):
            carry[a] = -2  # differs from every key (keys are >= -1)
        carry[n_keys] = 0  # prev head flag
        carry[n_keys + 1] = -1  # running max head position
        carry[n_keys + 2] = 0  # singleton count

    row = lax.broadcasted_iota(jnp.int32, (tile_rows, _LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (tile_rows, _LANES), 1)
    first = (row == 0) & (lane == 0)
    last = (row == tile_rows - 1) & (lane == _LANES - 1)

    # Head flags live as int32 0/1 vectors: Mosaic cannot roll/broadcast
    # i1 vectors (it lowers them through an unsupported i8->i1 trunci),
    # so bools only appear ephemerally inside comparisons.
    ks = [keys[a][:, :] for a in range(n_keys)]
    head = jnp.zeros((tile_rows, _LANES), jnp.int32)
    head0 = jnp.int32(0)
    for a in range(n_keys):
        head = head | jnp.where(ks[a] != _shift_back_one(ks[a]), 1, 0)
        head0 = head0 | jnp.where(ks[a][0, 0] != carry[a], 1, 0)
    head = jnp.where(first, head0, head)

    # Inclusive running max of head positions: lane scan, then row scan,
    # then the cross-tile carry.
    i_global = c * T + row * _LANES + lane
    m = jnp.where(head == 1, i_global, -1)
    s = 1
    while s < _LANES:
        m = jnp.maximum(m, jnp.where(lane >= s, pltpu.roll(m, shift=s, axis=1), -1))
        s *= 2
    row_incl = jnp.max(m, axis=1, keepdims=True)  # (R, 1)
    rs = row_incl
    s = 1
    while s < tile_rows:
        rs = jnp.maximum(rs, jnp.where(row[:, :1] >= s, pltpu.roll(rs, shift=s, axis=0), -1))
        s *= 2
    row_excl = jnp.where(row[:, :1] > 0, pltpu.roll(rs, shift=1, axis=0), -1)
    pos = jnp.maximum(jnp.maximum(m, row_excl), carry[n_keys + 1])
    pos_ref[:, :] = pos

    # Singletons (groups of size 1): head[i] & head[i+1]. The tile sees
    # head[i+1] for all but its last element; that boundary pair is
    # counted by the NEXT tile via the prev-head carry, and the final
    # element's successor is an implicit group end.
    nxt_in = pltpu.roll(head, shift=_LANES - 1, axis=1)  # head[r, l+1 (mod)]
    nxt_cross = pltpu.roll(nxt_in, shift=tile_rows - 1, axis=0)
    nxt = jnp.where(lane == _LANES - 1, nxt_cross, nxt_in)
    singles_here = jnp.sum(jnp.where(((head & nxt) == 1) & ~last, 1, 0))
    boundary = (carry[n_keys] == 1) & (head[0, 0] == 1)
    tail = (c == n_tiles - 1) & (head[tile_rows - 1, _LANES - 1] == 1)
    carry[n_keys + 2] = (
        carry[n_keys + 2]
        + singles_here
        + jnp.where(boundary, 1, 0)
        + jnp.where(tail, 1, 0)
    )

    for a in range(n_keys):
        carry[a] = ks[a][tile_rows - 1, _LANES - 1]
    carry[n_keys] = head[tile_rows - 1, _LANES - 1]
    carry[n_keys + 1] = jnp.maximum(carry[n_keys + 1], pos[tile_rows - 1, _LANES - 1])

    @pl.when(c == n_tiles - 1)
    def _emit_active():
        active_ref[0, 0] = jnp.int32(n_tiles * T) - carry[n_keys + 2]


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def rerank_pallas(keys: tuple, *, tile: int = 2048, interpret: bool = False):
    """Fused post-sort re-rank over sorted key columns.

    keys: tuple of (n,) int32 arrays, the sorted key columns of one
    doubling round (values >= -1). Returns (pos, active): pos[i] = index
    of i's group head (the Larsson-Sadakane position rank, in sorted
    order) and active = number of positions in groups of size >= 2.
    Matches the XLA chain head/cummax/tied/sum in ops/bwt.py exactly
    (differential-tested); one data pass instead of ~8.
    """
    n = keys[0].shape[0]
    n_keys = len(keys)
    pad = (-n) % tile
    # Padding keys: strictly increasing values above every valid key, so
    # padding contributes only singleton groups — they cancel exactly in
    # the `active` count (total grows by `pad`, singles grow by `pad`),
    # which therefore matches the XLA path's sum-of-tied over `n`.
    total = n + pad
    tile_rows = tile // _LANES
    n_tiles = total // tile
    padded = tuple(
        jnp.concatenate(
            [k.astype(jnp.int32), _BIG + jnp.arange(pad, dtype=jnp.int32)]
        ).reshape(total // _LANES, _LANES)
        for k in keys
    )

    pos, active = pl.pallas_call(
        functools.partial(_rerank_kernel, n_keys, tile_rows, n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, _LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)
        ]
        * n_keys,
        out_specs=[
            pl.BlockSpec((tile_rows, _LANES), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((total // _LANES, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((n_keys + 3,), jnp.int32)],
        interpret=interpret,
    )(*padded)
    return pos.reshape(total)[:n], active[0, 0]


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def bwt_encode_pallas(
    block: jnp.ndarray,
    n: jnp.ndarray,
    *,
    capacity: int | None = None,
    interpret: bool = False,
):
    """BWT of the rotations of block[:n], Pallas-kernel doubling rounds.

    Same contract and bit-identical output as ops/bwt.bwt_encode. Rounds
    PAIR-double (sort by (rank, rank[i+k])): a pair round's bitonic
    working set is 3 arrays, which fits VMEM at the 900k block size
    where the XLA path's quad round (5 sort operands) would not.
    """
    from bz2tpu.ops.bwt import round0_keys

    if capacity is None:
        capacity = block.shape[-1]
    cap = capacity
    iota = jnp.arange(cap, dtype=jnp.int32)
    valid = iota < n
    data = block.astype(jnp.int32)

    # Round 0: the SAME key construction as ops/bwt.bwt_encode (shared
    # helper — the two paths are contractually bit-identical).
    key0, k0 = round0_keys(data, n, cap)
    key_sorted, order = bitonic_sort_pallas((key0, iota), interpret=interpret)
    pos, active = rerank_pallas((key_sorted,), interpret=interpret)
    (_, rank) = bitonic_sort_pallas((order, pos), interpret=interpret)

    def round_(state):
        rank, sa, active, k = state
        ext = jnp.concatenate([rank, jnp.zeros(cap, jnp.int32)])
        ext = lax.dynamic_update_slice(ext, rank, (n,))
        s1 = jnp.where(valid, lax.dynamic_slice(ext, (k,), (cap,)), -1)
        k_r, k_1, order = bitonic_sort_pallas((rank, s1, iota), interpret=interpret)
        pos, active = rerank_pallas((k_r, k_1), interpret=interpret)
        (_, rank) = bitonic_sort_pallas((order, pos), interpret=interpret)
        return rank, order, active, k * 2

    def cond(state):
        _, _, active, k = state
        return (active > 0) & (k < n)

    state = lax.while_loop(cond, round_, (rank, order, active, k0))
    _, sa, _, _ = state
    # Ties surviving k >= n (bit-identical rotations) carry the index
    # tie-break from the sort's value column, like the XLA path.
    orig_ptr = jnp.argmax(sa == 0).astype(jnp.int32)
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    last = jnp.where(valid, block[prev], 0).astype(jnp.uint8)
    return last, orig_ptr
