"""Collective stream assembly: the multi-host stitch as device collectives.

The reference stitches per-block bitstreams serially on the host, carrying
a sub-byte remainder between blocks (reference
include/OutputStream.hpp:225-239, include/BitOutputStream.hpp:47-99), and
folds the stream CRC block-by-block (include/OutputStream.hpp:202). At pod
scale that host loop would serialize every byte through process 0. Here the
ENTIRE stream — header, every block, end marker, stream CRC — assembles on
the mesh (SURVEY.md section 5, distributed row):

  1. each shard packs its local blocks into one bit-contiguous segment
     (ops/emit.concat_block_words — prefix-sum + two scatter-adds);
  2. shard bit offsets come from an all_gather of local bit totals and an
     exclusive prefix sum (every shard computes its own offset);
  3. the stream CRC folds associatively: a run of k blocks transforms the
     running CRC as s -> rotl_k(s) XOR F, where F is the run's own fold
     from 0 — so per-shard (fold, count) pairs combine in shard order
     (format/crc32.py stream_crc docstring has the identity);
  4. each shard shifts its packed segment to its global bit offset and
     scatters it into a stream-sized buffer; a psum over the mesh merges
     the disjoint-bit contributions (boundary words overlap by < 32 bits,
     and add == or on disjoint bits);
  5. shard 0 contributes the stream header (BZh + level) and the trailer
     (end marker + the collectively-folded stream CRC).

The host receives finished stream words — zero per-byte host work. The
psum moves O(stream_bytes) per shard, which is fine for the test meshes
here; on a real pod the contiguous-span structure makes a
reduce_scatter/ppermute pipeline the natural refinement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bz2tpu.format import constants as C
from bz2tpu.ops.emit import concat_block_words

_HEADER_BITS = 32  # "BZh" + level digit
_TRAILER_BITS = 48 + 32  # end marker + stream CRC


def _rotl(s: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Rotate-left a uint32 by k (any k >= 0)."""
    k = (k % 32).astype(jnp.uint32)
    s = s.astype(jnp.uint32)
    back = (jnp.uint32(32) - k) % jnp.uint32(32)  # keep shifts < 32 (defined)
    return jnp.where(k == 0, s, (s << k) | (s >> back))


def _shift_segment(words: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Shift a packed word segment right by `shift` bits (0..31), one word
    longer on output (the spill word)."""
    w = words.shape[0]
    sh = shift.astype(jnp.uint32)
    hi = words >> sh
    lo = jnp.where(sh > 0, words << (jnp.uint32(32) - sh), jnp.uint32(0))
    out = jnp.zeros(w + 1, jnp.uint32)
    out = out.at[:w].add(hi)
    out = out.at[1:].add(lo)
    return out


def stitch_stream_shard(words, bits, crcs, n_blocks_local, level, axis="blocks"):
    """shard_map body: local (b, W) packed blocks -> replicated stream words.

    Args (all per-shard locals):
      words: (b, W) uint32 complete per-block bitstreams (zero past bits).
      bits: (b,) int32 valid bit counts (0 for padding rows).
      crcs: (b,) uint32 per-block CRCs (ignored for padding rows).
      n_blocks_local: scalar int32 live block count on this shard.
      level: scalar int32 block-size level (stream header digit).

    Returns (stream_words, total_bits): identical (replicated) on every
    shard; total_bits covers header + blocks + trailer.
    """
    b, w = words.shape
    # 1. local pack (zero host work; bits==0 rows vanish).
    cat, local_bits = concat_block_words(words, bits)

    # 2. global bit offsets.
    totals = lax.all_gather(local_bits, axis)  # (S,)
    s_idx = lax.axis_index(axis)
    excl = jnp.cumsum(totals) - totals
    my_off = _HEADER_BITS + excl[s_idx]
    stream_bits_total = _HEADER_BITS + jnp.sum(totals) + _TRAILER_BITS

    # 3. stream CRC: per-shard (fold-from-zero, count), combined in order.
    b_iota = jnp.arange(b, dtype=jnp.int32)
    live = b_iota < n_blocks_local

    def fold_step(i, s):
        c = jnp.where(live[i], crcs[i], 0).astype(jnp.uint32)
        nxt = _rotl(s, jnp.int32(1)) ^ c
        return jnp.where(live[i], nxt, s)

    local_fold = lax.fori_loop(0, b, fold_step, jnp.uint32(0))
    local_cnt = jnp.sum(live.astype(jnp.int32))
    folds = lax.all_gather(local_fold, axis)  # (S,)
    cnts = lax.all_gather(local_cnt, axis)
    n_shards = folds.shape[0]

    def comb(i, s):
        return _rotl(s, cnts[i]) ^ folds[i]

    stream_crc = lax.fori_loop(0, n_shards, comb, jnp.uint32(0))

    # 4. place the local segment at its global bit offset.
    w_out = b * w * n_shards + 6  # static bound: all blocks + header/trailer
    seg = _shift_segment(cat[: b * w], my_off & 31)
    contrib = jnp.zeros(w_out, jnp.uint32)
    contrib = lax.dynamic_update_slice(contrib, seg, ((my_off >> 5),))

    # 5. shard 0 adds header + trailer. Scatter-ADD (bit-disjoint with the
    # segments), never overwrite: with one shard the trailer word overlaps
    # this same contribution's final segment word.
    hdr_val = (
        (ord("B") << 24) | (ord("Z") << 16) | (ord("h") << 8)
    ) | (ord("0") + level)
    tail_off = _HEADER_BITS + jnp.sum(totals)
    # Trailer payload: 48-bit end marker then 32-bit stream CRC, packed
    # MSB-first into 3 words and shifted to its bit offset.
    em_hi = jnp.uint32(C.STREAM_END_MARKER >> 16)
    em_lo = jnp.uint32(C.STREAM_END_MARKER & 0xFFFF)
    t0 = em_hi
    t1 = (em_lo << 16) | (stream_crc >> 16)
    t2 = (stream_crc & jnp.uint32(0xFFFF)) << 16
    tail_words = jnp.stack([t0, t1, t2])
    tail_seg = _shift_segment(tail_words, tail_off & 31)
    is0 = s_idx == 0
    contrib = contrib.at[0].add(jnp.where(is0, jnp.uint32(hdr_val), 0))
    tail_idx = (tail_off >> 5) + jnp.arange(4, dtype=jnp.int32)
    contrib = contrib.at[tail_idx].add(
        jnp.where(is0, tail_seg, jnp.zeros_like(tail_seg)), mode="drop"
    )

    out = lax.psum(contrib, axis)
    return out, stream_bits_total


@functools.lru_cache(maxsize=None)
def _stitch_jit(mesh: Mesh):
    fn = functools.partial(stitch_stream_shard, axis="blocks")
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("blocks"), P("blocks"), P("blocks"), P("blocks"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def stitch_stream_sharded(words, bits, crcs, n_live, level: int, *, mesh: Mesh):
    """Assemble the complete .bz2 stream on the mesh.

    Args:
      words: (B, W) uint32 per-block streams, B divisible by mesh size,
        blocks in stream order (padding rows must have bits 0).
      bits: (B,) int32 bit counts (0 for padding rows).
      crcs: (B,) uint32 per-block CRCs.
      n_live: total live blocks (int; rows >= n_live are padding).
      level: 1..9.

    Returns (stream_bytes, total_bits): the finished stream as bytes.
    """
    B = words.shape[0]
    n_shards = mesh.devices.size
    assert B % n_shards == 0
    per = B // n_shards
    live_per = np.zeros(n_shards, np.int32)
    for s in range(n_shards):
        live_per[s] = max(0, min(per, int(n_live) - s * per))
    sharding = NamedSharding(mesh, P("blocks"))
    words = jax.device_put(words, NamedSharding(mesh, P("blocks", None)))
    bits = jax.device_put(bits, sharding)
    crcs = jax.device_put(crcs, sharding)
    live = jax.device_put(jnp.asarray(live_per), sharding)
    out, total_bits = _stitch_jit(mesh)(words, bits, crcs, live, jnp.int32(level))
    total_bits = int(total_bits)
    raw = np.asarray(jax.device_get(out)).astype(">u4").tobytes()
    # bzip2 streams are padded to a byte with zero bits (BitWriter padding).
    return raw[: (total_bits + 7) // 8], total_bits
