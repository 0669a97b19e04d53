"""Device-side bitstream emission: variable-length codes -> packed words.

The reference writes every code bit-by-bit into a bool-per-bit buffer inside
the kernel (reference kernel.cpp:2458-2481, 3043-3062: writeBits loops over
single bits; 16 bool-bytes per input byte of device memory,
include/OutputStream.hpp:70). Here emission is a closed-form parallel pack:

  bit offset of code i = exclusive prefix sum of code lengths;
  each code, MSB-aligned into the 64-bit window anchored at its first
  32-bit word, contributes (hi, lo) word parts; all parts land with two
  scatter-adds (disjoint bit ranges make add == or, so order is free).

Output is 32x denser than the reference's device representation (packed
words vs bool-per-bit) and needs no serial repack on the host — the
driver-side stitcher concatenates already-packed streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bz2tpu.format import constants as C


def packed_words(capacity: int) -> int:
    """Static word count covering the worst-case symbol-data bitstream."""
    # <= capacity+1 symbols, each code <= 20 bits.
    return ((capacity + 1) * C.HUFFMAN_ENCODE_MAX_LENGTH + 20 + 31) // 32 + 2


@functools.partial(jax.jit, static_argnames=("maxsel",))
def pack_symbol_data(
    symbols: jnp.ndarray,
    selectors: jnp.ndarray,
    lengths: jnp.ndarray,
    codes: jnp.ndarray,
    *,
    maxsel: int,
):
    """Huffman-encode the symbol stream and pack it into uint32 words.

    Args:
      symbols: (S,) int32 MTF/RLE2 stream, -1 padding (S = capacity + 2).
      selectors: (maxsel,) int32 table id per 50-symbol group.
      lengths/codes: (6, 258) int32 code tables.

    Returns (words, total_bits): (W,) uint32 MSB-first words and the valid
    bit count. Bytes are the big-endian view of the words.
    """
    S = symbols.shape[0]
    W = packed_words(S - 2)
    gid = jnp.arange(S, dtype=jnp.int32) // C.HUFFMAN_GROUP_SIZE
    sel = selectors[jnp.clip(gid, 0, maxsel - 1)]
    valid = symbols >= 0
    sym = jnp.clip(symbols, 0, 257)
    lens = jnp.where(valid, lengths[sel, sym], 0)
    vals = jnp.where(valid, codes[sel, sym], 0).astype(jnp.uint32)

    ends = jnp.cumsum(lens)
    offsets = ends - lens
    total_bits = ends[-1]

    # 32-bit-only window math (x64 is disabled under JAX defaults): a code
    # of len <= 20 at bit position bitpos in its first word either fits
    # (shift left by 32-bitpos-len) or spills len+bitpos-32 <= 19 bits into
    # the next word.
    bitpos = offsets & 31
    spill = jnp.clip(lens + bitpos - 32, 0, 31)
    fit = jnp.clip(32 - bitpos - lens, 0, 31)
    spills = (lens + bitpos) > 32
    hi = jnp.where(spills, vals >> spill.astype(jnp.uint32), vals << fit.astype(jnp.uint32))
    lo = jnp.where(
        spills, vals << jnp.clip(32 - spill, 0, 31).astype(jnp.uint32), jnp.uint32(0)
    )
    w0 = offsets >> 5

    out = jnp.zeros(W, jnp.uint32)
    out = out.at[jnp.where(valid, w0, W)].add(hi, mode="drop")
    out = out.at[jnp.where(valid, w0 + 1, W)].add(lo, mode="drop")
    return out, total_bits


def words_to_bytes(words, total_bits: int) -> bytes:
    """Big-endian byte view of packed words, trimmed to ceil(bits/8)."""
    import numpy as np

    raw = np.asarray(words).astype(">u4").tobytes()
    return raw[: (int(total_bits) + 7) // 8]
