"""The fused per-block encode pipeline: BWT -> MTF/RLE2 -> Huffman -> pack.

One jit compilation serves every block at a given capacity; blocks batch
along a leading vmap axis (the TPU-native replacement for the reference's
one-work-item-per-block kernel_close, reference kernel.cpp:3124-3159).
"""

from __future__ import annotations

import functools

import jax

from bz2tpu.ops.bwt import bwt_encode
from bz2tpu.ops.emit import pack_symbol_data
from bz2tpu.ops.huffman import huffman_assign, max_selectors
from bz2tpu.ops.mtf import mtf_rle2_encode


def encode_block(block, n, *, mtf_chunk: int = 2048):
    """Encode one padded block; returns everything the driver needs to emit
    the block bitstream (reference close_block, kernel.cpp:3099-3122)."""
    capacity = block.shape[-1]
    maxsel = max_selectors(capacity)
    last, orig_ptr = bwt_encode(block, n)
    mtf = mtf_rle2_encode(last, n, chunk=mtf_chunk)
    plan = huffman_assign(
        mtf["symbols"], mtf["n_sym"], mtf["freqs"], mtf["n_in_use"], maxsel=maxsel
    )
    words, total_bits = pack_symbol_data(
        mtf["symbols"], plan["selectors"], plan["lengths"], plan["codes"], maxsel=maxsel
    )
    return {
        "orig_ptr": orig_ptr,
        "used": mtf["used"],
        "n_sym": mtf["n_sym"],
        "n_in_use": mtf["n_in_use"],
        "n_groups": plan["n_groups"],
        "n_selectors": plan["n_selectors"],
        "selector_mtf": plan["selector_mtf"],
        "lengths": plan["lengths"],
        "words": words,
        "total_bits": total_bits,
    }


@functools.partial(jax.jit, static_argnames=("mtf_chunk",))
def encode_blocks(blocks, ns, *, mtf_chunk: int = 2048):
    """vmapped batch encode: blocks (B, capacity) uint8, ns (B,) int32."""
    return jax.vmap(functools.partial(encode_block, mtf_chunk=mtf_chunk))(blocks, ns)
