"""Device whole-block emission (ops/emit.pack_block) vs the host header
writer + symbol packer: the device words must be bit-identical."""

import numpy as np
import pytest

import jax.numpy as jnp

from bz2tpu.format.bitio import concat_bitstreams
from bz2tpu.ops.emit import pack_block, pack_symbol_data, words_to_bytes
from bz2tpu.ops.huffman import huffman_assign, max_selectors
from bz2tpu.ops.pipeline import bwt_stage, mtf_stage
from bz2tpu.runtime.compressor import _block_header_bits, split_blocks

from conftest import make_corpus


@pytest.mark.parametrize("kind", ["text", "runs", "zeros", "random", "alternating"])
def test_pack_block_matches_host_header_writer(kind):
    rng = np.random.default_rng(97)
    data = np.frombuffer(make_corpus(rng, kind, 80_000), np.uint8)
    blocks = split_blocks(data, 1)
    cap = 100_000
    b = len(blocks)
    buf = np.zeros((b, cap), np.uint8)
    ns = np.ones(b, np.int32)
    crcs = np.zeros(b, np.uint32)
    for i, blk in enumerate(blocks):
        buf[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
        crcs[i] = blk.crc
    last, optr = bwt_stage(jnp.asarray(buf), jnp.asarray(ns))
    mtf = mtf_stage(last, jnp.asarray(ns))
    maxsel = max_selectors(cap)
    for i in range(b):
        plan = huffman_assign(
            mtf["symbols"][i], mtf["n_sym"][i], mtf["freqs"][i],
            mtf["n_in_use"][i], maxsel=maxsel,
        )
        sw, sb = pack_symbol_data(
            mtf["symbols"][i], plan["selectors"], plan["lengths"], plan["codes"],
            maxsel=maxsel,
        )
        hdr_bytes, hdr_bits = _block_header_bits(
            int(crcs[i]), int(optr[i]), np.asarray(mtf["used"][i]).astype(bool),
            int(plan["n_groups"]), int(plan["n_selectors"]),
            np.asarray(plan["selector_mtf"]), np.asarray(plan["lengths"]),
            int(mtf["n_in_use"][i]),
        )
        want, want_bits = concat_bitstreams(
            [(hdr_bytes, hdr_bits), (np.asarray(sw).astype(">u4").view(np.uint8), int(sb))]
        )
        dw, db = pack_block(
            mtf["symbols"][i], plan["selectors"], plan["lengths"], plan["codes"],
            jnp.uint32(crcs[i]), optr[i], mtf["used"][i],
            plan["n_groups"], plan["n_selectors"], plan["selector_mtf"],
            maxsel=maxsel,
        )
        got = words_to_bytes(dw, int(db))
        assert int(db) == want_bits, (kind, i)
        assert got == want.tobytes()[: len(got)], (kind, i)
