"""Fused batch pack+concat (round 5): ops/emit.pack_blocks_concat scatters
every block's header + symbol elements ONCE into the final concatenated
buffer at global bit offsets. Contract: byte-identical streams to the
separate pack-then-concat stages, padding rows contribute 0 bits, and the
packed (code << 5) | length table gather is bit-identical to the two
separate gathers it replaced.
"""

import bz2 as stdlib_bz2

import numpy as np
import pytest


@pytest.mark.parametrize("kind", ["text", "mixed", "runs"])
def test_fused_pack_byte_identical(kind, rng, monkeypatch):
    from bz2tpu.ops import pipeline
    from bz2tpu.runtime.compressor import compress

    if kind == "text":
        data = bytes(rng.integers(97, 123, 40_000, dtype=np.uint8))
    elif kind == "mixed":
        data = (
            bytes(rng.integers(97, 123, 15_000, dtype=np.uint8))
            + b"a" * 10_000
            + bytes(rng.integers(0, 256, 15_000, dtype=np.uint8))
        )
    else:
        data = b"ab" * 3000 + b"c" * 9000 + b"\x00" * 4000

    monkeypatch.setattr(pipeline, "_FUSED_PACK", False)
    separate = compress(data, level=1, parallel=2)
    monkeypatch.setattr(pipeline, "_FUSED_PACK", True)
    fused = compress(data, level=1, parallel=2)
    assert fused == separate
    assert stdlib_bz2.decompress(fused) == data


def test_fused_pack_partial_batch(rng, monkeypatch):
    """A stream whose last batch is partial: the live mask must zero the
    padding rows' bits (they encode 1 junk byte each)."""
    from bz2tpu.ops import pipeline
    from bz2tpu.runtime.compressor import compress

    # 3 blocks at level 1 with parallel=4 -> one batch with 1 padding row.
    data = bytes(rng.integers(0, 256, 250_000, dtype=np.uint8))
    monkeypatch.setattr(pipeline, "_FUSED_PACK", True)
    out = compress(data, level=1, parallel=4)
    assert stdlib_bz2.decompress(out) == data
    monkeypatch.setattr(pipeline, "_FUSED_PACK", False)
    assert compress(data, level=1, parallel=4) == out


def test_pack_blocks_concat_vs_separate_direct(rng):
    """Direct op-level check: pack_blocks_concat == pack_block rows fed
    through concat_block_words, on a batch with a dead row."""
    import jax.numpy as jnp

    from bz2tpu.ops.emit import concat_block_words, pack_block, pack_blocks_concat
    from bz2tpu.ops.huffman import max_selectors
    from bz2tpu.ops.pipeline import bwt_stage, mtf_stage

    cap = 4096
    B = 4
    buf = np.zeros((B, cap), np.uint8)
    ns = np.ones(B, np.int32)
    for i, blob in enumerate(
        [
            rng.integers(97, 123, 3000, dtype=np.uint8),
            rng.integers(0, 256, 4000, dtype=np.uint8),
            np.frombuffer(b"ab" * 1500, np.uint8),
        ]
    ):
        buf[i, : blob.size] = blob
        ns[i] = blob.size
    live = np.array([True, True, True, False])
    crcs = rng.integers(0, 2**32, B, dtype=np.uint32)

    last, optr = bwt_stage(jnp.asarray(buf), jnp.asarray(ns))
    mtf = mtf_stage(last, jnp.asarray(ns))
    maxsel = max_selectors(cap)

    from bz2tpu.ops.huffman import huffman_assign
    import jax

    hp = jax.vmap(lambda s, n, f, u: huffman_assign(s, n, f, u, maxsel=maxsel))(
        mtf["symbols"], mtf["n_sym"], mtf["freqs"], mtf["n_in_use"]
    )

    rows = []
    bits = []
    for i in range(B):
        w, tb = pack_block(
            mtf["symbols"][i], hp["selectors"][i], hp["lengths"][i],
            hp["codes"][i], jnp.uint32(crcs[i]), optr[i], mtf["used"][i],
            hp["n_groups"][i], hp["n_selectors"][i], hp["selector_mtf"][i],
            maxsel=maxsel,
        )
        rows.append(w)
        bits.append(jnp.where(live[i], tb, 0))
    cat_sep, total_sep = concat_block_words(
        jnp.stack(rows), jnp.stack(bits).astype(jnp.int32)
    )

    cat_fused, total_fused, block_bits = pack_blocks_concat(
        mtf["symbols"], hp["selectors"], hp["lengths"], hp["codes"],
        jnp.asarray(crcs), optr, mtf["used"], hp["n_groups"],
        hp["n_selectors"], hp["selector_mtf"], jnp.asarray(live),
        maxsel=maxsel,
    )
    assert int(total_fused) == int(total_sep)
    nw = (int(total_sep) + 31) // 32
    np.testing.assert_array_equal(
        np.asarray(cat_fused)[:nw], np.asarray(cat_sep)[:nw]
    )
    assert int(block_bits[3]) == 0
