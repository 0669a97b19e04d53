"""Collective (device-side) stream assembly vs the host-stitched stream.

The sharded stitch must produce BYTE-IDENTICAL output to the host
BitStitcher path for the same blocks — header, per-block bitstreams with
sub-byte carry, end marker, and the associatively-folded stream CRC — and
the result must decode with stdlib bz2 (libbz2).
"""

import bz2 as stdlib_bz2

import numpy as np
import pytest

from conftest import make_corpus


def _encode_all_blocks(data: bytes, level: int, B: int):
    import jax.numpy as jnp

    from bz2tpu.format import constants as C
    from bz2tpu.ops.pipeline import encode_blocks_staged
    from bz2tpu.runtime.compressor import split_blocks

    blocks = split_blocks(np.frombuffer(data, np.uint8), level)
    assert len(blocks) <= B
    cap = C.block_capacity(level) + 4  # +4: crossing-piece overshoot
    buf = np.zeros((B, cap), np.uint8)
    ns = np.ones(B, np.int32)
    crcs = np.zeros(B, np.uint32)
    for i, blk in enumerate(blocks):
        buf[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
        crcs[i] = blk.crc
    out = encode_blocks_staged(jnp.asarray(buf), jnp.asarray(ns), jnp.asarray(crcs))
    bits = np.asarray(out["meta"])[:, 5].astype(np.int32)
    bits[len(blocks) :] = 0  # padding rows contribute nothing
    return np.asarray(out["words"]), bits, crcs, len(blocks)


@pytest.mark.parametrize("kind", ["text", "runs", "random"])
def test_collective_stitch_matches_host_stream(kind, rng):
    import jax.numpy as jnp

    from bz2tpu.parallel.mesh import block_mesh
    from bz2tpu.parallel.stitch import stitch_stream_sharded
    from bz2tpu.runtime.compressor import compress

    level = 1
    data = make_corpus(rng, kind, 300_000)
    words, bits, crcs, n_live = _encode_all_blocks(data, level, 8)

    mesh = block_mesh(8)
    stream, total_bits = stitch_stream_sharded(
        jnp.asarray(words), jnp.asarray(bits), jnp.asarray(crcs), n_live,
        level, mesh=mesh,
    )

    want = compress(data, level=level, parallel=8)
    assert stream == want
    assert stdlib_bz2.decompress(stream) == data


def test_collective_stitch_two_shards(rng):
    import jax.numpy as jnp

    from bz2tpu.parallel.mesh import block_mesh
    from bz2tpu.parallel.stitch import stitch_stream_sharded
    from bz2tpu.runtime.compressor import compress

    level = 1
    data = make_corpus(rng, "text", 350_000)
    words, bits, crcs, n_live = _encode_all_blocks(data, level, 4)
    mesh = block_mesh(2)
    stream, _ = stitch_stream_sharded(
        jnp.asarray(words), jnp.asarray(bits), jnp.asarray(crcs), n_live,
        level, mesh=mesh,
    )
    assert stream == compress(data, level=level, parallel=4)
    assert stdlib_bz2.decompress(stream) == data
