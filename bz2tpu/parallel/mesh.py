"""Device mesh + shard_map'ed block pipeline.

Design (SURVEY.md section 5, "Distributed communication backend"): blocks are
data-parallel over a 1-D ``("blocks",)`` mesh — ICI within a slice, DCN
across hosts when running under jax.distributed. Compression needs no
cross-block communication at all (each bzip2 block is self-contained), so
the only collective in the system is the implicit ordered gather of the
sharded outputs; CRC folding and bit stitching ride on the host today and
are associative (format.crc32.stream_crc docstring) so they can move into a
psum/scan collective when multi-host IO becomes the bottleneck.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bz2tpu.ops.pipeline import encode_block


def block_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the available devices with axis name 'blocks'."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("blocks",))


def pad_batch(n_blocks: int, n_shards: int, batch_per_shard: int | None = None) -> int:
    """Smallest total batch >= n_blocks divisible by the shard count."""
    if batch_per_shard is not None:
        return n_shards * batch_per_shard
    return ((n_blocks + n_shards - 1) // n_shards) * n_shards


@functools.lru_cache(maxsize=None)
def _sharded_encode(mesh: Mesh, mtf_chunk: int):
    shard = P("blocks")
    return jax.jit(
        jax.shard_map(
            jax.vmap(functools.partial(encode_block, mtf_chunk=mtf_chunk)),
            mesh=mesh,
            in_specs=(shard, shard),
            out_specs=shard,
            # The pipeline's scan/while carries start from replicated
            # constants; there is no cross-shard communication anywhere, so
            # the varying-manual-axes check has nothing to protect.
            check_vma=False,
        )
    )


def encode_blocks_sharded(blocks, ns, *, mesh: Mesh, mtf_chunk: int = 2048):
    """Batched block encode, blocks sharded over the mesh.

    blocks: (B, capacity) uint8 with B divisible by mesh size; ns: (B,).
    Returns the same pytree as ops.pipeline.encode_blocks, sharded on the
    leading axis; fetching it in order IS the ordered gather.
    """
    blocks = jax.device_put(blocks, NamedSharding(mesh, P("blocks", None)))
    ns = jax.device_put(ns, NamedSharding(mesh, P("blocks")))
    return _sharded_encode(mesh, mtf_chunk)(blocks, ns)
