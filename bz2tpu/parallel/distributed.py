"""Multi-host initialization.

The reference is strictly single-process/single-device (one OpenCL queue,
include/opencl.hpp). Multi-host bz2tpu runs are plain jax.distributed SPMD:
every host runs the same driver, the global ("blocks",) mesh spans all
chips, each host feeds its local shard of the block batch, and host 0
stitches (compression needs no cross-block communication, so DCN carries
only the gathered compressed bits; per-shard CRCs fold associatively —
format.crc32.stream_crc — so integrity can be checked before the gather).
"""

from __future__ import annotations


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op for single-process runs).

    With no arguments, relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS etc.), matching jax.distributed.initialize.
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
