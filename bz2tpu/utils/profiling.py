"""Tracing / profiling hooks.

Parity: the reference's only profiling aids are an unused Clock and a
#define PTX kernel-binary dump (reference include/utilities.hpp:54-62,
include/opencl.hpp:203-205). Here: a context manager around
jax.profiler.trace producing a Perfetto/TensorBoard trace of the device
pipeline, plus block_until_ready fencing for honest stage timing.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def device_trace(trace_dir: str | None):
    """Capture a JAX profiler trace into trace_dir (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def fence(tree) -> None:
    """Block until every array in the pytree is computed (honest timing)."""
    import jax

    jax.block_until_ready(tree)
