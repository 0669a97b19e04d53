"""JAX environment knobs.

The 900k-block pipeline is a large XLA graph; first compilation on the TPU
terminal is minutes. A persistent compilation cache makes that a one-time
cost per (shape, level) across processes — the analog of the reference
shipping a prebuilt kernel binary via #define PTX (reference
include/opencl.hpp:203-205), except the cache is automatic.
"""

from __future__ import annotations

import os

_DONE = False


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _DONE
    if _DONE:
        return
    import jax

    cache = path or os.environ.get(
        "BZ2TPU_CACHE_DIR", os.path.expanduser("~/.cache/bz2tpu_xla")
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # By default jax roots a GPU-only XLA autotune sub-cache inside the
    # cache dir, which embeds the cache PATH into every compile-options
    # hash — cache keys then differ across directories and machines,
    # breaking shippable AOT artifacts (utils/aot.py; measured: identical
    # programs keyed differently per cache dir). No GPU here: disable it
    # so keys are path-portable.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    _DONE = True
    # A shipped AOT artifact (utils/aot.py) installs its prebuilt
    # executables into the cache so every dispatch below is a hit.
    aot_dir = os.environ.get("BZ2TPU_AOT_DIR")
    if aot_dir and os.path.abspath(aot_dir) != os.path.abspath(cache):
        from bz2tpu.utils import aot

        aot.install(aot_dir, cache)


def prime(levels=(9,), batch: int | None = None, verbose: bool = True) -> None:
    """Pre-compile the standard pipeline shapes into the persistent cache.

    Cold CLI runs otherwise pay the full XLA compile (minutes per shape on
    remote TPU terminals — the round-1 cold start was ~16 minutes). The
    compiled programs depend only on (level, batch) shapes, so compressing
    a tiny input exercises exactly the executables real runs need; after
    one prime, cold processes hit the cache. The analog of the reference
    shipping a prebuilt kernel binary (reference include/opencl.hpp:203).
    """
    import time

    import numpy as np

    setup_compilation_cache()
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import DEFAULT_BATCH, compress

    b = batch or DEFAULT_BATCH
    for level in levels:
        t0 = time.time()
        # Every pow2 batch width the quantizer can pick (compressor.py:
        # small streams quantize to {1, 2, 4, ..., b}), plus the full
        # batch. Random bytes barely shrink under RLE1, so w*capacity -
        # margin raw bytes split into exactly w full blocks — the same
        # (w, capacity) programs real streams use. (The old tiny-input
        # prime only ever compiled batch=1, which is why primed runs
        # still paid the full batch compile.)
        w = 1
        widths = []
        while w < b:
            widths.append(w)
            w <<= 1
        widths.append(b)
        for w in widths:
            if w == 1:
                compress(b"prime" * 300, level=level, parallel=b)
                continue
            n = w * C.BLOCK_SIZE_BASE * level - 4096
            data = np.random.default_rng(0).integers(0, 256, n, dtype=np.uint8)
            compress(data, level=level, parallel=b)
        # Compact-width stage variants (ops/pipeline.huff_width): the
        # random prime corpus barely collapses under MTF, so the real
        # compress calls above only ever compile the FULL-width rung;
        # text-like corpora land on sub-full rungs. Compile each rung
        # directly at the full batch (the only batch width padded streams
        # dispatch) so a shipped artifact keeps its zero-compile promise.
        # Sub-full rungs at SMALLER pow2 batches are not primed (tiny
        # streams only), same trade as the escalation windows below.
        from bz2tpu.ops.pipeline import prime_width_programs

        prime_width_programs(b, C.BLOCK_SIZE_BASE * level)
        # The --backend device intake program at its BASE chunk window.
        # NOT primed: the 2x/4x/8x escalation windows that highly
        # compressible streams can reach (compressor.py window widening)
        # — each is one more multi-minute compile, paid once on first
        # escalation and cached after.
        from bz2tpu.runtime.compressor import compress_device_intake

        data = np.random.default_rng(0).integers(
            0, 256, C.BLOCK_SIZE_BASE * level, dtype=np.uint8
        )
        compress_device_intake(data, level=level, parallel=b)
        if verbose:
            print(f"primed level {level} (batch 1 + {b}): {time.time() - t0:.1f}s")
