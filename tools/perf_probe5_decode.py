"""Round-3 device-decode + post-BWT-fix e2e probe (REAL axon device).

Measures:
  * e2e compress steady state after the sort-based re-rank landed
    (expected ~3.0 s/batch, was ~3.5 s);
  * device decode of the FULL level-9 bench stream (16 blocks, bucketed
    8-wide) — the realistic workload, vs round 2's 2-block level-1
    slice;
  * the 2-block level-1 slice for continuity with BENCH_r02;
  * a pass-floor reference: one elementwise op over the decode's
    (8, n_bits_cap) working shape, to anchor the passes x floor
    attribution of the jump-map design.

Writes JSONL to tools/probe5_out.jsonl.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe5_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress
    from bz2tpu.runtime.device_decode import _decompress_device_inner

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    cap = 9 * C.BLOCK_SIZE_BASE
    data = make_mixed_corpus(16 * cap)

    # --- e2e compress with the new BWT (compile + 3 steady) -----------
    t0 = time.time()
    out = compress(data, level=9, parallel=8)
    rec("e2e_warm", wall=time.time() - t0, out=len(out))
    assert stdlib_bz2.decompress(out) == data
    rec("roundtrip_ok")
    for it in range(3):
        t0 = time.time()
        out = compress(data, level=9, parallel=8)
        rec(f"e2e_steady_{it}", wall=time.time() - t0,
            mb_s=round(len(data) / (time.time() - t0) / 1e6, 3))

    # --- pass-floor reference on decode shapes ------------------------
    x = jax.device_put(jnp.zeros((8, 1 << 21), jnp.int32))
    y = (x + 1).block_until_ready()
    for it in range(3):
        t0 = time.time()
        y = x + 1
        np.asarray(y[:, :8])
        rec(f"floor_8x2M_int32_{it}", wall=time.time() - t0)

    # --- device decode: 2-block level-1 slice (BENCH_r02 continuity) --
    slice_in = make_mixed_corpus(2 * C.BLOCK_SIZE_BASE)
    slice_comp = stdlib_bz2.compress(slice_in, 1)
    t0 = time.time()
    dd = _decompress_device_inner(slice_comp, True)
    rec("devdec_slice_warm", wall=time.time() - t0, ok=dd == slice_in)
    for it in range(3):
        t0 = time.time()
        dd = _decompress_device_inner(slice_comp, True)
        rec(f"devdec_slice_{it}", wall=time.time() - t0,
            mb_s=round(len(slice_in) / (time.time() - t0) / 1e6, 3))

    # --- device decode: full level-9 stream (16 blocks) ---------------
    full_comp = stdlib_bz2.compress(data, 9)
    t0 = time.time()
    dd = _decompress_device_inner(full_comp, True)
    rec("devdec_full_warm", wall=time.time() - t0, ok=dd == data)
    for it in range(2):
        t0 = time.time()
        dd = _decompress_device_inner(full_comp, True)
        rec(f"devdec_full_{it}", wall=time.time() - t0,
            mb_s=round(len(data) / (time.time() - t0) / 1e6, 3))

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
