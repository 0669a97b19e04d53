"""Round-3 MTF collapse-by-sort A/B (REAL axon device).

Times jit(vmap(mtf_rle2_encode)) at chunk=4096 with the sort-based
collapse (working tree) on the exact probe6 corpus/harness; compare
against probe6's scatter-collapse rows (time_c4096_* = 0.947-0.950 s).
Output is validated against the committed scatter path implicitly by
the CPU test suite; here we additionally round-trip via the oracle-free
full compress to keep the e2e contract.

Writes JSONL to tools/probe7_out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe7_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import bz2 as stdlib_bz2

    import jax
    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops.bwt import bwt_encode_batch
    from bz2tpu.ops.mtf import mtf_rle2_encode
    from bz2tpu.runtime.compressor import compress, split_blocks

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    cap = 9 * C.BLOCK_SIZE_BASE
    data = make_mixed_corpus(8 * cap)
    blocks = split_blocks(np.frombuffer(data, np.uint8), 9)[:8]
    buf = np.zeros((8, cap), np.uint8)
    ns = np.ones(8, np.int32)
    for i, blk in enumerate(blocks):
        buf[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
    bufd = jax.device_put(jnp.asarray(buf))
    nsd = jax.device_put(jnp.asarray(ns))
    last, _ = bwt_encode_batch(bufd, nsd)
    np.asarray(last[:, :8])
    rec("bwt_ready")

    fn = jax.jit(jax.vmap(lambda l, n: mtf_rle2_encode(l, n, chunk=4096)))
    t0 = time.time()
    out = fn(last, nsd)
    np.asarray(out["n_sym"])
    rec("warm_sortcollapse", wall=time.time() - t0)
    for rep in range(3):
        t0 = time.time()
        out = fn(last, nsd)
        np.asarray(out["n_sym"])
        rec(f"time_sortcollapse_{rep}", wall=time.time() - t0)

    # e2e confirmation (compiles the staged pipeline with the new MTF).
    t0 = time.time()
    full = compress(data, level=9, parallel=8)
    rec("e2e_warm", wall=time.time() - t0, ok=stdlib_bz2.decompress(full) == data)
    for rep in range(2):
        t0 = time.time()
        full = compress(data, level=9, parallel=8)
        rec(f"e2e_steady_{rep}", wall=time.time() - t0,
            mb_s=round(len(data) / (time.time() - t0) / 1e6, 3))

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
