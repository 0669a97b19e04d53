"""Round-3 emit segment-sum packer A/B + combined e2e (REAL axon device).

Times the huff_pack_stage with the segment-sum pack_elements (working
tree) against the round-3 scatter baseline (probe3 stage_walls huffpack
= 0.424-0.427 s), and the full e2e with every round-3 change (sortrank
BWT, chunk-4096 sort-collapse MTF, sort histograms, segment-sum pack).

Writes JSONL to tools/probe9_out.jsonl.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe9_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops.pipeline import bwt_stage, huff_pack_stage, mtf_stage
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
    crcs = np.zeros(8, np.uint32)
    for i, blk in enumerate(blocks):
        buf[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
        crcs[i] = blk.crc
    bufd = jax.device_put(jnp.asarray(buf))
    nsd = jax.device_put(jnp.asarray(ns))
    crcd = jax.device_put(jnp.asarray(crcs))

    last, optr = bwt_stage(bufd, nsd)
    np.asarray(optr)
    mtf = mtf_stage(last, nsd)
    np.asarray(mtf["n_sym"])
    outp = huff_pack_stage(
        mtf["symbols"], mtf["n_sym"], mtf["freqs"], mtf["n_in_use"], optr,
        mtf["used"], crcd,
    )
    np.asarray(outp["meta"])
    rec("stages_warm")
    for rep in range(3):
        t0 = time.time()
        last, optr = bwt_stage(bufd, nsd)
        np.asarray(optr)
        t_bwt = time.time() - t0
        t0 = time.time()
        mtf = mtf_stage(last, nsd)
        np.asarray(mtf["n_sym"])
        t_mtf = time.time() - t0
        t0 = time.time()
        outp = huff_pack_stage(
            mtf["symbols"], mtf["n_sym"], mtf["freqs"], mtf["n_in_use"], optr,
            mtf["used"], crcd,
        )
        np.asarray(outp["meta"])
        rec(f"stage_walls_{rep}", bwt=round(t_bwt, 4), mtf=round(t_mtf, 4),
            huffpack=round(time.time() - t0, 4))

    t0 = time.time()
    full = compress(data, level=9, parallel=8)
    rec("e2e_warm", wall=time.time() - t0, ok=stdlib_bz2.decompress(full) == data)
    for rep in range(3):
        t0 = time.time()
        full = compress(data, level=9, parallel=8)
        rec(f"e2e_steady_{rep}", wall=time.time() - t0,
            mb_s=round(len(data) / (time.time() - t0) / 1e6, 3))

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
