"""Round-3 overhead decomposition probe (run on the REAL axon device).

Produces an end-to-end attribution of compress batch time from wall-clock
measurements only (per-stage device timers are unreliable on this
terminal — PERF.md round 2):

  * T(k batches) at fixed shapes -> per-batch cost slope + fixed cost;
  * host-only costs (RLE1 split, buffer fill, stitch) timed off-device;
  * link costs (H2D put of one batch, D2H fetch of compressed words);
  * dispatch RPC cost (tiny cached jit + scalar fetch);
  * compile counts per phase (jax_log_compiles capture) — answers the
    warmup attribution (VERDICT round 2 item 5).

Writes one JSON object per probe to tools/probe3_out.jsonl and a summary
to stdout.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe3_out.jsonl")


class CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if "ompil" in msg:  # "Compiling ..." / "Finished XLA compilation"
            self.events.append(msg[:120])


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax

    jax.config.update("jax_log_compiles", True)
    counter = CompileCounter()
    logging.getLogger("jax").addHandler(counter)
    logging.getLogger("jax").setLevel(logging.WARNING)

    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress, split_blocks

    rows = []

    def rec(name, **kw):
        n_compiles = len(counter.events)
        counter.events.clear()
        row = {"probe": name, "compiles": n_compiles, **kw}
        rows.append(row)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    cap = 9 * C.BLOCK_SIZE_BASE
    data1 = make_mixed_corpus(8 * cap)       # ~1 batch of 8 blocks
    data2 = make_mixed_corpus(16 * cap)      # ~2 batches
    data4 = make_mixed_corpus(32 * cap)      # ~4 batches

    # --- warm (includes any residual compiles / AOT loads) -------------
    t0 = time.time()
    out = compress(data1, level=9, parallel=8)
    rec("warm_1batch", wall=time.time() - t0, nbytes=len(data1), out=len(out))

    # --- host-only costs ----------------------------------------------
    t0 = time.time()
    blocks = split_blocks(np.frombuffer(data2, np.uint8), 9)
    rec("host_rle1_split_14MB", wall=time.time() - t0, n_blocks=len(blocks))
    t0 = time.time()
    buf = np.zeros((8, cap), np.uint8)
    for i, blk in enumerate(blocks[:8]):
        buf[i, : blk.data.size] = blk.data
    rec("host_buffer_fill_1batch", wall=time.time() - t0)

    # --- link costs ----------------------------------------------------
    for it in range(3):
        t0 = time.time()
        dev = jax.device_put(jnp.asarray(buf))
        np.asarray(dev[0, :8])  # force completion with a tiny fetch
        rec(f"h2d_7MB_{it}", wall=time.time() - t0)
    big = jax.device_put(jnp.asarray(np.zeros(1 << 19, np.uint32)))
    np.asarray(big[:4])
    for it in range(3):
        t0 = time.time()
        np.asarray(big)
        rec(f"d2h_2MB_{it}", wall=time.time() - t0)

    # --- dispatch RPC cost (cached tiny program + scalar fetch) --------
    small = jax.device_put(jnp.asarray(np.arange(256, dtype=np.int32)))

    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    int(tiny(small))  # compile once (cached next time)
    rec("tiny_compile")
    for it in range(5):
        t0 = time.time()
        int(tiny(small))
        rec(f"rpc_tiny_{it}", wall=time.time() - t0)

    # --- end-to-end at 1/2/4 batches, interleaved twice ----------------
    for rep in range(2):
        for name, d in (("e2e_1batch", data1), ("e2e_2batch", data2), ("e2e_4batch", data4)):
            t0 = time.time()
            out = compress(d, level=9, parallel=8)
            rec(f"{name}_{rep}", wall=time.time() - t0, nbytes=len(d), out=len(out))

    # --- staged stage walls (caveat: overstated on this terminal) ------
    from bz2tpu.ops.pipeline import bwt_stage, huff_pack_stage, mtf_stage

    ns = np.ones(8, np.int32)
    crcs = np.zeros(8, np.uint32)
    for i, blk in enumerate(blocks[:8]):
        ns[i] = blk.data.size
        crcs[i] = blk.crc
    bufd = jax.device_put(jnp.asarray(buf))
    nsd = jax.device_put(jnp.asarray(ns))
    crcd = jax.device_put(jnp.asarray(crcs))
    for it in range(2):
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
        t_hp = time.time() - t0
        rec(f"stage_walls_{it}", bwt=t_bwt, mtf=t_mtf, huffpack=t_hp)

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
