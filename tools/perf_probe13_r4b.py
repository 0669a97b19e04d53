"""Round-4b on-device probes, run after the blueprint sweep:

  1. steady-state device-intake at 14.4 MB (2 chunks: the async drain
     overlap is active, unlike probe12's single-chunk 7.2 MB measurement
     which pays the full final D2H with nothing to overlap it)
  2. per-stage walls of the shipped pipeline at (8, 900k) — dispatch
     artifacts poison absolutes (PERF.md round 2), so each stage is
     block_until_ready'd and the e2e wall is printed next to the sum
  3. Pallas BWT A/B (BZ2TPU_PALLAS_BWT=1) in a subprocess: does Mosaic
     compile at real shapes on this terminal, and what does the bitonic
     VMEM path cost vs the XLA quad path?

Appends JSONL to tools/probe13_out.jsonl. Run under `timeout`.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe13_out.jsonl")


def log(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, file=sys.stderr, flush=True)


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    log(probe="health", devices=str(jax.devices()))

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress, compress_device_intake

    # --- 1. steady-state device-intake, 14.4 MB (2 chunk launches) ------
    data = make_mixed_corpus(2 * 8 * 9 * 100_000)
    t0 = time.time()
    out = compress_device_intake(data, level=9, parallel=8)
    log(probe="intake14_warm", wall=round(time.time() - t0, 1))
    assert stdlib_bz2.decompress(out) == data
    for i in range(3):
        t0 = time.time()
        compress_device_intake(data, level=9, parallel=8)
        dt = time.time() - t0
        log(probe=f"intake14_{i}", wall=round(dt, 2),
            mb_s=round(len(data) / dt / 1e6, 3))
    for i in range(2):  # default path on the same data, same moment
        t0 = time.time()
        compress(data, level=9, parallel=8)
        dt = time.time() - t0
        log(probe=f"host14_{i}", wall=round(dt, 2),
            mb_s=round(len(data) / dt / 1e6, 3))

    # --- 2. stage walls at (8, 900k) ------------------------------------
    from bz2tpu.oracle.encoder import rle1_split
    from bz2tpu.ops.pipeline import bwt_stage, huff_pack_stage, mtf_stage

    blocks_l = rle1_split(np.frombuffer(data, np.uint8), 9)[:8]
    cap = C.block_capacity(9)
    batch = np.zeros((8, cap), np.uint8)
    ns = np.zeros(8, np.int32)
    crcs = np.zeros(8, np.uint32)
    for i, blk in enumerate(blocks_l):
        batch[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
        crcs[i] = blk.crc
    bj = jnp.asarray(batch)
    nj = jnp.asarray(ns)
    cj = jnp.asarray(crcs)

    def tw(fn, *a, **k):
        r = fn(*a, **k)
        jax.block_until_ready(r)
        t0 = time.time()
        r = fn(*a, **k)
        jax.block_until_ready(r)
        return time.time() - t0, r

    t_bwt, (last, optr) = tw(bwt_stage, bj, nj)
    t_mtf, mtf = tw(mtf_stage, last, nj)
    t_hp, _ = tw(
        huff_pack_stage, mtf["symbols"], mtf["n_sym"], mtf["freqs"],
        mtf["n_in_use"], optr, mtf["used"], cj,
    )
    log(probe="stages", bwt=round(t_bwt, 3), mtf=round(t_mtf, 3),
        huff_pack=round(t_hp, 3), sum=round(t_bwt + t_mtf + t_hp, 3))

    # --- 3. Pallas BWT A/B in a subprocess ------------------------------
    code = (
        "import time,sys,numpy as np\n"
        "sys.path.insert(0,'/root/repo')\n"
        "import jax,jax.numpy as jnp\n"
        "from bench import make_mixed_corpus\n"
        "from bz2tpu.format import constants as C\n"
        "from bz2tpu.oracle.encoder import rle1_split\n"
        "from bz2tpu.ops.pipeline import bwt_stage\n"
        "data=make_mixed_corpus(2*8*9*100_000)\n"
        "blocks=rle1_split(np.frombuffer(data,np.uint8),9)[:8]\n"
        "cap=C.block_capacity(9)\n"
        "b=np.zeros((8,cap),np.uint8); ns=np.zeros(8,np.int32)\n"
        "for i,bl in enumerate(blocks):\n"
        "    b[i,:bl.data.size]=bl.data; ns[i]=bl.data.size\n"
        "bj,nj=jnp.asarray(b),jnp.asarray(ns)\n"
        "t0=time.time(); r=bwt_stage(bj,nj); jax.block_until_ready(r)\n"
        "warm=time.time()-t0\n"
        "t0=time.time(); r=bwt_stage(bj,nj); jax.block_until_ready(r)\n"
        "print('PALLAS_BWT_RESULT', warm, time.time()-t0)\n"
    )
    env = dict(os.environ, BZ2TPU_PALLAS_BWT="1")
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=2400, cwd="/root/repo",
        )
        line = [x for x in p.stdout.splitlines() if "PALLAS_BWT_RESULT" in x]
        if line:
            _, warm, steady = line[0].split()
            log(probe="pallas_bwt", warm=round(float(warm), 1),
                steady=round(float(steady), 3), xla_steady=round(t_bwt, 3))
        else:
            log(probe="pallas_bwt", error=(p.stderr or p.stdout)[-400:])
    except subprocess.TimeoutExpired:
        log(probe="pallas_bwt", error="timeout 2400s (Mosaic compile)")

    log(probe="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
