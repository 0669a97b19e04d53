"""Round-5 probe: 6-char double-key round 0 (ops/bwt.round0_keys6) A/B.

The quad ladder starting at k0 = 6 instead of 3 removes one full
5-operand refinement round (worst case: 6*4^8 covers 900k one doubling
earlier; text exits one round earlier too) for the price of a third
round-0 sort operand. Arms run in subprocesses via BZ2TPU_BWT_K0 (the
flag is read at import): e2e compress on the 14.4 MB mixed bench corpus
at -9 plus the standalone bwt_stage wall, streams asserted identical
across arms, round-trip verified every run.

Writes JSONL to tools/probe21_out.jsonl.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import hashlib
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe21_out.jsonl")


def rec(name, **kw):
    row = {"probe": name, **kw}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run_arm(k0: str) -> None:
    import numpy as np

    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops.pipeline import bwt_stage
    from bz2tpu.runtime.compressor import compress, split_blocks

    data = make_mixed_corpus(16 * C.BLOCK_SIZE_BASE * 9 // 10 * 10)
    cap = C.BLOCK_SIZE_BASE * 9
    blocks = split_blocks(data, 9)[:8]
    buf = np.zeros((8, cap), np.uint8)
    ns = np.zeros(8, np.int32)
    for i, b in enumerate(blocks):
        buf[i, : b.data.size] = b.data
        ns[i] = b.data.size
    bufs, nss = jnp.asarray(buf), jnp.asarray(ns)

    jax.block_until_ready(bwt_stage(bufs, nss))  # compile + warm
    stage_walls = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(bwt_stage(bufs, nss))
        stage_walls.append(round(time.time() - t0, 3))

    compress(data, level=9)  # warm
    e2e_walls = []
    for _ in range(3):
        t0 = time.time()
        stream = compress(data, level=9)
        e2e_walls.append(round(time.time() - t0, 3))
        assert stdlib_bz2.decompress(stream) == data
    rec(
        f"bwt_k0_{k0}",
        stage_walls_s=stage_walls,
        e2e_walls_s=e2e_walls,
        e2e_mb_s=[round(len(data) / w / 1e6, 3) for w in e2e_walls],
        stream_sha=hashlib.sha256(stream).hexdigest()[:16],
        out_bytes=len(stream),
    )


def main() -> int:
    if len(sys.argv) == 2:
        run_arm(sys.argv[1])
        return 0
    for k0 in ("6", "3"):
        env = dict(os.environ, BZ2TPU_BWT_K0=k0)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), k0],
            env=env, cwd=_REPO, timeout=3600,
        )
        if r.returncode != 0:
            rec("arm_failed", k0=k0, rc=r.returncode)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
