"""Round-5 probe: fused batch pack+concat (BZ2TPU_FUSED_PACK) A/B.

Arms run in subprocesses (the flag is read at import): e2e compress on
the 14.4 MB mixed bench corpus at -9 and the 12 MB corpus at level 1,
streams asserted identical across arms, round-trip verified every run.

Writes JSONL to tools/probe24_out.jsonl.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe24_out.jsonl")


def rec(name, **kw):
    row = {"probe": name, **kw}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run_arm(flag: str) -> None:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress

    for level, nblocks in ((9, 16), (1, 120)):
        data = make_mixed_corpus(nblocks * C.BLOCK_SIZE_BASE * level // 10 * 10)
        compress(data, level=level)  # warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            stream = compress(data, level=level)
            walls.append(round(time.time() - t0, 3))
            assert stdlib_bz2.decompress(stream) == data
        rec(
            f"fused_pack_{flag}_l{level}",
            walls_s=walls,
            mb_s=[round(len(data) / w / 1e6, 3) for w in walls],
            stream_sha=hashlib.sha256(stream).hexdigest()[:16],
            out_bytes=len(stream),
        )


def main() -> int:
    if len(sys.argv) == 2:
        run_arm(sys.argv[1])
        return 0
    for flag in ("1", "0"):
        env = dict(os.environ, BZ2TPU_FUSED_PACK=flag)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            env=env, cwd=_REPO, timeout=3600,
        )
        if r.returncode != 0:
            rec("arm_failed", flag=flag, rc=r.returncode)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
