"""Round-5 probe: compact-width huff+pack A/B (BZ2TPU_COMPACT_PACK).

The staged pipeline now slices the MTF symbol batch to a quantized width
>= max(n_sym) before the Huffman/pack stage (ops/pipeline.py round-5
note). This probe measures the e2e effect on the 14.4 MB mixed corpus at
level 9 (the bench headline configuration) and at level 1, round-trip
verified every run; each arm runs in THIS process (the flag is read at
import, so the off-arm runs in a subprocess).

Writes JSONL to tools/probe19_out.jsonl.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe19_out.jsonl")


def rec(name, **kw):
    row = {"probe": name, **kw}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run_arm(level: int, nbytes: int, runs: int = 3) -> None:
    from bench import make_mixed_corpus
    from bz2tpu.runtime.compressor import compress
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    arm = os.environ.get("BZ2TPU_COMPACT_PACK", "1")
    data = make_mixed_corpus(nbytes)
    compress(data, level=level)  # warm (compiles any fresh widths)
    walls = []
    for _ in range(runs):
        t0 = time.time()
        out = compress(data, level=level)
        walls.append(time.time() - t0)
        assert stdlib_bz2.decompress(out) == data
    mb = nbytes / 1e6
    rec(
        f"compact_pack_l{level}",
        arm=("compact" if arm == "1" else "full"),
        walls_s=[round(w, 3) for w in walls],
        mb_s=[round(mb / w, 3) for w in walls],
        out_bytes=len(out),
    )


def main() -> int:
    if "BZ2TPU_COMPACT_PACK" in os.environ:
        level = int(sys.argv[1])
        nbytes = int(sys.argv[2])
        run_arm(level, nbytes)
        return 0
    for level, nbytes in ((9, 14_400_000), (1, 12_000_000)):
        for arm in ("1", "0"):
            env = dict(os.environ, BZ2TPU_COMPACT_PACK=arm)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(level), str(nbytes)],
                env=env, cwd=_REPO, timeout=3600,
            )
            if r.returncode != 0:
                rec("arm_failed", level=level, arm=arm, rc=r.returncode)
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
