"""Round-5 probe: compact-EMIT A/B (BZ2TPU_COMPACT_EMIT), following up
probe19's compact-pack finding (gross win ~50-80 ms/batch at level 9 but
the per-batch max(n_sym) RPC costs ~30-60 ms, and level 1's 15 batches
regress 8%). Compact-emit moves the RLE2 output-domain emission into the
compact width too, roughly doubling the gross saving per (unchanged)
fetch. Arms run in subprocesses (flags are read at import):

  off  : BZ2TPU_COMPACT_PACK=0 (full-width everything)
  pack : compact pack only (probe19's arm, re-anchored for box mood)
  emit : compact pack + emit (the new default path)

Writes JSONL to tools/probe20_out.jsonl.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe20_out.jsonl")

ARMS = {
    "off": {"BZ2TPU_COMPACT_PACK": "0", "BZ2TPU_COMPACT_EMIT": "0"},
    "pack": {"BZ2TPU_COMPACT_PACK": "1", "BZ2TPU_COMPACT_EMIT": "0"},
    "emit": {"BZ2TPU_COMPACT_PACK": "1", "BZ2TPU_COMPACT_EMIT": "1"},
}


def rec(name, **kw):
    row = {"probe": name, **kw}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run_arm(arm: str, level: int, nbytes: int, runs: int = 3) -> None:
    from bench import make_mixed_corpus
    from bz2tpu.runtime.compressor import compress
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
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
        f"compact_emit_l{level}",
        arm=arm,
        walls_s=[round(w, 3) for w in walls],
        mb_s=[round(mb / w, 3) for w in walls],
        out_bytes=len(out),
    )


def main() -> int:
    if len(sys.argv) == 4:
        run_arm(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
        return 0
    for level, nbytes in ((9, 14_400_000), (1, 12_000_000)):
        for arm in ("emit", "pack", "off"):
            env = dict(os.environ, **ARMS[arm])
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), arm, str(level),
                 str(nbytes)],
                env=env, cwd=_REPO, timeout=3600,
            )
            if r.returncode != 0:
                rec("arm_failed", level=level, arm=arm, rc=r.returncode)
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
