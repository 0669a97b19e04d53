"""Round-5 device-decode A/B: int16 relative jumps x bucket width (REAL device).

VERDICT r4 item 7 / TODO #4: the jump-map composition is the decode
wall (7 fused gather passes over (6, nbc) maps, ~84M gathered elements
per 900k block). Two knobs, A/B'd here on the round-4 workload
(4 x 900k blocks @ -9, mixed corpus):

  * BZ2TPU_DEC_I16=1  — compose int16 DELTAS instead of int32 absolute
    indices: halves gather BYTES per pass (+2 fused elementwise ops to
    re-derive absolute indices). Wins iff the backend prices gathers by
    bytes (real HBM), loses/flat if per-element (this box's model).
  * BZ2TPU_DEC_BUCKET=16 — 16 blocks per vmapped dispatch instead of 8:
    halves dispatch count, doubles working-set per program.

Flags are read at bz2tpu import time, so each config runs in its own
subprocess (persistent compile cache makes repeats cheap). Every config
verifies its output byte-exact against the input before timing counts.

Writes JSONL to tools/probe16_out.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe16_out.jsonl")
CORPUS = "/tmp/probe16_corpus.bin"
STREAM = "/tmp/probe16_stream.bz2"


def worker() -> int:
    """Decode STREAM 1 warm + 3 timed; print one JSON line on stdout."""
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    from bz2tpu.runtime.device_decode import _decompress_device_inner

    data = open(CORPUS, "rb").read()
    comp = open(STREAM, "rb").read()

    t0 = time.time()
    dd = _decompress_device_inner(comp, True)
    warm = time.time() - t0
    ok = dd == data
    walls = []
    for _ in range(3):
        t0 = time.time()
        dd = _decompress_device_inner(comp, True)
        walls.append(time.time() - t0)
        ok = ok and dd == data
    best = min(walls)
    print(json.dumps({
        "ok": ok, "warm_s": round(warm, 3),
        "walls": [round(w, 3) for w in walls],
        "mb_s": round(len(data) / best / 1e6, 4),
    }), flush=True)
    return 0 if ok else 1


def main() -> int:
    if "--worker" in sys.argv:
        return worker()

    import bz2 as stdlib_bz2

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    data = make_mixed_corpus(4 * 9 * C.BLOCK_SIZE_BASE)
    with open(CORPUS, "wb") as f:
        f.write(data)
    with open(STREAM, "wb") as f:
        f.write(stdlib_bz2.compress(data, 9))
    rec("start", t=time.time(), n_mb=round(len(data) / 1e6, 2))

    configs = [("i32_b8", "0", "8"), ("i16_b8", "1", "8"),
               ("i32_b16", "0", "16"), ("i16_b16", "1", "16")]
    for name, i16, bucket in configs:
        env = dict(os.environ, BZ2TPU_DEC_I16=i16, BZ2TPU_DEC_BUCKET=bucket)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(HERE),
        )
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        try:
            res = json.loads(line)
        except json.JSONDecodeError:
            res = {"ok": False, "raw": line[:200]}
        rec(name, rc=p.returncode, subprocess_wall=round(time.time() - t0, 1),
            stderr_tail=p.stderr[-300:] if p.returncode else "", **res)

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
