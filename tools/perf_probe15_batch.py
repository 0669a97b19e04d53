"""Round-5 probe: post-MTF-rework e2e + level-1 batch-width sweep.

VERDICT r4 weak #2: level 1 ran at 0.19x stock (2.41 MB/s) while level 2
got 3.9 — at level 1 a batch is 8x100k = 0.8 MB, so the ~60 ms of
per-batch RPC dispatch + transfer latencies amortize 9x worse than at
level 9, yet DEFAULT_BATCH=8 was only ever swept at level 9. Sweep
B in {8, 32, 64} at level 1 (and {8, 16} at level 9 as a sanity
re-check) on the mixed corpus, round-trip verified. Also times the
round-5 e2e at level 9 (the headline number after the MTF emission
rework).

Writes JSONL to tools/probe15_out.jsonl.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe15_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    # --- e2e at level 9, 14.4 MB (the bench configuration) --------------
    n9 = 16 * C.BLOCK_SIZE_BASE * 9
    data9 = make_mixed_corpus(n9)
    t0 = time.time()
    out = compress(data9, level=9, parallel=8)
    rec("e2e_l9_warm", wall=round(time.time() - t0, 2),
        ok=stdlib_bz2.decompress(out) == data9)
    for rep in range(3):
        t0 = time.time()
        out = compress(data9, level=9, parallel=8)
        w = time.time() - t0
        rec(f"e2e_l9_{rep}", wall=round(w, 3), mb_s=round(n9 / w / 1e6, 3))
    if stdlib_bz2.decompress(out) != data9:
        rec("e2e_l9_roundtrip", ok=False)
        return 1

    # --- level-1 batch sweep --------------------------------------------
    n1 = 12_000_000
    data1 = make_mixed_corpus(n1)
    stock_t = time.time()
    stock = stdlib_bz2.compress(data1, 1)
    stock_dt = time.time() - stock_t
    rec("stock_l1", mb_s=round(n1 / stock_dt / 1e6, 3),
        ratio=round(len(stock) / n1, 5))
    for B in (8, 32, 64):
        try:
            t0 = time.time()
            out = compress(data1, level=1, parallel=B)
            rec(f"l1_B{B}_warm", wall=round(time.time() - t0, 2),
                ok=stdlib_bz2.decompress(out) == data1)
            for rep in range(2):
                t0 = time.time()
                out = compress(data1, level=1, parallel=B)
                w = time.time() - t0
                rec(f"l1_B{B}_{rep}", wall=round(w, 3),
                    mb_s=round(n1 / w / 1e6, 3))
            if stdlib_bz2.decompress(out) != data1:
                rec(f"l1_B{B}_roundtrip", ok=False)
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            rec(f"l1_B{B}_error", err=str(e)[:200])

    # --- level-2 with the winning width is checked in the blueprint sweep
    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
