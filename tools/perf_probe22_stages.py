"""Round-5 probe: current-default stage decomposition at -9.

Times each stage of the shipped compact pipeline (bwt_stage ->
mtf_plan_stage -> emit_huff_pack_stage@width -> concat_block_words ->
sliced D2H fetch) per 8-block batch on the 14.4 MB mixed bench corpus,
plus host intake and the e2e wall, so the stage walls can be checked
against e2e (they should roughly sum — PERF.md round-3 attribution).

Writes JSONL to tools/probe22_out.jsonl.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe22_out.jsonl")


def rec(name, **kw):
    row = {"probe": name, **kw}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main() -> int:
    import numpy as np

    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops import pipeline as P
    from bz2tpu.ops.emit import concat_block_words
    from bz2tpu.runtime.compressor import _fetch_cat_words, compress, split_blocks

    level = 9
    data = make_mixed_corpus(16 * C.BLOCK_SIZE_BASE * 9 // 10 * 10)
    cap = C.BLOCK_SIZE_BASE * level

    t0 = time.time()
    blocks = split_blocks(data, level)
    intake_wall = time.time() - t0
    rec("host_intake", wall_s=round(intake_wall, 3), n_blocks=len(blocks))

    # Batches exactly as the driver forms them.
    batches = []
    for base in range(0, len(blocks), 8):
        chunk = blocks[base : base + 8]
        buf = np.zeros((8, cap), np.uint8)
        ns = np.ones(8, np.int32)
        crcs = np.zeros(8, np.uint32)
        for i, b in enumerate(chunk):
            buf[i, : b.data.size] = b.data
            ns[i] = b.data.size
            crcs[i] = b.crc
        batches.append((jnp.asarray(buf), jnp.asarray(ns), jnp.asarray(crcs)))

    # Warm every program (incl. each batch's width rung).
    widths = []
    for bufs, nss, crcs in batches:
        last, optr = P.bwt_stage(bufs, nss)
        plan = P.mtf_plan_stage(last, nss)
        w = P.huff_width(cap, int(jnp.max(plan["n_sym"])))
        widths.append(w)
        out = P.emit_huff_pack_stage(plan, optr, crcs, width=w)
        cat, tot = concat_block_words(out["words"], out["meta"][:, 5].astype(jnp.int32))
        _fetch_cat_words(cat, int(tot))
    rec("widths", widths=widths, full=cap + 2)

    stage_names = ("bwt", "plan", "nsym_fetch", "emit_huff_pack", "concat", "d2h")
    for rep in range(3):
        sums = dict.fromkeys(stage_names, 0.0)
        for bi, (bufs, nss, crcs) in enumerate(batches):
            t = time.time()
            last, optr = P.bwt_stage(bufs, nss)
            jax.block_until_ready(last)
            sums["bwt"] += time.time() - t

            t = time.time()
            plan = P.mtf_plan_stage(last, nss)
            jax.block_until_ready(plan["n_sym"])
            sums["plan"] += time.time() - t

            t = time.time()
            mx = int(jnp.max(plan["n_sym"]))
            sums["nsym_fetch"] += time.time() - t
            w = P.huff_width(cap, mx)

            t = time.time()
            out = P.emit_huff_pack_stage(plan, optr, crcs, width=w)
            jax.block_until_ready(out["words"])
            sums["emit_huff_pack"] += time.time() - t

            t = time.time()
            cat, tot = concat_block_words(
                out["words"], out["meta"][:, 5].astype(jnp.int32)
            )
            tot = int(tot)
            sums["concat"] += time.time() - t

            t = time.time()
            _fetch_cat_words(cat, tot)
            sums["d2h"] += time.time() - t
        rec(
            "stages_l9",
            rep=rep,
            n_batches=len(batches),
            total_s={k: round(v, 3) for k, v in sums.items()},
            per_batch_s={k: round(v / len(batches), 3) for k, v in sums.items()},
            sum_s=round(sum(sums.values()), 3),
        )

    compress(data, level=level)  # warm the real driver path
    for rep in range(3):
        t0 = time.time()
        stream = compress(data, level=level)
        wall = time.time() - t0
        assert stdlib_bz2.decompress(stream) == data
        rec(
            "e2e_l9",
            rep=rep,
            wall_s=round(wall, 3),
            mb_s=round(len(data) / wall / 1e6, 3),
            out_bytes=len(stream),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
