"""Round-5 probe: decompose emit_huff_pack_stage (now the largest stage,
0.65 s/batch at -9 per probe22) into its three parts at the driver's real
widths: _rle2_out emission, huffman_assign, pack_block. Also counts the
Huffman refinement iterations per block (the while_loop is the only
data-dependent trip count in the stage).

Writes JSONL to tools/probe23_out.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe23_out.jsonl")


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
    from bz2tpu.ops.huffman import huffman_assign, max_selectors
    from bz2tpu.ops.mtf import _rle2_out
    from bz2tpu.ops.emit import pack_block
    from bz2tpu.runtime.compressor import split_blocks

    level = 9
    data = make_mixed_corpus(16 * C.BLOCK_SIZE_BASE * 9 // 10 * 10)
    cap = C.BLOCK_SIZE_BASE * level
    blocks = split_blocks(data, level)

    @functools.partial(jax.jit, static_argnames=("width",))
    def rle2_out_stage(plan, *, width):
        return jax.vmap(lambda p: _rle2_out(p, width))(plan)

    @functools.partial(jax.jit, static_argnames=("maxsel",))
    def huff_stage(sym, n_sym, freqs, n_in_use, *, maxsel):
        return jax.vmap(
            lambda s, ns, f, niu: huffman_assign(s, ns, f, niu, maxsel=maxsel)
        )(sym, n_sym, freqs, n_in_use)

    @functools.partial(jax.jit, static_argnames=("maxsel",))
    def pack_stage(sym, hp, crcs, optr, used, *, maxsel):
        return jax.vmap(
            lambda s, sel, lg, cd, crc, op, us, ng, nsel, smtf: pack_block(
                s, sel, lg, cd, crc, op, us, ng, nsel, smtf, maxsel=maxsel
            )
        )(
            sym, hp["selectors"], hp["lengths"], hp["codes"], crcs, optr,
            used, hp["n_groups"], hp["n_selectors"], hp["selector_mtf"],
        )

    # Build per-batch states exactly as the driver would.
    states = []
    for base in range(0, len(blocks), 8):
        chunk = blocks[base : base + 8]
        buf = np.zeros((8, cap), np.uint8)
        ns = np.ones(8, np.int32)
        crcs = np.zeros(8, np.uint32)
        for i, b in enumerate(chunk):
            buf[i, : b.data.size] = b.data
            ns[i] = b.data.size
            crcs[i] = b.crc
        bufs, nss = jnp.asarray(buf), jnp.asarray(ns)
        last, optr = P.bwt_stage(bufs, nss)
        plan = P.mtf_plan_stage(last, nss)
        w = P.huff_width(cap, int(jnp.max(plan["n_sym"])))
        states.append((plan, optr, jnp.asarray(crcs), w))

    # Warm all programs.
    for plan, optr, crcs, w in states:
        maxsel = max_selectors(w - 2)
        sym, freqs = rle2_out_stage(plan, width=w)
        hp = huff_stage(sym, plan["n_sym"], freqs, plan["n_in_use"], maxsel=maxsel)
        out = pack_stage(sym, hp, crcs, optr, plan["used"], maxsel=maxsel)
        jax.block_until_ready(out)

    names = ("rle2_out", "huffman", "pack")
    for rep in range(3):
        sums = dict.fromkeys(names, 0.0)
        for plan, optr, crcs, w in states:
            maxsel = max_selectors(w - 2)
            t = time.time()
            sym, freqs = rle2_out_stage(plan, width=w)
            jax.block_until_ready(sym)
            sums["rle2_out"] += time.time() - t

            t = time.time()
            hp = huff_stage(sym, plan["n_sym"], freqs, plan["n_in_use"], maxsel=maxsel)
            jax.block_until_ready(hp["codes"])
            sums["huffman"] += time.time() - t

            t = time.time()
            out = pack_stage(sym, hp, crcs, optr, plan["used"], maxsel=maxsel)
            jax.block_until_ready(out)
            sums["pack"] += time.time() - t
        rec(
            "ehp_parts_l9",
            rep=rep,
            n_batches=len(states),
            widths=[s[3] for s in states],
            total_s={k: round(v, 3) for k, v in sums.items()},
            per_batch_s={k: round(v / len(states), 3) for k, v in sums.items()},
            sum_s=round(sum(sums.values()), 3),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
