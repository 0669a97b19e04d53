"""Round-5 probe: huffman_assign internals at the driver widths.

Times, per 8-block batch at -9 on the mixed corpus: group_frequencies
(the width-element scatter), seed_lengths, ONE refinement iteration's
pieces (cost matmul + argmin, rfreq matmul, code_lengths_tables), the
canonical/selector tail, and the actual refinement iteration count per
block (the while_loop pays the batch max).

Writes JSONL to tools/probe25_out.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe25_out.jsonl")


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
    from jax import lax

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops import huffman as H
    from bz2tpu.ops import pipeline as P
    from bz2tpu.ops.mtf import _rle2_out
    from bz2tpu.runtime.compressor import split_blocks

    level = 9
    data = make_mixed_corpus(16 * C.BLOCK_SIZE_BASE * 9 // 10 * 10)
    cap = C.BLOCK_SIZE_BASE * level
    blocks = split_blocks(data, level)

    @functools.partial(jax.jit, static_argnames=("width",))
    def syms_stage(plan, *, width):
        return jax.vmap(lambda p: _rle2_out(p, width, with_freqs=False)[0])(plan)

    @functools.partial(jax.jit, static_argnames=("maxsel",))
    def gfreq_stage(sym, *, maxsel):
        return jax.vmap(lambda s: H.group_frequencies(s, maxsel))(sym)

    @jax.jit
    def seed_stage(gfreq, n_sym, n_in_use):
        freqs = jnp.sum(gfreq, axis=1)
        alpha = n_in_use + 2
        ng = jax.vmap(H.table_count)(n_sym)
        return jax.vmap(H.seed_lengths)(freqs, ng, alpha)

    @jax.jit
    def iter_once(gfreq, lengths, n_sym, n_in_use):
        """One refinement iteration (cost matmul + argmin + rfreq matmul +
        code_lengths rebuild), batched like the real while body."""
        def one(gf, lg, ns, niu):
            gfreq_f = gf.astype(jnp.float32)
            ngroups = H.table_count(ns)
            nsel = (ns + C.HUFFMAN_GROUP_SIZE - 1) // C.HUFFMAN_GROUP_SIZE
            tmask = jnp.arange(6) < ngroups
            gvalid = jnp.arange(gf.shape[0], dtype=jnp.int32) < nsel
            cost = gfreq_f @ lg.astype(jnp.float32).T
            cost = jnp.where(tmask[None, :], cost, jnp.float32(jnp.inf))
            sel = jnp.argmin(cost, axis=1).astype(jnp.int32)
            onehot = ((sel[:, None] == jnp.arange(6)[None, :]) & gvalid[:, None]).astype(jnp.float32)
            rfreq = (onehot.T @ gfreq_f).astype(jnp.int32)
            return H.code_lengths_tables(rfreq, niu + 2), sel
        return jax.vmap(one)(gfreq, lengths, n_sym, n_in_use)

    @jax.jit
    def iters_count(gfreq, lengths0, n_sym, n_in_use):
        """Refinement iterations until the selector fixed point, per block."""
        def one(gf, lg, ns, niu):
            gfreq_f = gf.astype(jnp.float32)
            ngroups = H.table_count(ns)
            nsel = (ns + C.HUFFMAN_GROUP_SIZE - 1) // C.HUFFMAN_GROUP_SIZE
            tmask = jnp.arange(6) < ngroups
            gvalid = jnp.arange(gf.shape[0], dtype=jnp.int32) < nsel
            sel0 = jnp.zeros(gf.shape[0], jnp.int32)

            def body(state):
                i, lg, sel, _ = state
                cost = gfreq_f @ lg.astype(jnp.float32).T
                cost = jnp.where(tmask[None, :], cost, jnp.float32(jnp.inf))
                new_sel = jnp.argmin(cost, axis=1).astype(jnp.int32)
                done = (i > 0) & jnp.all(new_sel == sel)
                onehot = ((new_sel[:, None] == jnp.arange(6)[None, :]) & gvalid[:, None]).astype(jnp.float32)
                rfreq = (onehot.T @ gfreq_f).astype(jnp.int32)
                lg = jnp.where(done, lg, H.code_lengths_tables(rfreq, niu + 2))
                return i + 1, lg, new_sel, done

            def cond(state):
                i, _, _, done = state
                return (i < C.HUFFMAN_REFINE_ITERS) & ~done

            i_fin, _, _, _ = lax.while_loop(cond, body, (jnp.int32(0), lg, sel0, jnp.bool_(False)))
            return i_fin
        return jax.vmap(one)(gfreq, lengths0, n_sym, n_in_use)

    # Build batch states.
    states = []
    for base in range(0, len(blocks), 8):
        chunk = blocks[base : base + 8]
        buf = np.zeros((8, cap), np.uint8)
        ns = np.ones(8, np.int32)
        for i, b in enumerate(chunk):
            buf[i, : b.data.size] = b.data
            ns[i] = b.data.size
        bufs, nss = jnp.asarray(buf), jnp.asarray(ns)
        last, optr = P.bwt_stage(bufs, nss)
        plan = P.mtf_plan_stage(last, nss)
        w = P.huff_width(cap, int(jnp.max(plan["n_sym"])))
        states.append((plan, w))

    # Warm + gather iteration counts.
    warm = []
    for plan, w in states:
        maxsel = H.max_selectors(w - 2)
        sym = syms_stage(plan, width=w)
        gf = gfreq_stage(sym, maxsel=maxsel)
        lg0 = seed_stage(gf, plan["n_sym"], plan["n_in_use"])
        lg1, sel1 = iter_once(gf, lg0, plan["n_sym"], plan["n_in_use"])
        ic = iters_count(gf, lg0, plan["n_sym"], plan["n_in_use"])
        jax.block_until_ready(lg1)
        warm.append((sym, gf, lg0))
        rec("iters", width=w, iters=np.asarray(ic).tolist())

    names = ("syms", "gfreq", "seed", "iter_once")
    for rep in range(3):
        sums = dict.fromkeys(names, 0.0)
        for (plan, w), (sym, gf, lg0) in zip(states, warm):
            maxsel = H.max_selectors(w - 2)
            t = time.time()
            s = syms_stage(plan, width=w)
            jax.block_until_ready(s)
            sums["syms"] += time.time() - t

            t = time.time()
            g = gfreq_stage(s, maxsel=maxsel)
            jax.block_until_ready(g)
            sums["gfreq"] += time.time() - t

            t = time.time()
            l0 = seed_stage(g, plan["n_sym"], plan["n_in_use"])
            jax.block_until_ready(l0)
            sums["seed"] += time.time() - t

            t = time.time()
            l1, _ = iter_once(g, l0, plan["n_sym"], plan["n_in_use"])
            jax.block_until_ready(l1)
            sums["iter_once"] += time.time() - t
        rec(
            "huff_parts_l9",
            rep=rep,
            n_batches=len(states),
            total_s={k: round(v, 4) for k, v in sums.items()},
            per_batch_s={k: round(v / len(states), 4) for k, v in sums.items()},
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
