"""Round-5 MTF stage rework A/B (REAL axon device).

VERDICT r4 item 1: MTF (~0.82 s/batch) became the largest stage after the
quad-BWT rework. Two attacks land in ops/mtf.py:

  (a) load-balanced batch ranks scan — closed-form per-chunk carries
      (scatter-max + cummax over the chunk axis) make every (block, chunk)
      slot independent, so a compacted live-slot while_loop trips
      sum(m_b)/(8*chunk) times instead of max(m_b)/chunk (a single
      random-data block no longer stalls the other 7 lanes);
  (b) RLE2 emission: 4 big gathers -> k_of fill + 2 packed int32 gathers,
      float log2 -> exact lax.clz bit-length.

This probe measures, on the same device-resident BWT output of the mixed
bench batch (8 x 900k): the old vmapped per-block stage, the new batch
stage, and the decomposition (collapse / ranks-old / ranks-batch / emit),
plus per-block collapsed lengths (the load-imbalance evidence).

Writes JSONL to tools/probe14_out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe14_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops.bwt import bwt_encode_batch
    from bz2tpu.ops.mtf import (
        _collapse,
        _mtf_ranks_batch,
        _mtf_ranks_collapsed,
        _rle2_emit,
        mtf_rle2_encode,
        mtf_rle2_encode_batch,
    )

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    cap = 9 * C.BLOCK_SIZE_BASE
    data = make_mixed_corpus(8 * cap)
    from bz2tpu.runtime.compressor import split_blocks

    blocks = split_blocks(np.frombuffer(data, np.uint8), 9)[:8]
    buf = np.zeros((8, cap), np.uint8)
    ns = np.ones(8, np.int32)
    for i, blk in enumerate(blocks):
        buf[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
    bufd = jax.device_put(jnp.asarray(buf))
    nsd = jax.device_put(jnp.asarray(ns))
    last, _ = bwt_encode_batch(bufd, nsd)
    last.block_until_ready()
    rec("bwt_ready")

    # --- decomposition pieces, each its own jit --------------------------
    collapse_fn = jax.jit(jax.vmap(_collapse))
    ranks_old_fn = jax.jit(
        jax.vmap(lambda s, m, niu: _mtf_ranks_collapsed(s, m, niu, 4096))
    )
    ranks_batch_fn = jax.jit(
        functools.partial(_mtf_ranks_batch, chunk=4096)
    )
    emit_fn = jax.jit(jax.vmap(_rle2_emit))
    old_stage = jax.jit(
        jax.vmap(lambda l, n: mtf_rle2_encode(l, n, chunk=4096))
    )
    new_stage = jax.jit(lambda l, n: mtf_rle2_encode_batch(l, n, chunk=4096))

    # collapsed lengths (load-imbalance evidence)
    cseq, cidx, m, used, niu = collapse_fn(last, nsd)
    ms = np.asarray(m)
    rec("collapsed_lengths", m=[int(x) for x in ms], ns=[int(x) for x in np.asarray(nsd)],
        chunks_per_block=[int((x + 4095) // 4096) for x in ms],
        old_trip=int(max((x + 4095) // 4096 for x in ms)),
        new_trip=int(sum((x + 4095) // 4096 for x in ms) // 8 + 1))

    cseq = jax.device_put(cseq); cidx = jax.device_put(cidx)
    m = jax.device_put(m); niu = jax.device_put(niu)

    # warmups
    for name, fn, args in [
        ("collapse", collapse_fn, (last, nsd)),
        ("ranks_old", ranks_old_fn, (cseq, m, niu)),
        ("ranks_batch", ranks_batch_fn, (cseq, m, niu)),
        ("old_stage", old_stage, (last, nsd)),
        ("new_stage", new_stage, (last, nsd)),
    ]:
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        rec(f"warm_{name}", wall=round(time.time() - t0, 3))

    cranks = ranks_batch_fn(cseq, m, niu)
    cranks = jax.device_put(cranks)
    t0 = time.time()
    out = emit_fn(cranks, cidx, m, nsd, used, niu)
    jax.block_until_ready(out)
    rec("warm_emit", wall=round(time.time() - t0, 3))

    # equality: new stage vs old stage
    o_old = old_stage(last, nsd)
    o_new = new_stage(last, nsd)
    ok = True
    for i in range(8):
        nsym = int(o_old["n_sym"][i])
        ok = ok and nsym == int(o_new["n_sym"][i])
        ok = ok and bool(
            np.array_equal(
                np.asarray(o_old["symbols"][i][:nsym]), np.asarray(o_new["symbols"][i][:nsym])
            )
        )
    rec("equal_old_new", ok=ok)

    # timed
    for rep in range(3):
        for name, fn, args in [
            ("collapse", collapse_fn, (last, nsd)),
            ("ranks_old", ranks_old_fn, (cseq, m, niu)),
            ("ranks_batch", ranks_batch_fn, (cseq, m, niu)),
            ("emit", emit_fn, (cranks, cidx, m, nsd, used, niu)),
            ("old_stage", old_stage, (last, nsd)),
            ("new_stage", new_stage, (last, nsd)),
        ]:
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            rec(f"time_{name}_{rep}", wall=round(time.time() - t0, 4))

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
