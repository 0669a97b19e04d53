"""Round-3 MTF chunk-size sweep (REAL axon device).

The MTF stage's collapsed-domain scan runs a vmapped while_loop over
(chunk, 256) int16 arrays; trip count = max collapsed length / chunk.
Total traffic is chunk-size-invariant, so if the stage is per-iteration
overhead-bound on this backend, a larger chunk cuts iterations 1:1
without adding bytes. Sweep chunk in {4096, 8192, 16384, 32768} on the
same device-resident BWT output, interleaved, outputs validated equal.

Writes JSONL to tools/probe6_out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe6_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops.bwt import bwt_encode_batch
    from bz2tpu.ops.mtf import mtf_rle2_encode
    from bz2tpu.runtime.compressor import split_blocks

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    cap = 9 * C.BLOCK_SIZE_BASE
    data = make_mixed_corpus(8 * cap)
    blocks = split_blocks(np.frombuffer(data, np.uint8), 9)[:8]
    buf = np.zeros((8, cap), np.uint8)
    ns = np.ones(8, np.int32)
    for i, blk in enumerate(blocks):
        buf[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
    bufd = jax.device_put(jnp.asarray(buf))
    nsd = jax.device_put(jnp.asarray(ns))
    last, _ = bwt_encode_batch(bufd, nsd)
    np.asarray(last[:, :8])
    rec("bwt_ready")

    chunks = (4096, 8192, 16384, 32768)
    fns = {
        c: jax.jit(jax.vmap(lambda l, n, c=c: mtf_rle2_encode(l, n, chunk=c)))
        for c in chunks
    }
    ref = None
    for c in chunks:
        t0 = time.time()
        out = fns[c](last, nsd)
        got = (np.asarray(out["symbols"]), np.asarray(out["n_sym"]))
        if ref is None:
            ref = got
            ok = True
        else:
            ok = bool(
                np.array_equal(ref[0], got[0]) and np.array_equal(ref[1], got[1])
            )
        rec(f"warm_c{c}", wall=time.time() - t0, correct=ok)

    for rep in range(3):
        for c in chunks:
            t0 = time.time()
            out = fns[c](last, nsd)
            np.asarray(out["n_sym"])
            rec(f"time_c{c}_{rep}", wall=time.time() - t0)

    # --- BWT batch-width sweep: is per-op cost fixed or per-byte? -----
    # elementwise (8,900k) = 29 ms vs tiny-RPC 30 ms suggests the per-op
    # dispatch floor dominates; if so, B=16/32 nearly halves/quarters the
    # per-block cost and DEFAULT_BATCH=8 (a round-1 sweep) is stale.
    data32 = make_mixed_corpus(32 * cap)
    blocks32 = split_blocks(np.frombuffer(data32, np.uint8), 9)[:32]
    buf32 = np.zeros((32, cap), np.uint8)
    ns32 = np.ones(32, np.int32)
    for i, blk in enumerate(blocks32):
        buf32[i, : blk.data.size] = blk.data
        ns32[i] = blk.data.size
    for B in (8, 16, 32):
        bd = jax.device_put(jnp.asarray(buf32[:B]))
        nd = jax.device_put(jnp.asarray(ns32[:B]))
        t0 = time.time()
        l, p = bwt_encode_batch(bd, nd)
        np.asarray(p)
        rec(f"bwt_B{B}_warm", wall=time.time() - t0)
        for rep in range(2):
            t0 = time.time()
            l, p = bwt_encode_batch(bd, nd)
            np.asarray(p)
            np.asarray(l[:, :8])
            w = time.time() - t0
            rec(f"bwt_B{B}_{rep}", wall=w, s_per_block=round(w / B, 4))

    # --- gather floor on decode shapes --------------------------------
    # Device decode (probe5) runs 52 s / 14.4 MB at ~50 composition
    # gathers per 8-block bucket over (8, 2^21) int32; if one such gather
    # costs ~0.5 s, the gather primitive IS the decode wall (the AOT
    # executables are +prefer-no-gather).
    n = 1 << 21
    rng = np.random.default_rng(0)
    xg = jax.device_put(jnp.asarray(rng.integers(0, n, (8, n)), dtype=jnp.int32))
    take_row = jax.jit(jax.vmap(lambda v, i: v[i]))
    y = take_row(xg, xg)
    np.asarray(y[:, :4])
    for rep in range(3):
        t0 = time.time()
        y = take_row(xg, xg)
        np.asarray(y[:, :4])
        rec(f"gather_rand_8x2M_{rep}", wall=time.time() - t0)
    # Local-pattern gather (the real jump maps advance <= 23*k bits).
    iota = np.arange(n, dtype=np.int32)
    loc = np.minimum(iota[None, :] + rng.integers(1, 736, (8, n)), n - 1).astype(np.int32)
    locg = jax.device_put(jnp.asarray(loc))
    y = take_row(xg, locg)
    np.asarray(y[:, :4])
    for rep in range(3):
        t0 = time.time()
        y = take_row(xg, locg)
        np.asarray(y[:, :4])
        rec(f"gather_local_8x2M_{rep}", wall=time.time() - t0)

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
