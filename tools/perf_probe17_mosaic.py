"""Round-5: first REAL-Mosaic data point for the Pallas BWT kernels.

VERDICT r4 item 9: ops/bwt_pallas.py has only ever run in interpret
mode (tests/test_ops_bwt_pallas.py); the VMEM-vs-HBM bet needs an
on-hardware compile result at a real shape. This probe, on the real
device:

  1. compiles + runs bitonic_sort_pallas and rerank_pallas standalone
     at the level-1 shape (100k -> N = 2^17) and times them against the
     XLA lax.sort + re-rank chain on identical data;
  2. compiles + runs the full bwt_encode_pallas at capacity 100_000 and
     checks bit-identical (last, ptr) against ops/bwt.bwt_encode;
  3. attempts the level-9 shape (900k -> N = 2^20, the 3-array x 2^20
     = 12 MB VMEM working set) and records compile success/failure.

Every step is wrapped so a Mosaic compile error is RECORDED, not fatal.
Writes JSONL to tools/probe17_out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe17_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_mixed_corpus
    from bz2tpu.ops import bwt as xbwt
    from bz2tpu.ops import bwt_pallas as pbwt

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time(), dev=str(jax.devices()[0]))

    def attempt(name, fn):
        t0 = time.time()
        try:
            out = fn()
            rec(name, ok=True, wall=round(time.time() - t0, 3), **out)
            return True
        except Exception as e:  # record Mosaic/compile failures verbatim
            rec(name, ok=False, wall=round(time.time() - t0, 3),
                err=f"{type(e).__name__}: {e}"[:500],
                tb=traceback.format_exc()[-800:])
            return False

    # ---- 1. standalone kernels at the level-1 shape (N = 2^17) --------
    rng = np.random.default_rng(17)
    n1 = 100_000
    keys_np = rng.integers(0, 1 << 20, n1, dtype=np.int32)
    keys = jax.device_put(jnp.asarray(keys_np))
    iota = jnp.arange(n1, dtype=jnp.int32)

    def run_sort():
        ks, od = pbwt.bitonic_sort_pallas((keys, iota))
        ks.block_until_ready()
        walls = []
        for _ in range(3):
            t0 = time.time()
            ks, od = pbwt.bitonic_sort_pallas((keys, iota))
            ks.block_until_ready()
            walls.append(round(time.time() - t0, 4))
        ref_k, ref_o = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))(
            keys, iota
        )
        match = bool(jnp.array_equal(ks, ref_k) & jnp.array_equal(od, ref_o))
        # XLA comparator walls on the same data
        xw = []
        for _ in range(3):
            t0 = time.time()
            a, b = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))(keys, iota)
            a.block_until_ready()
            xw.append(round(time.time() - t0, 4))
        return {"match_xla": match, "runs": walls, "xla_sort_runs": xw}

    sort_ok = attempt("bitonic_sort_2e17_compile_run", run_sort)

    def run_rerank():
        ks = jnp.sort(keys)
        pos, active = pbwt.rerank_pallas((ks,))
        pos.block_until_ready()
        walls = []
        for _ in range(3):
            t0 = time.time()
            pos, active = pbwt.rerank_pallas((ks,))
            pos.block_until_ready()
            walls.append(round(time.time() - t0, 4))
        return {"runs": walls, "active": int(active)}

    attempt("rerank_2e17_compile_run", run_rerank)

    # ---- 2. full BWT at level-1 capacity, bit-exact vs XLA path --------
    blk_np = np.frombuffer(make_mixed_corpus(n1), dtype=np.uint8).copy()
    blk = jax.device_put(jnp.asarray(blk_np))
    n = jnp.int32(n1)

    def run_full():
        last_x, ptr_x = xbwt.bwt_encode(blk, n, capacity=n1)
        last_x.block_until_ready()
        t0 = time.time()
        last_p, ptr_p = pbwt.bwt_encode_pallas(blk, n, capacity=n1)
        last_p.block_until_ready()
        compile_run = round(time.time() - t0, 2)
        match = bool(
            jnp.array_equal(last_p, last_x) & (int(ptr_p) == int(ptr_x))
        )
        walls, xw = [], []
        for _ in range(3):
            t0 = time.time()
            lp, _ = pbwt.bwt_encode_pallas(blk, n, capacity=n1)
            lp.block_until_ready()
            walls.append(round(time.time() - t0, 3))
            t0 = time.time()
            lx, _ = xbwt.bwt_encode(blk, n, capacity=n1)
            lx.block_until_ready()
            xw.append(round(time.time() - t0, 3))
        return {"bit_identical": match, "first_call": compile_run,
                "pallas_runs": walls, "xla_runs": xw}

    attempt("bwt_full_100k_vs_xla", run_full)

    # ---- 3. the 900k bet: compile at N = 2^20 --------------------------
    n9 = 900_000
    keys9 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 20, n9, dtype=np.int32))
    )
    iota9 = jnp.arange(n9, dtype=jnp.int32)

    def run_sort9():
        t0 = time.time()
        ks, od = pbwt.bitonic_sort_pallas((keys9, iota9))
        ks.block_until_ready()
        first = round(time.time() - t0, 2)
        walls = []
        for _ in range(3):
            t0 = time.time()
            ks, od = pbwt.bitonic_sort_pallas((keys9, iota9))
            ks.block_until_ready()
            walls.append(round(time.time() - t0, 4))
        ref_k, _ = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))(
            keys9, iota9
        )
        return {"first_call": first, "runs": walls,
                "match_xla": bool(jnp.array_equal(ks, ref_k))}

    attempt("bitonic_sort_2e20_compile_run", run_sort9)

    # 3-array sort (the pair-round working set) at 2^20 — the VMEM bet.
    s1 = jnp.roll(keys9, -1)

    def run_sort9_3():
        t0 = time.time()
        a, b, c = pbwt.bitonic_sort_pallas((keys9, s1, iota9))
        a.block_until_ready()
        first = round(time.time() - t0, 2)
        walls = []
        for _ in range(3):
            t0 = time.time()
            a, b, c = pbwt.bitonic_sort_pallas((keys9, s1, iota9))
            a.block_until_ready()
            walls.append(round(time.time() - t0, 4))
        return {"first_call": first, "runs": walls}

    attempt("bitonic_sort3_2e20_compile_run", run_sort9_3)

    # VMEM edge: the 2^20 shapes exceed the v5e 16 MB scoped limit
    # (measured 20 MB at 2 arrays, 24 MB at 3). 2^19 covers levels <= 4.
    n5 = 500_000  # level-5 block, pads to 2^19
    keys5 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 20, n5, dtype=np.int32))
    )
    iota5 = jnp.arange(n5, dtype=jnp.int32)
    s15 = jnp.roll(keys5, -1)

    def run_sort5_3():
        t0 = time.time()
        a, b, c = pbwt.bitonic_sort_pallas((keys5, s15, iota5))
        a.block_until_ready()
        first = round(time.time() - t0, 2)
        walls, xw = [], []
        for _ in range(3):
            t0 = time.time()
            a, b, c = pbwt.bitonic_sort_pallas((keys5, s15, iota5))
            a.block_until_ready()
            walls.append(round(time.time() - t0, 4))
            t0 = time.time()
            r = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=3))(
                keys5, s15, iota5
            )
            r[0].block_until_ready()
            xw.append(round(time.time() - t0, 4))
        return {"first_call": first, "runs": walls, "xla_sort3_runs": xw}

    attempt("bitonic_sort3_2e19_compile_run", run_sort5_3)

    n2 = 200_000  # level-2 block, pads to 2^18
    keys2 = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 20, n2, dtype=np.int32))
    )
    iota2 = jnp.arange(n2, dtype=jnp.int32)
    s12 = jnp.roll(keys2, -1)

    def run_sort2_3():
        t0 = time.time()
        a, b, c = pbwt.bitonic_sort_pallas((keys2, s12, iota2))
        a.block_until_ready()
        first = round(time.time() - t0, 2)
        walls, xw = [], []
        for _ in range(3):
            t0 = time.time()
            a, b, c = pbwt.bitonic_sort_pallas((keys2, s12, iota2))
            a.block_until_ready()
            walls.append(round(time.time() - t0, 4))
            t0 = time.time()
            r = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=3))(
                keys2, s12, iota2
            )
            r[0].block_until_ready()
            xw.append(round(time.time() - t0, 4))
        return {"first_call": first, "runs": walls, "xla_sort3_runs": xw}

    attempt("bitonic_sort3_2e18_compile_run", run_sort2_3)

    # Full BWT at the level-2 shape (largest where the pair-round 3-array
    # sort fits VMEM).
    blk2_np = np.frombuffer(make_mixed_corpus(n2), dtype=np.uint8).copy()
    blk2 = jax.device_put(jnp.asarray(blk2_np))

    def run_full2():
        last_x, ptr_x = xbwt.bwt_encode(blk2, jnp.int32(n2), capacity=n2)
        last_x.block_until_ready()
        t0 = time.time()
        last_p, ptr_p = pbwt.bwt_encode_pallas(blk2, jnp.int32(n2), capacity=n2)
        last_p.block_until_ready()
        compile_run = round(time.time() - t0, 2)
        match = bool(
            jnp.array_equal(last_p, last_x) & (int(ptr_p) == int(ptr_x))
        )
        walls, xw = [], []
        for _ in range(3):
            t0 = time.time()
            lp, _ = pbwt.bwt_encode_pallas(blk2, jnp.int32(n2), capacity=n2)
            lp.block_until_ready()
            walls.append(round(time.time() - t0, 3))
            t0 = time.time()
            lx, _ = xbwt.bwt_encode(blk2, jnp.int32(n2), capacity=n2)
            lx.block_until_ready()
            xw.append(round(time.time() - t0, 3))
        return {"bit_identical": match, "first_call": compile_run,
                "pallas_runs": walls, "xla_runs": xw}

    attempt("bwt_full_200k_vs_xla", run_full2)

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
