"""Round-3 BWT variant A/B probe (run on the REAL axon device).

The round-3 stage-wall decomposition (probe3) attributes ~2.0 s of the
~3.5 s 8x900k batch to the BWT stage. Three candidate cuts, each tested
here against the shipped kernel on identical device-resident input,
interleaved A/B/C to cancel the box's slow mood drift:

  V1 mod-free: replace the ``(iota + k) % n`` integer modulo in wrap()
     (TPU integer division is a long scalarized expansion) with a single
     conditional subtract — valid because 0 <= iota < n and 0 <= k < n
     inside the loop, so iota + k < 2n.
  V2 wide round 0: rank SIX characters in round 0 with a (hi24, lo24)
     3-operand sort instead of three characters with a 2-operand sort —
     text ties resolving at ~384 chars then need 6*2^6 rounds instead of
     3*2^7, i.e. one fewer full doubling round.
  V3 sort-based re-rank: the per-round inverse-permutation scatter
     ``zeros.at[order].set(ranks)`` becomes a 2-op ``lax.sort`` keyed on
     order (the AOT executables are built +prefer-no-scatter, so scatter
     lowering is suspect).

Each variant is validated (last column + orig ptr bit-identical to the
shipped kernel on every block) before its timings count.

Writes JSONL to tools/probe4_out.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe4_out.jsonl")


def make_variant(jnp, lax, *, mod_free: bool, wide0: bool, sortrank: bool):
    def _head_positions(head):
        iota = jnp.arange(head.shape[0], dtype=jnp.int32)
        return lax.cummax(jnp.where(head, iota, 0))

    def _tied(head):
        nxt = jnp.concatenate([head[1:], jnp.ones((1,), jnp.bool_)])
        return ~head | ~nxt

    def bwt_encode(block, n):
        cap = block.shape[-1]
        iota = jnp.arange(cap, dtype=jnp.int32)
        valid = iota < n
        data = block.astype(jnp.int32)

        def wrap(k):
            if mod_free:
                s = iota + k
                return jnp.where(valid, jnp.where(s >= n, s - n, s), 0)
            return jnp.where(valid, (iota + k) % n, 0)

        def wrap_small(k):
            # Round 0 only: k <= 5 is NOT bounded by n for tiny blocks, and
            # jnp.where evaluates both branches, so a mod-free rewrite buys
            # nothing here. Round 0 runs once; the mod passes that matter
            # are the one-per-doubling-round ones in wrap().
            return jnp.where(valid, (iota + k) % n, 0)

        def rerank(order, head):
            hp = _head_positions(head)
            if sortrank:
                _, r = lax.sort((order, hp), num_keys=1)
                return r
            return jnp.zeros(cap, jnp.int32).at[order].set(hp)

        if wide0:
            hi = (
                data * 65536
                + data[wrap_small(1)] * 256
                + data[wrap_small(2)]
            )
            lo = (
                data[wrap_small(3)] * 65536
                + data[wrap_small(4)] * 256
                + data[wrap_small(5)]
            )
            hi = jnp.where(valid, hi, (1 << 24) + iota)
            lo = jnp.where(valid, lo, -1)
            k_hi, k_lo, order = lax.sort((hi, lo, iota), num_keys=2)
            head = jnp.concatenate(
                [
                    jnp.ones((1,), jnp.bool_),
                    (k_hi[1:] != k_hi[:-1]) | (k_lo[1:] != k_lo[:-1]),
                ]
            )
            k0 = jnp.int32(6)
        else:
            key24 = data * 65536 + data[wrap_small(1)] * 256 + data[wrap_small(2)]
            key0 = jnp.where(valid, key24, (1 << 24) + iota)
            key_sorted, order = lax.sort((key0, iota), num_keys=1)
            head = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
            )
            k0 = jnp.int32(3)
        rank = rerank(order, head)
        active = jnp.sum(_tied(head).astype(jnp.int32))

        def full_round(state):
            rank, sa, active, k = state
            second = jnp.where(valid, rank[wrap(k)], -1)
            key_r, key_s, order = lax.sort((rank, second, iota), num_keys=3)
            head = jnp.concatenate(
                [
                    jnp.ones((1,), jnp.bool_),
                    (key_r[1:] != key_r[:-1]) | (key_s[1:] != key_s[:-1]),
                ]
            )
            rank = rerank(order, head)
            tied = _tied(head)
            return rank, order, jnp.sum(tied.astype(jnp.int32)), k * 2

        def cond(state):
            _, _, active, k = state
            return (active > 0) & (k < n)

        state = (rank, order, active, k0)
        state = lax.while_loop(cond, full_round, state)
        sa = state[1]
        orig_ptr = jnp.argmax(sa == 0).astype(jnp.int32)
        if mod_free:
            prev = jnp.where(sa == 0, n - 1, sa - 1)
            last = jnp.where(valid, block[prev], 0).astype(jnp.uint8)
        else:
            last = jnp.where(valid, block[(sa - 1) % n], 0).astype(jnp.uint8)
        return last, orig_ptr

    return bwt_encode


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops.bwt import bwt_encode_batch
    from bz2tpu.runtime.compressor import split_blocks

    rows = []

    def rec(name, **kw):
        row = {"probe": name, **kw}
        rows.append(row)
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

    # Reference output (shipped kernel) + its timing as variant v0.
    variants = {"v0_shipped": bwt_encode_batch}
    for name, kw in (
        ("v1_modfree", dict(mod_free=True, wide0=False, sortrank=False)),
        ("v2_wide0", dict(mod_free=True, wide0=True, sortrank=False)),
        ("v3_sortrank", dict(mod_free=True, wide0=False, sortrank=True)),
    ):
        fn = make_variant(jnp, lax, **kw)
        variants[name] = jax.jit(jax.vmap(fn))

    # Warm + validate each variant against v0.
    t0 = time.time()
    ref_last, ref_ptr = bwt_encode_batch(bufd, nsd)
    ref_last_h, ref_ptr_h = np.asarray(ref_last), np.asarray(ref_ptr)
    rec("warm_v0", wall=time.time() - t0)
    for name, fn in variants.items():
        if name == "v0_shipped":
            continue
        t0 = time.time()
        last, ptr = fn(bufd, nsd)
        last_h, ptr_h = np.asarray(last), np.asarray(ptr)
        ok = bool(np.array_equal(last_h, ref_last_h) and np.array_equal(ptr_h, ref_ptr_h))
        rec(f"warm_{name}", wall=time.time() - t0, correct=ok)
        if not ok:
            rec("abort_incorrect", variant=name)

    # Interleaved timing: 3 passes over all variants.
    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.time()
            last, ptr = fn(bufd, nsd)
            np.asarray(ptr)
            np.asarray(last[:, :8])
            rec(f"time_{name}_{rep}", wall=time.time() - t0)

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
