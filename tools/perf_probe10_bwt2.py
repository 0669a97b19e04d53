"""Round-4 BWT variant A/B probe (run on the REAL axon device).

Round 3 left BWT at ~1.55 s of the ~2.8 s 8x900k batch (59%), with the
round loop costing ~80 ms/round. The one remaining per-round *memory*
primitive is the ``rank[wrap(k)]`` random GATHER — and the axon AOT
executables are built ``+prefer-no-gather`` (round-3 memory: fused gathers
cost far more than the 87 ms isolated floor). Candidates, interleaved A/B
to cancel the box's mood drift:

  v1_shift:  replace the doubling-round gather ``rank[(i+k) mod n]`` with
             contiguous shifts: ext = concat(rank, 0s); ext[n:n+cap]=rank
             (dynamic_update_slice); second = ext[k:k+cap] (dynamic_slice).
             Exact for k < n (loop invariant): i+k < 2n always lands in
             the doubled image.
  v2_shift0: v1 + gather-free round 0: ext = concat(data, 0^4) with
             data[:4] re-written at offset n serves d[(i+k) mod n] for
             k<=3 via STATIC slices when n >= 4; blocks with n < 4 fall
             back to a 1-char round-0 key with k0=1 (order-consistent, the
             doubling rounds take over) so no (iota+k)%n gather survives.
  v3_wide4:  v2 + FOUR-char round 0: (key24, d3) 2-key 3-operand sort —
             k0=4 cuts one doubling round (the round-3 rejected experiment
             was the SIX-char form whose extra key cost 3 more gathers;
             with shifts the 4th char is one static slice).
  v4_quad:   v2 + quadrupling rounds: sort (rank, r[i+k], r[i+2k],
             r[i+3k], iota) with num_keys=5 — 4k-order per round, halving
             the round count; reads reach i+3k < 4n so the shift image is
             built to 4*cap with three dynamic_update_slice writes.

Each variant must produce bit-identical (last, orig_ptr) to the shipped
kernel (total order incl. the iota tie-break is variant-invariant) before
its timings count.

Writes JSONL to tools/probe10_out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe10_out.jsonl")


def make_variant(jnp, lax, *, shift0: bool, wide4: bool, quad: bool):
    def _head_positions(head):
        iota = jnp.arange(head.shape[0], dtype=jnp.int32)
        return lax.cummax(jnp.where(head, iota, 0))

    def _tied(head):
        nxt = jnp.concatenate([head[1:], jnp.ones((1,), jnp.bool_)])
        return ~head | ~nxt

    def _inverse_permute(order, vals):
        _, out = lax.sort((order, vals), num_keys=1)
        return out

    def bwt_encode(block, n):
        cap = block.shape[-1]
        iota = jnp.arange(cap, dtype=jnp.int32)
        valid = iota < n
        data = block.astype(jnp.int32)

        # ---- round 0 ---------------------------------------------------
        if shift0:
            # ext[j] = data[j mod n] for j < n+4 when n >= 4 (static reads).
            ext0 = jnp.concatenate([data, jnp.zeros((4,), jnp.int32)])
            ext0 = lax.dynamic_update_slice(ext0, data[:4], (n,))
            d1 = lax.slice(ext0, (1,), (1 + cap,))
            d2 = lax.slice(ext0, (2,), (2 + cap,))
            d3 = lax.slice(ext0, (3,), (3 + cap,))
            small = n < 4
            if wide4:
                key24 = jnp.where(small, data * 65536, data * 65536 + d1 * 256 + d2)
                keylo = jnp.where(small, 0, d3)
                key0 = jnp.where(valid, key24, (1 << 24) + iota)
                keylo = jnp.where(valid, keylo, -1)
                k_hi, k_lo, order = lax.sort((key0, keylo, iota), num_keys=2)
                head = jnp.concatenate(
                    [
                        jnp.ones((1,), jnp.bool_),
                        (k_hi[1:] != k_hi[:-1]) | (k_lo[1:] != k_lo[:-1]),
                    ]
                )
                k0 = jnp.where(small, jnp.int32(1), jnp.int32(4))
            else:
                key24 = jnp.where(small, data * 65536, data * 65536 + d1 * 256 + d2)
                key0 = jnp.where(valid, key24, (1 << 24) + iota)
                key_sorted, order = lax.sort((key0, iota), num_keys=1)
                head = jnp.concatenate(
                    [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
                )
                k0 = jnp.where(small, jnp.int32(1), jnp.int32(3))
        else:
            def wrap0(k):
                return jnp.where(valid, (iota + k) % n, 0)

            key24 = data * 65536 + data[wrap0(1)] * 256 + data[wrap0(2)]
            key0 = jnp.where(valid, key24, (1 << 24) + iota)
            key_sorted, order = lax.sort((key0, iota), num_keys=1)
            head = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
            )
            k0 = jnp.int32(3)
        rank = _inverse_permute(order, _head_positions(head))
        active = jnp.sum(_tied(head).astype(jnp.int32))

        # ---- doubling rounds -------------------------------------------
        def shifted_rank(rank, k, times):
            """ext[j] = rank[j mod n] for j < times*n; read [k : k+cap]."""
            ext = jnp.concatenate([rank] + [jnp.zeros(cap, jnp.int32)] * (times - 1))
            ext = lax.dynamic_update_slice(ext, rank, (n,))
            if times == 4:
                # ext[:2cap] now holds rank[j mod n] for j < 2n; replaying
                # it at offset 2n extends coverage to j < 4n.
                ext = lax.dynamic_update_slice(
                    ext, lax.slice(ext, (0,), (2 * cap,)), (2 * n,)
                )
            return ext

        if quad:
            def full_round(state):
                rank, sa, active, k = state
                ext = shifted_rank(rank, k, 4)
                s1 = jnp.where(valid, lax.dynamic_slice(ext, (k,), (cap,)), -1)
                s2 = jnp.where(valid, lax.dynamic_slice(ext, (2 * k,), (cap,)), -1)
                s3 = jnp.where(valid, lax.dynamic_slice(ext, (3 * k,), (cap,)), -1)
                k_r, k_1, k_2, k_3, order = lax.sort(
                    (rank, s1, s2, s3, iota), num_keys=5
                )
                head = jnp.concatenate(
                    [
                        jnp.ones((1,), jnp.bool_),
                        (k_r[1:] != k_r[:-1])
                        | (k_1[1:] != k_1[:-1])
                        | (k_2[1:] != k_2[:-1])
                        | (k_3[1:] != k_3[:-1]),
                    ]
                )
                rank = _inverse_permute(order, _head_positions(head))
                tied = _tied(head)
                return rank, order, jnp.sum(tied.astype(jnp.int32)), k * 4
        else:
            def full_round(state):
                rank, sa, active, k = state
                ext = shifted_rank(rank, k, 2)
                second = jnp.where(valid, lax.dynamic_slice(ext, (k,), (cap,)), -1)
                key_r, key_s, order = lax.sort((rank, second, iota), num_keys=3)
                head = jnp.concatenate(
                    [
                        jnp.ones((1,), jnp.bool_),
                        (key_r[1:] != key_r[:-1]) | (key_s[1:] != key_s[:-1]),
                    ]
                )
                rank = _inverse_permute(order, _head_positions(head))
                tied = _tied(head)
                return rank, order, jnp.sum(tied.astype(jnp.int32)), k * 2

        def cond(state):
            _, _, active, k = state
            return (active > 0) & (k < n)

        state = lax.while_loop(cond, full_round, (rank, order, active, k0))
        sa = state[1]
        orig_ptr = jnp.argmax(sa == 0).astype(jnp.int32)
        prev = jnp.where(sa == 0, n - 1, sa - 1)
        last = jnp.where(valid, block[prev], 0).astype(jnp.uint8)
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

    variants = {"v0_shipped": bwt_encode_batch}
    for name, kw in (
        ("v1_shift", dict(shift0=False, wide4=False, quad=False)),
        ("v2_shift0", dict(shift0=True, wide4=False, quad=False)),
        ("v3_wide4", dict(shift0=True, wide4=True, quad=False)),
        ("v4_quad", dict(shift0=True, wide4=False, quad=True)),
    ):
        fn = make_variant(jnp, lax, **kw)
        variants[name] = jax.jit(jax.vmap(fn))

    # Small-n correctness (n = 1..6, incl. the n<4 fallback) on CPU-cheap
    # shapes first: differential vs the shipped kernel.
    tiny = np.zeros((8, 64), np.uint8)
    tiny_ns = np.arange(1, 9, dtype=np.int32)
    rng = np.random.default_rng(7)
    for i in range(8):
        tiny[i, : tiny_ns[i]] = rng.integers(0, 4, tiny_ns[i])
    from bz2tpu.ops.bwt import bwt_encode as shipped_one
    ref_tiny = jax.jit(jax.vmap(lambda b, n: shipped_one(b, n)))(
        jnp.asarray(tiny), jnp.asarray(tiny_ns)
    )
    ref_tiny = (np.asarray(ref_tiny[0]), np.asarray(ref_tiny[1]))
    for name, fn in variants.items():
        if name == "v0_shipped":
            continue
        out = fn(jnp.asarray(tiny), jnp.asarray(tiny_ns))
        ok = bool(
            np.array_equal(np.asarray(out[0]), ref_tiny[0])
            and np.array_equal(np.asarray(out[1]), ref_tiny[1])
        )
        rec(f"tiny_{name}", correct=ok)

    # Warm + validate each variant against v0 on the real batch.
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
