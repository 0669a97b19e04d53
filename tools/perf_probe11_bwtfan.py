"""Round-4 BWT fan-out probe: how far does the k-multiplying round go?

probe10 established: shift-based wrap (no gathers) -45%, + quad rounds
(sort 4 rank keys, k*=4) -62% vs shipped. This probe pushes the same axis:

  v4_quad:  fan=4, 3-char round 0   (probe10 winner, re-timed as baseline)
  v5_quad4: fan=4, 4-char round 0   (k0=4: 9 quad rounds instead of 10)
  v6_oct4:  fan=8, 4-char round 0   (k0=4: 6 oct rounds; sort has 9
            operands and the shift image builds to 8*cap)

All must be bit-identical to the shipped kernel. Writes
tools/probe11_out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe11_out.jsonl")


def make_variant(jnp, lax, *, fan: int, wide4: bool):
    assert fan in (2, 4, 8)

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

        ext0 = jnp.concatenate([data, jnp.zeros((4,), jnp.int32)])
        ext0 = lax.dynamic_update_slice(ext0, data[:4], (n,))
        d1 = lax.slice(ext0, (1,), (1 + cap,))
        d2 = lax.slice(ext0, (2,), (2 + cap,))
        d3 = lax.slice(ext0, (3,), (3 + cap,))
        small = n < 4
        key24 = jnp.where(small, data * 65536, data * 65536 + d1 * 256 + d2)
        key0 = jnp.where(valid, key24, (1 << 24) + iota)
        if wide4:
            keylo = jnp.where(valid & ~small, d3, -1)
            k_hi, k_lo, order = lax.sort((key0, keylo, iota), num_keys=2)
            head = jnp.concatenate(
                [
                    jnp.ones((1,), jnp.bool_),
                    (k_hi[1:] != k_hi[:-1]) | (k_lo[1:] != k_lo[:-1]),
                ]
            )
            k0 = jnp.where(small, jnp.int32(1), jnp.int32(4))
        else:
            key_sorted, order = lax.sort((key0, iota), num_keys=1)
            head = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
            )
            k0 = jnp.where(small, jnp.int32(1), jnp.int32(3))
        rank = _inverse_permute(order, _head_positions(head))
        active = jnp.sum(_tied(head).astype(jnp.int32))

        def shifted_image(rank):
            ext = jnp.concatenate([rank] + [jnp.zeros(cap, jnp.int32)] * (fan - 1))
            ext = lax.dynamic_update_slice(ext, rank, (n,))
            if fan >= 4:
                ext = lax.dynamic_update_slice(
                    ext, lax.slice(ext, (0,), (2 * cap,)), (2 * n,)
                )
            if fan == 8:
                ext = lax.dynamic_update_slice(
                    ext, lax.slice(ext, (0,), (4 * cap,)), (4 * n,)
                )
            return ext

        def full_round(state):
            rank, sa, active, k = state
            ext = shifted_image(rank)
            seconds = [
                jnp.where(valid, lax.dynamic_slice(ext, (j * k,), (cap,)), -1)
                for j in range(1, fan)
            ]
            sorted_ops = lax.sort((rank, *seconds, iota), num_keys=fan)
            keys, order = sorted_ops[:-1], sorted_ops[-1]
            diff = keys[0][1:] != keys[0][:-1]
            for kk in keys[1:]:
                diff = diff | (kk[1:] != kk[:-1])
            head = jnp.concatenate([jnp.ones((1,), jnp.bool_), diff])
            rank = _inverse_permute(order, _head_positions(head))
            tied = _tied(head)
            return rank, order, jnp.sum(tied.astype(jnp.int32)), k * fan

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

    variants = {"v0_shipped": bwt_encode_batch}
    for name, kw in (
        ("v4_quad", dict(fan=4, wide4=False)),
        ("v5_quad4", dict(fan=4, wide4=True)),
        ("v6_oct4", dict(fan=8, wide4=True)),
    ):
        variants[name] = jax.jit(jax.vmap(make_variant(jnp, lax, **kw)))

    # Tiny-n differential (n = 1..8) first.
    from bz2tpu.ops.bwt import bwt_encode as shipped_one

    tiny = np.zeros((8, 64), np.uint8)
    tiny_ns = np.arange(1, 9, dtype=np.int32)
    rng = np.random.default_rng(7)
    for i in range(8):
        tiny[i, : tiny_ns[i]] = rng.integers(0, 4, tiny_ns[i])
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
