"""Round-4 on-device A/B batch: everything that was CPU-verified while
the terminal was wedged, measured in one process the moment it returns.

  1. e2e compress (quad BWT shipped) on the 14.4 MB bench corpus
  2. device-intake compress (prefix-state CRC + overlap rework)
  3. device decode (shared length LUTs + fused composition)

Appends JSONL to tools/probe12_out.jsonl (flushed per row, so a
mid-probe wedge loses nothing). Run under `timeout`.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe12_out.jsonl")


def log(**row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, file=sys.stderr, flush=True)


def main() -> int:
    t0 = time.time()
    import jax

    d = jax.devices()
    log(probe="health", devices=str(d), init_s=round(time.time() - t0, 1))

    from bench import make_mixed_corpus
    from bz2tpu.runtime.compressor import compress, compress_device_intake

    # --- 1. e2e compress, 14.4 MB bench corpus, 3 timed runs ------------
    data = make_mixed_corpus(16 * 100_000 * 9)
    t0 = time.time()
    out = compress(data, level=9, parallel=8)  # compile/warm
    log(probe="compress_warm", wall=round(time.time() - t0, 1))
    assert stdlib_bz2.decompress(out) == data
    for i in range(3):
        t0 = time.time()
        out = compress(data, level=9, parallel=8)
        dt = time.time() - t0
        log(probe=f"compress_{i}", wall=round(dt, 2),
            mb_s=round(len(data) / dt / 1e6, 3))
    t0 = time.time()
    stock = stdlib_bz2.compress(data, 9)
    log(probe="stock", wall=round(time.time() - t0, 2),
        mb_s=round(len(data) / (time.time() - t0) / 1e6, 3),
        ratio=round(len(stock) / len(data), 4),
        our_ratio=round(len(out) / len(data), 4))

    # --- 2. device-intake compress, one batch of 8 level-9 blocks -------
    n = 8 * 9 * 100_000
    di_data = make_mixed_corpus(n)
    t0 = time.time()
    out = compress_device_intake(di_data, level=9, parallel=8)  # warm
    log(probe="intake_warm", wall=round(time.time() - t0, 1))
    assert stdlib_bz2.decompress(out) == di_data
    for i in range(2):
        t0 = time.time()
        compress_device_intake(di_data, level=9, parallel=8)
        dt = time.time() - t0
        log(probe=f"intake_{i}", wall=round(dt, 2), mb_s=round(n / dt / 1e6, 3))

    # --- 3. device decode: 2-block level-1 slice + full level-9 block ---
    from bz2tpu.runtime.device_decode import _decompress_device_inner

    slice_in = make_mixed_corpus(2 * 100_000)
    slice_comp = stdlib_bz2.compress(slice_in, 1)
    t0 = time.time()
    got = _decompress_device_inner(slice_comp, True)  # compile
    log(probe="dec_slice_warm", wall=round(time.time() - t0, 1), ok=got == slice_in)
    for i in range(2):
        t0 = time.time()
        got = _decompress_device_inner(slice_comp, True)
        dt = time.time() - t0
        log(probe=f"dec_slice_{i}", wall=round(dt, 2),
            mb_s=round(len(slice_in) / dt / 1e6, 3), ok=got == slice_in)

    big_in = make_mixed_corpus(4 * 900_000)
    big_comp = stdlib_bz2.compress(big_in, 9)
    t0 = time.time()
    got = _decompress_device_inner(big_comp, True)
    log(probe="dec_l9_warm", wall=round(time.time() - t0, 1), ok=got == big_in)
    for i in range(2):
        t0 = time.time()
        got = _decompress_device_inner(big_comp, True)
        dt = time.time() - t0
        log(probe=f"dec_l9_{i}", wall=round(dt, 2),
            mb_s=round(len(big_in) / dt / 1e6, 3), ok=got == big_in)

    log(probe="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
