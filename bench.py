"""bz2tpu benchmark: steady-state compress throughput on the real chip.

Prints ONE JSON line:
  {"metric": "compress_throughput", "value": <MB/s>, "unit": "MB/s",
   "vs_baseline": <ours / stock-libbz2-single-core>}

The corpus is deterministic Markov-ish text (the compressible regime both
the reference thesis and stock bzip2 target). Baseline is stdlib bz2
(libbz2, one core) at the same level on the same data — the reference's own
comparison target ("competes with and can surpass the original library",
thesis p. 33). Output is round-trip-verified through stdlib bz2 before any
number is reported.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import sys
import time

import numpy as np

LEVEL = 9
N_BLOCKS = 16  # two batches of 8: exercises dispatch/fetch pipelining
BATCH = 8
WORDS = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps  ", b"over\n", b"lazy ", b"dog. "]


def make_text(nbytes: int, seed: int) -> bytes:
    r = np.random.default_rng(seed)
    parts = []
    size = 0
    while size < nbytes:
        w = WORDS[int(r.integers(len(WORDS)))]
        parts.append(w)
        size += len(w)
    return b"".join(parts)[:nbytes]


def main() -> int:
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress

    nbytes = N_BLOCKS * C.BLOCK_SIZE_BASE * LEVEL
    warm = make_text(nbytes, 42)
    data = make_text(nbytes, 43)

    t0 = time.time()
    compress(warm, level=LEVEL, parallel=BATCH)  # compile + warm caches
    warm_s = time.time() - t0

    t0 = time.time()
    out = compress(data, level=LEVEL, parallel=BATCH)
    dt = time.time() - t0
    if stdlib_bz2.decompress(out) != data:
        print(json.dumps({"metric": "compress_throughput", "value": 0.0,
                          "unit": "MB/s", "vs_baseline": 0.0,
                          "error": "round-trip mismatch"}))
        return 1
    ours = nbytes / dt / 1e6

    t0 = time.time()
    stock = stdlib_bz2.compress(data, LEVEL)
    stock_dt = time.time() - t0
    stock_mbps = nbytes / stock_dt / 1e6

    from bz2tpu.runtime.decompressor import decompress as our_decompress

    t0 = time.time()
    our_decompress(out)
    dec_mbps = nbytes / (time.time() - t0) / 1e6
    t0 = time.time()
    stdlib_bz2.decompress(out)
    stock_dec_mbps = nbytes / (time.time() - t0) / 1e6

    print(json.dumps({
        "metric": "compress_throughput",
        "value": round(ours, 3),
        "unit": "MB/s",
        "vs_baseline": round(ours / stock_mbps, 3),
        "detail": {
            "level": LEVEL,
            "input_mb": round(nbytes / 1e6, 1),
            "ratio": round(len(out) / nbytes, 4),
            "stock_ratio": round(len(stock) / nbytes, 4),
            "stock_mb_s": round(stock_mbps, 3),
            "decompress_mb_s": round(dec_mbps, 3),
            "stock_decompress_mb_s": round(stock_dec_mbps, 3),
            "warmup_s": round(warm_s, 1),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
