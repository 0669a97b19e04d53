"""Round-5: device-intake decomposition (VERDICT r4 item 6, >= 95% ask).

The intake path ran at 80% of the default path in round 4 (3.01 vs
3.77 MB/s). This probe, on the real device, decomposes one intake
chunk the way probe3 decomposed the encode stages:

  * e2e walls for BOTH paths after the round-5 MTF rework (the 3.01/3.77
    numbers predate it — both move);
  * the device_intake program alone on a full 2^23 chunk;
  * its pieces: rle1_encode alone, crc32_ranges alone, block_cuts +
    row-gather (intake minus the two);
  * encode_blocks_staged on the intake's own output (device-resident);
  * the host-side scalar sync (n_blocks/raw_lens/ns fetch after intake).

Round-trip verified via stdlib bz2 every e2e run.
Writes JSONL to tools/probe18_out.jsonl.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe18_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_mixed_corpus
    from bz2tpu.format import constants as C
    from bz2tpu.ops.crc import crc32_ranges
    from bz2tpu.ops.intake import chunk_capacity, device_intake
    from bz2tpu.ops.pipeline import encode_blocks_staged
    from bz2tpu.ops.rle1 import rle1_encode
    from bz2tpu.runtime.compressor import compress, compress_device_intake

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    cap = 9 * C.BLOCK_SIZE_BASE
    data = make_mixed_corpus(16 * cap)

    # ---- e2e both paths (warm + 3) -------------------------------------
    for name, fn in (
        ("default", lambda: compress(data, level=9, parallel=8)),
        ("intake", lambda: compress_device_intake(data, level=9, parallel=8)),
    ):
        out = fn()
        assert stdlib_bz2.decompress(out) == data
        walls = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 3))
        best = min(walls)
        rec(f"e2e_{name}", walls=walls,
            mb_s=round(len(data) / best / 1e6, 3), out=len(out))

    # ---- one chunk, pieces ---------------------------------------------
    chunk_n = chunk_capacity(9, 8)
    padded = np.zeros(chunk_n, np.uint8)
    take = min(chunk_n, len(data))
    padded[:take] = np.frombuffer(data[:take], np.uint8)
    dchunk = jax.device_put(jnp.asarray(padded))
    dlen = jnp.int32(take)

    def timeit(name, f, n=3, sync=None):
        r = f()
        (sync or (lambda x: jax.tree_util.tree_map(
            lambda a: a.block_until_ready(), x)))(r)
        walls = []
        for _ in range(n):
            t0 = time.time()
            r = f()
            (sync or (lambda x: jax.tree_util.tree_map(
                lambda a: a.block_until_ready(), x)))(r)
            walls.append(round(time.time() - t0, 4))
        rec(name, walls=walls, best=min(walls))
        return r

    res = timeit("intake_program",
                 lambda: device_intake(dchunk, dlen, level=9, max_blocks=8))
    timeit("rle1_alone", lambda: rle1_encode(dchunk, dlen))
    starts = jnp.asarray(np.arange(8, dtype=np.int32) * (take // 8))
    ends = jnp.asarray((np.arange(8, dtype=np.int32) + 1) * (take // 8))
    timeit("crc_ranges_alone", lambda: crc32_ranges(dchunk, starts, ends))
    timeit("encode_on_intake_out",
           lambda: encode_blocks_staged(res["blocks"], res["ns"], res["crcs"]))

    # ---- host scalar sync after intake ---------------------------------
    r2 = device_intake(dchunk, dlen, level=9, max_blocks=8)
    t0 = time.time()
    nb = int(r2["n_blocks"])
    _ = np.asarray(r2["raw_lens"]); _ = np.asarray(r2["ns"])
    rec("scalar_sync_after_done", wall=round(time.time() - t0, 4), nb=nb)
    t0 = time.time()
    r3 = device_intake(dchunk, dlen, level=9, max_blocks=8)
    nb = int(r3["n_blocks"])
    _ = np.asarray(r3["raw_lens"]); _ = np.asarray(r3["ns"])
    rec("intake_plus_sync", wall=round(time.time() - t0, 4))

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
