"""Blueprint-scale benches (BASELINE configs 2-3), recorded to a file.

Runs the two configurations the 14.4 MB driver bench cannot afford to
re-run every round on this terminal (the box wedges unpredictably under
sustained device load — PERF.md round 1/2 soak notes), and writes
BLUEPRINT_r05.json at the repo root. bench.py folds the recorded results
into its detail blob with this provenance.

  config 2: enwik8-class >=100 MB single-chip steady-state compress +
            decompress (corpus: bench.make_mixed_corpus — 40% on-image
            real text, 15% ELF, 20% Markov, 15% runs, 10% random).
  config 3: full -1..-9 level sweep, >=10 MB per level, ratio AND
            throughput, stock libbz2 measured on the same data.

Every compressed stream is round-trip-verified through stdlib bz2
before any number is written. Usage:

  python tools/bench_blueprint.py [--skip-100mb] [--levels 1,2,...]
"""

from __future__ import annotations

import argparse
import bz2 as stdlib_bz2
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, make_mixed_corpus  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BLUEPRINT_r05.json")


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def level_sweep(levels, flush=None) -> dict:
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress

    rows = {}
    for lv in levels:
        n = max(10_000_000, 2 * BATCH * C.BLOCK_SIZE_BASE * lv)
        data = make_mixed_corpus(n)
        try:
            # Warm with the FULL-length input: a shorter warm run can pick
            # different pow2 batch widths than the timed run, which then
            # pays a fresh multi-minute XLA compile inside its wall (seen
            # as the level-6 0.091 MB/s outlier in the first r4 sweep).
            compress(data, level=lv, parallel=BATCH)
            t0 = time.time()
            ours = compress(data, level=lv, parallel=BATCH)
            dt = time.time() - t0
            if stdlib_bz2.decompress(ours) != data:
                rows[str(lv)] = {"error": "round-trip mismatch"}
                continue
            t0 = time.time()
            stock = stdlib_bz2.compress(data, lv)
            stock_dt = time.time() - t0
            rows[str(lv)] = {
                "input_mb": round(n / 1e6, 1),
                "mb_s": round(n / dt / 1e6, 3),
                "stock_mb_s": round(n / stock_dt / 1e6, 3),
                "ratio": round(len(ours) / n, 5),
                "stock_ratio": round(len(stock) / n, 5),
            }
            print(f"level {lv}: {rows[str(lv)]}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — record partial progress
            rows[str(lv)] = {"error": str(e)[:200]}
        if flush is not None:  # survive a mid-sweep box wedge
            flush(rows)
    return rows


def blueprint_100mb(nbytes: int = 100_000_000) -> dict:
    from bz2tpu.runtime.compressor import compress
    from bz2tpu.runtime.decompressor import decompress as our_decompress

    data = make_mixed_corpus(nbytes)
    sha = hashlib.sha256(data).hexdigest()
    out: dict = {"input_mb": round(nbytes / 1e6, 1), "corpus_sha256": sha}
    compress(data[: nbytes // 50], level=9, parallel=BATCH)  # warm shapes
    # The 2 MB slice is text-heavy and only compiles a NARROW compact
    # rung; the timed run's random sections hit wider rungs, and a
    # first-time multi-minute XLA compile inside the wall craters the
    # average (seen: 1.56 MB/s vs the sweep's 4.3+). Compile every rung.
    from bz2tpu.ops.pipeline import prime_width_programs

    prime_width_programs(BATCH, 9 * 100_000)
    t0 = time.time()
    ours = compress(data, level=9, parallel=BATCH)
    out["compress_mb_s"] = round(nbytes / (time.time() - t0) / 1e6, 3)
    out["ratio"] = round(len(ours) / nbytes, 5)
    if stdlib_bz2.decompress(ours) != data:
        return {"error": "round-trip mismatch", **out}
    t0 = time.time()
    stock = stdlib_bz2.compress(data, 9)
    out["stock_compress_mb_s"] = round(nbytes / (time.time() - t0) / 1e6, 3)
    out["stock_ratio"] = round(len(stock) / nbytes, 5)
    t0 = time.time()
    got = our_decompress(ours)
    out["decompress_mb_s"] = round(nbytes / (time.time() - t0) / 1e6, 3)
    if got != data:
        return {"error": "our-decompress mismatch", **out}
    t0 = time.time()
    stdlib_bz2.decompress(ours)
    out["stock_decompress_mb_s"] = round(nbytes / (time.time() - t0) / 1e6, 3)
    print(f"100mb: {out}", file=sys.stderr, flush=True)
    return out


def blueprint_1gb_stream(n_total: int = 1_000_000_000) -> dict:
    """Config 4's single-chip analog: 1 GB through the bounded-memory
    streaming compressor (multi-host hardware does not exist here; the
    multi-host path itself is validated by the 2-process cluster tests).

    The compressed stream lands in a temp FILE (not a counting sink) and
    is then decoded back with the bounded-memory `decompress_file`; the
    decoded bytes' CRC32 must equal the input CRC or the record carries
    an error (VERDICT r4 missing #3: a silent mis-stitch at hour 2 of the
    soak must be visible). Stock libbz2 runs the same byte stream through
    an incremental BZ2Compressor as the comparator."""
    import tempfile
    import zlib

    from bz2tpu.runtime.decompressor import decompress_file
    from bz2tpu.runtime.stream import StreamCompressor

    piece = make_mixed_corpus(min(50_000_000, n_total))  # 50 MB window, rotated per pass

    def feed(consume) -> tuple[int, float]:
        """Stream the deterministic 1 GB corpus; returns (crc, wall)."""
        crc = 0
        t0 = time.time()
        fed = 0
        while fed < n_total:
            # Rotate the window so consecutive 50 MB spans differ (no free
            # repetition for the compressor to exploit).
            k = ((fed // len(piece)) * 4099) % len(piece)
            chunk = piece[k:] + piece[:k]
            take = min(len(chunk), n_total - fed)
            chunk = chunk[:take]
            crc = zlib.crc32(chunk, crc)
            consume(chunk)
            fed += take
            print(f"  1gb: {fed/1e6:.0f} MB in {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
        return crc, t0

    with tempfile.TemporaryDirectory() as td:
        comp_path = os.path.join(td, "soak.bz2")
        out: dict = {"input_gb": round(n_total / 1e9, 2),
                     "mode": "bounded-memory StreamCompressor, single chip"}
        with open(comp_path, "wb") as sink:
            sc = StreamCompressor(sink, level=9, parallel=BATCH)
            crc, t0 = feed(sc.write)
            sc.close()
            dt = time.time() - t0
        out["compress_mb_s"] = round(n_total / dt / 1e6, 3)
        out["ratio"] = round(os.path.getsize(comp_path) / n_total, 5)
        out["input_crc32"] = crc

        # Stock comparator on the identical stream (incremental API so the
        # 1 GB never materializes in one buffer).
        stock = stdlib_bz2.BZ2Compressor(9)
        stock_n = 0

        def stock_write(chunk):
            nonlocal stock_n
            stock_n += len(stock.compress(chunk))

        _, t0 = feed(stock_write)
        stock_n += len(stock.flush())
        out["stock_compress_mb_s"] = round(n_total / (time.time() - t0) / 1e6, 3)
        out["stock_ratio"] = round(stock_n / n_total, 5)

        # Verify: bounded-memory decode of the produced file, CRC compare.
        dec_path = os.path.join(td, "soak.out")
        t0 = time.time()
        decompress_file(comp_path, dec_path)
        out["decompress_mb_s"] = round(n_total / (time.time() - t0) / 1e6, 3)
        dcrc = 0
        dn = 0
        with open(dec_path, "rb") as f:
            while True:
                b = f.read(1 << 24)
                if not b:
                    break
                dcrc = zlib.crc32(b, dcrc)
                dn += len(b)
        out["verified"] = bool(dcrc == crc and dn == n_total)
        if not out["verified"]:
            out["error"] = f"decode CRC/len mismatch: {dcrc:#x}/{dn} vs {crc:#x}/{n_total}"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-100mb", action="store_true")
    ap.add_argument("--gb1", action="store_true",
                    help="also run the 1 GB streaming config (long)")
    ap.add_argument("--levels", default="1,2,3,4,5,6,7,8,9")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",") if x]

    rec: dict = {}
    if os.path.exists(OUT):  # accumulate across partial runs
        with open(OUT) as f:
            rec = json.load(f)
    rec.setdefault("note", (
        "recorded by tools/bench_blueprint.py on the one real chip; "
        "re-run the tool to refresh (the box's speed swings ~2x between "
        "hours, PERF.md round 2)"
    ))
    if levels:
        sweep = rec.get("level_sweep", {})

        def _flush(rows):
            sweep.update(rows)
            rec["level_sweep"] = sweep
            rec["level_sweep_recorded"] = _now()
            with open(OUT, "w") as f:
                json.dump(rec, f, indent=1)

        sweep.update(level_sweep(levels, flush=_flush))
        rec["level_sweep"] = sweep
        rec["level_sweep_recorded"] = _now()
    if not args.skip_100mb:
        rec["config2_100mb"] = blueprint_100mb()
        rec["config2_recorded"] = _now()
    if args.gb1:
        rec["config4_1gb_stream"] = blueprint_1gb_stream()
        rec["config4_recorded"] = _now()
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
