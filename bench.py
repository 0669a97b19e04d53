"""bz2tpu benchmark: steady-state compress throughput on the real chip.

Prints ONE JSON line:
  {"metric": "compress_throughput", "value": <MB/s>, "unit": "MB/s",
   "vs_baseline": <ours / stock-libbz2-single-core>}

Corpus (BASELINE.md configs ask for real corpora, not toy text): a
deterministic Silesia-style MIX built from stable on-image material —
real English/legal text, real source code, ELF binary, Markov text,
structured runs, and random bytes — in fixed proportions. Baseline is
stdlib bz2 (libbz2, one core) at the same level on the same data — the
reference's own comparison target ("competes with and can surpass the
original library", thesis p. 33). Output is round-trip-verified through
stdlib bz2 before any number is reported.

Extra detail emitted:
  - ratio parity at levels 1 and 9 on a slice (ours vs stock);
  - a scaling-efficiency table measured on a virtual CPU mesh in a
    subprocess (1/2/4/8 devices, weak scaling). Virtual devices share one
    host CPU, so that table validates the sharded path and the metric
    plumbing; real efficiency needs a real multi-chip slice.
"""

from __future__ import annotations

import bz2 as stdlib_bz2
import glob
import json
import os
import subprocess
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


def _real_text(nbytes: int) -> bytes:
    """Stable on-image English/legal/source text, no repetition."""
    pools = []
    lic = "/THIRD_PARTY_NOTICES/LICENSES.txt"
    if os.path.exists(lic):
        with open(lic, "rb") as f:
            pools.append(f.read())
    src = []
    size = 0
    seen: set[str] = set()
    # Widening pool ladder: numpy/jax sources first (stable across small
    # corpora, keeps the 14.4 MB bench corpus identical to earlier
    # rounds), then every site-packages .py (~490 MB on-image) so even
    # the 100 MB blueprint corpus is genuine English/source text. Paths
    # dedupe so nothing repeats (repetition flatters compressors).
    for pat in ("/opt/venv/lib/python3*/site-packages/numpy/**/*.py",
                "/opt/venv/lib/python3*/site-packages/jax/_src/*.py",
                "/opt/venv/lib/python3*/site-packages/**/*.py"):
        if size > nbytes:
            break
        for p in sorted(glob.glob(pat, recursive=True)):
            if p in seen:
                continue
            seen.add(p)
            try:
                with open(p, "rb") as f:
                    src.append(f.read())
            except OSError:
                continue
            size += len(src[-1])
            if size > nbytes:
                break
    pools.append(b"".join(src))
    blob = b"".join(pools)
    if len(blob) < nbytes:  # pad with Markov text, never by repetition
        blob += make_text(nbytes - len(blob), 7)
    return blob[:nbytes]


def _binary(nbytes: int) -> bytes:
    for p in sorted(glob.glob("/opt/venv/lib/python3*/site-packages/numpy/_core/*.so")):
        with open(p, "rb") as f:
            b = f.read()
        if len(b) >= nbytes:
            return b[:nbytes]
    return np.random.default_rng(3).integers(0, 256, nbytes, dtype=np.uint8).tobytes()


def _runs(nbytes: int, seed: int) -> bytes:
    r = np.random.default_rng(seed)
    vals = r.integers(0, 16, 4096, dtype=np.uint8)
    lens = r.integers(1, 600, 4096)
    return np.repeat(vals, lens).tobytes()[:nbytes]


def make_mixed_corpus(nbytes: int) -> bytes:
    """Silesia-style deterministic mix: 40% real text, 15% binary, 20%
    Markov text, 15% structured runs, 10% random."""
    spec = [
        (0.40, lambda n: _real_text(n)),
        (0.15, lambda n: _binary(n)),
        (0.20, lambda n: make_text(n, 11)),
        (0.15, lambda n: _runs(n, 13)),
        (0.10, lambda n: np.random.default_rng(17).integers(0, 256, n, dtype=np.uint8).tobytes()),
    ]
    parts = []
    for frac, fn in spec:
        parts.append(fn(int(nbytes * frac)))
    blob = b"".join(parts)
    if len(blob) < nbytes:
        blob += make_text(nbytes - len(blob), 19)
    return blob[:nbytes]


def _scaling_table() -> dict | None:
    """Weak-scaling efficiency on a virtual CPU mesh (subprocess)."""
    code = r"""
import json, os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) if "__file__" in dir() else ".")
from bz2tpu.format import constants as C
from bz2tpu.parallel.mesh import block_mesh, encode_blocks_sharded
from bz2tpu.oracle.encoder import rle1_split

level = 1
cap = C.block_capacity(level)
rng = np.random.default_rng(5)
rows = {}
PER_DEV = 2  # enough per-shard work that dispatch overhead stops dominating
for nd in (1, 2, 4, 8):
    B = nd * PER_DEV
    raw = rng.integers(97, 123, B * cap, dtype=np.uint8)
    blocks = rle1_split(raw, level)[:B]
    # cap + 4: the crossing RLE1 piece may overshoot the fill threshold
    # (stock's rule, format.constants.BLOCK_CAPACITY_SLACK).
    batch = np.zeros((B, cap + 4), np.uint8)
    ns = np.ones(B, np.int32)
    for i, blk in enumerate(blocks):
        batch[i, : blk.data.size] = blk.data
        ns[i] = blk.data.size
    mesh = block_mesh(nd)
    out = encode_blocks_sharded(batch, jnp.asarray(ns), mesh=mesh)  # compile
    np.asarray(jax.device_get(out["total_bits"]))
    samples = []
    for _ in range(3):
        t0 = time.time()
        out = encode_blocks_sharded(batch, jnp.asarray(ns), mesh=mesh)
        np.asarray(jax.device_get(out["words"]))
        samples.append(time.time() - t0)
    rows[nd] = B * cap / sorted(samples)[1] / 1e6
from bz2tpu.utils.metrics import scaling_efficiency
eff = scaling_efficiency(rows)
print(json.dumps({
    "mode": "virtual_cpu_mesh_weak_scaling",
    "note": ("plumbing-only: virtual devices share ONE host CPU, so "
             "efficiency here measures CPU contention, not ICI scaling; "
             "real efficiency needs a real multi-chip slice"),
    "mb_s": {str(k): round(v, 2) for k, v in rows.items()},
    "efficiency": {str(k): round(v, 3) for k, v in eff.items()},
}))
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            timeout=1200, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode != 0:
            return {"error": r.stderr.decode()[-300:]}
        return json.loads(r.stdout.decode().strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001 — bench must still print its line
        return {"error": str(e)[:300]}


def _corpus_provenance(data: bytes) -> dict:
    """Reproducibility anchor: the corpus is deterministic given this
    image's files; the hash lets a third party confirm byte-identity."""
    import hashlib

    return {
        "sha256": hashlib.sha256(data).hexdigest(),
        "composition": "40% on-image real text (LICENSES.txt + numpy/jax "
                       "sources), 15% numpy ELF .so, 20% seeded Markov "
                       "text, 15% seeded runs, 10% seeded random",
        "regenerate": "python -c \"import bench; bench.make_mixed_corpus(N)\"",
    }


def _worst_case() -> dict:
    """BWT worst case (BASELINE 'repetitive/low-entropy' config): a
    251-byte cycle of distinct values — RLE1 cannot collapse it and every
    suffix shares long periodic context, so prefix doubling runs its full
    round count (the input class the reference needed a TRBudget escape
    hatch for, kernel.cpp:2109-2142). Same batch shapes as the main run,
    so no extra compiles."""
    from bz2tpu.runtime.compressor import compress

    try:
        cycle = bytes(range(1, 252))
        n = 8 * 9 * 100_000
        data = (cycle * (n // len(cycle) + 1))[:n]
        out = compress(data, level=LEVEL, parallel=BATCH)  # warm shapes
        t0 = time.time()
        out = compress(data, level=LEVEL, parallel=BATCH)
        dt = time.time() - t0
        if stdlib_bz2.decompress(out) != data:
            return {"error": "round-trip mismatch"}
        return {"mb_s": round(n / dt / 1e6, 3), "ratio": round(len(out) / n, 5)}
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[:120]}


def _device_intake() -> dict:
    """Fully-device compress (RLE1 + splitting + CRC on the TPU, zero
    host passes over raw bytes — the no-C-extension path, `--backend
    device`). One batch of 8 level-9 blocks; round-trip verified."""
    from bz2tpu.runtime.compressor import compress_device_intake

    try:
        n = 8 * 9 * 100_000
        data = make_mixed_corpus(n)
        out = compress_device_intake(data, level=LEVEL, parallel=BATCH)  # warm
        t0 = time.time()
        out = compress_device_intake(data, level=LEVEL, parallel=BATCH)
        dt = time.time() - t0
        if stdlib_bz2.decompress(out) != data:
            return {"error": "round-trip mismatch"}
        return {"mb_s": round(n / dt / 1e6, 3)}
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[:120]}


def _stock_decompress_sweep(levels=(1, 5, 9)) -> dict:
    """Decompress STOCK-produced streams (foreign bitstreams, the
    interop-critical direction) with our host decoder at several levels."""
    from bz2tpu.runtime.decompressor import decompress as our_decompress

    out = {}
    for lv in levels:
        try:
            n = 2 * 100_000 * lv
            data = make_mixed_corpus(n)
            stream = stdlib_bz2.compress(data, lv)
            t0 = time.time()
            got = our_decompress(stream)
            dt = time.time() - t0
            out[str(lv)] = (
                {"mb_s": round(n / dt / 1e6, 2)} if got == data
                else {"error": "mismatch"}
            )
        except Exception as e:  # noqa: BLE001
            out[str(lv)] = {"error": str(e)[:120]}
    return out


def _ratio_sweep(levels=(1, 9)) -> dict:
    """Ratio parity vs stock on a 2-block slice per level (cached shapes)."""
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress

    out = {}
    for lv in levels:
        try:
            n = 2 * C.BLOCK_SIZE_BASE * lv
            data = make_mixed_corpus(n)
            ours = compress(data, level=lv, parallel=2)
            if stdlib_bz2.decompress(ours) != data:
                out[str(lv)] = {"error": "round-trip mismatch"}
                continue
            stock = stdlib_bz2.compress(data, lv)
            out[str(lv)] = {
                "ratio": round(len(ours) / n, 4),
                "stock_ratio": round(len(stock) / n, 4),
            }
        except Exception as e:  # noqa: BLE001
            out[str(lv)] = {"error": str(e)[:120]}
    return out


def _blueprint_recorded() -> dict | None:
    """BASELINE configs 2-3 (100 MB run + full -1..-9 sweep), recorded by
    tools/bench_blueprint.py on the real chip. Folded in from the file
    rather than re-run here: the two configs move ~200 MB through a
    terminal that wedges unpredictably under sustained load, which would
    take the whole driver bench down with them. Provenance (corpus
    sha256, timestamps) rides in the record."""
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BLUEPRINT_r*.json")))
    for path in reversed(paths):  # newest round wins
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
    return None


def main() -> int:
    from bz2tpu.format import constants as C
    from bz2tpu.runtime.compressor import compress

    nbytes = N_BLOCKS * C.BLOCK_SIZE_BASE * LEVEL
    data = make_mixed_corpus(nbytes)
    warm = make_mixed_corpus(nbytes)[: nbytes // 2] + make_text(nbytes - nbytes // 2, 42)

    # Count XLA compile events during warmup, separating fresh compiles
    # from persistent-cache hits: a primed cache should show ~0 FRESH
    # compiles (VERDICT-r2 item 5 — warmup residue is then backend init +
    # AOT loads, i.e. environment, not our shapes). jax logs a
    # "Compiling <fn>" line before the cache lookup and a "Persistent
    # compilation cache hit" line when the lookup succeeds, so
    # fresh = compiling - hits.
    import logging

    import jax as _jax

    compiling_events: list[str] = []
    cache_hit_events: list[str] = []

    class _CompileCounter(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "Persistent compilation cache hit" in msg:
                cache_hit_events.append(msg[:80])
            elif msg.startswith("Compiling "):
                compiling_events.append(msg[:80])

    _jax.config.update("jax_log_compiles", True)
    _h = _CompileCounter()
    logging.getLogger("jax").addHandler(_h)
    logging.getLogger("jax").setLevel(logging.WARNING)

    t0 = time.time()
    compress(warm, level=LEVEL, parallel=BATCH)  # compile + warm caches
    compress(warm, level=LEVEL, parallel=BATCH)  # 2nd warm: the first
    # post-compile run still carries a ~30% backend warm tail (measured
    # in every probe series; samples_s records all timed runs anyway)
    warm_s = time.time() - t0
    warm_cache_hits = len(cache_hit_events)
    warm_compiles = max(len(compiling_events) - warm_cache_hits, 0)
    _jax.config.update("jax_log_compiles", False)
    logging.getLogger("jax").removeHandler(_h)

    # Median of three timed runs (all samples recorded in the detail blob:
    # the terminal's speed swings ~2x between moments, PERF.md round 2);
    # every run is round-trip-verified.
    ours_samples = []
    for _ in range(3):
        t0 = time.time()
        out = compress(data, level=LEVEL, parallel=BATCH)
        ours_samples.append(time.time() - t0)
        if stdlib_bz2.decompress(out) != data:
            print(json.dumps({"metric": "compress_throughput", "value": 0.0,
                              "unit": "MB/s", "vs_baseline": 0.0,
                              "error": "round-trip mismatch"}))
            return 1
    dt = sorted(ours_samples)[1]
    ours = nbytes / dt / 1e6

    stock_samples = []
    for _ in range(3):
        t0 = time.time()
        stock = stdlib_bz2.compress(data, LEVEL)
        stock_samples.append(time.time() - t0)
    stock_dt = sorted(stock_samples)[1]
    stock_mbps = nbytes / stock_dt / 1e6

    from bz2tpu.runtime.decompressor import decompress as our_decompress

    t0 = time.time()
    our_decompress(out)
    dec_mbps = nbytes / (time.time() - t0) / 1e6
    t0 = time.time()
    stdlib_bz2.decompress(out)
    stock_dec_mbps = nbytes / (time.time() - t0) / 1e6

    # Device decode path (Huffman+MTF+IBWT on the TPU): measured on a
    # 2-block slice; reported honestly — on this terminal the host C path
    # wins, the device path is the design for real-HBM hardware.
    try:
        from bz2tpu.runtime.device_decode import _decompress_device_inner

        slice_in = make_mixed_corpus(2 * C.BLOCK_SIZE_BASE)
        slice_comp = stdlib_bz2.compress(slice_in, 1)
        _decompress_device_inner(slice_comp, True)  # compile
        t0 = time.time()
        dd = _decompress_device_inner(slice_comp, True)
        dev_dec_mbps = (
            round(len(slice_in) / (time.time() - t0) / 1e6, 3) if dd == slice_in else None
        )
    except Exception as e:  # noqa: BLE001 — bench must still print its line
        dev_dec_mbps = f"error: {str(e)[:120]}"

    # The same design priced on real TPU HBM (PERF.md "gather floor" +
    # round-4 LUT rework): this terminal prices gathers per-element at
    # ~5x its own elementwise floor (locality-insensitive, the
    # +prefer-no-gather AOT lowering), so the measured number above is a
    # property of the box, not the algorithm.
    device_decode_model = {
        "derivation": "PERF.md round-3 gather attribution + round-4 LUT rework",
        "per_8x900k_bucket": {
            "composition_gather_gb": 4.0,   # 7 fused doublings x (8, 6 x 2^21) int32 r+w
            "lens_lut_gather_gb": 0.5,      # 1 LUT gather pass (was 6x5 searchsorted passes)
            "ibwt_mtf_gather_gb": 1.4,      # ~20 IBWT doublings + ~5 inverse-MTF passes
            "serial_chain_ms": 18,          # 18002-group walk, ~1us/iter, vmapped across blocks
        },
        "v5e_800gbps_est_ms_per_bucket": 25,
        "implied_mb_s": 290,
        "note": "estimate (bandwidth + serial-walk latency), vs 23-65 MB/s "
                "host C: the device path is the real-HW design, kept behind "
                "--backend device with certified host fallback",
    }

    # Output contract (VERDICT r4 weak #1): the driver records only a tail
    # window of stdout and parses the LAST line, so the headline JSON must
    # be the final line and SMALL. Bulk detail goes to (a) earlier
    # one-record-per-line JSON lines and (b) BENCH_DETAIL.json on disk.
    detail = {
        "level": LEVEL,
        "corpus": "mixed (40% real text, 15% ELF, 20% markov, 15% runs, 10% random)",
        "input_mb": round(nbytes / 1e6, 1),
        "ratio": round(len(out) / nbytes, 4),
        "stock_ratio": round(len(stock) / nbytes, 4),
        "stock_mb_s": round(stock_mbps, 3),
        "decompress_mb_s": round(dec_mbps, 3),
        "stock_decompress_mb_s": round(stock_dec_mbps, 3),
        "device_decompress_mb_s": dev_dec_mbps,
        "device_decompress_model_real_hbm": device_decode_model,
        "warmup_s": round(warm_s, 1),
        "warmup_fresh_compiles": warm_compiles,
        "warmup_cache_hits": warm_cache_hits,
        "samples_s": {"ours": [round(s, 3) for s in ours_samples],
                      "stock": [round(s, 3) for s in stock_samples]},
        "corpus_provenance": _corpus_provenance(data),
        "stock_stream_decompress": _stock_decompress_sweep(),
        "ratio_sweep": _ratio_sweep(),
        "bwt_worst_case": _worst_case(),
        "device_intake_compress": _device_intake(),
        "aot_cold_start": _aot_cold_start_recorded(),
        "scaling": _scaling_table(),
        "blueprint": _blueprint_recorded(),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        detail_path = None
    # One record per line, each line small enough to survive any tail
    # window; the headline line is last and carries only scalars.
    for key in sorted(detail):
        print(json.dumps({"record": key, "value": detail[key]})[:2000])
    sys.stdout.flush()
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
            "warmup_s": round(warm_s, 1),
            "full_detail": detail_path or "see 'record' lines above",
        },
    }))
    return 0


def _aot_cold_start_recorded() -> dict | None:
    """Fresh-process AOT cold-start wall (VERDICT r4 missing #2), recorded
    by tools/bench_aot_cold.py on the real chip; folded in from the file
    so the driver bench does not redo a multi-minute artifact export."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "AOT_COLD_START.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


if __name__ == "__main__":
    sys.exit(main())
