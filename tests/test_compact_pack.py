"""Compact-width huff+pack (round 5): the staged pipeline slices the MTF
symbol batch to a quantized width >= max(n_sym) before the Huffman/pack
stage. The contract is BIT-IDENTICAL streams at every width, because
padding positions carry 0 bits and header selector slots beyond
n_selectors carry 0 bits regardless of max_selectors(width).
"""

import numpy as np
import pytest

from bz2tpu.ops.pipeline import huff_width


def test_huff_width_ladder():
    cap = 4096
    full = cap + 2
    # smallest rung that covers, never below max_nsym, never above full
    for nsym in [1, 100, full // 4, full // 2, full - 1, full]:
        w = huff_width(cap, nsym)
        assert nsym <= w <= full
    assert huff_width(cap, full) == full
    assert huff_width(cap, 1) == (full * 2 + 7) // 8


def test_huff_width_covers_selectors():
    # max_selectors(width - 2) must cover ceil(max_nsym / 50) selectors for
    # every reachable (capacity, n_sym) pair at the ladder's edges.
    from bz2tpu.ops.huffman import max_selectors

    for cap in [100_000, 300_000, 900_000, 4096]:
        for nsym in [1, 50, 51, cap // 3, cap // 2, cap, cap + 1]:
            w = huff_width(cap, nsym)
            assert max_selectors(w - 2) >= -(-nsym // 50)


@pytest.mark.parametrize("kind", ["text", "mixed"])
def test_compact_pack_bit_identical(kind, rng, monkeypatch):
    """Full compressed streams match exactly with compact pack on and off."""
    import bz2 as stdlib_bz2

    from bz2tpu.ops import pipeline
    from bz2tpu.runtime.compressor import compress

    if kind == "text":
        data = bytes(rng.integers(97, 123, 40_000, dtype=np.uint8))
    else:
        # text + runs + random tail: exercises blocks whose n_sym spans
        # different ladder rungs within one batch
        data = (
            bytes(rng.integers(97, 123, 15_000, dtype=np.uint8))
            + b"a" * 10_000
            + bytes(rng.integers(0, 256, 15_000, dtype=np.uint8))
        )

    monkeypatch.setattr(pipeline, "_COMPACT_PACK", False)
    full = compress(data, level=1, parallel=2)
    monkeypatch.setattr(pipeline, "_COMPACT_PACK", True)
    monkeypatch.setattr(pipeline, "_COMPACT_EMIT", False)
    pack_only = compress(data, level=1, parallel=2)
    monkeypatch.setattr(pipeline, "_COMPACT_EMIT", True)
    pack_emit = compress(data, level=1, parallel=2)
    assert pack_only == full
    assert pack_emit == full
    assert stdlib_bz2.decompress(full) == data


def test_compact_emit_edge_blocks(rng, monkeypatch):
    """Single-symbol and run-dominated blocks through the compact-emit
    path (m == 1 / r0_zero tail handling lives entirely in the plan)."""
    import bz2 as stdlib_bz2

    from bz2tpu.ops import pipeline
    from bz2tpu.runtime.compressor import compress

    monkeypatch.setattr(pipeline, "_COMPACT_PACK", True)
    monkeypatch.setattr(pipeline, "_COMPACT_EMIT", True)
    for data in (
        b"a",
        b"a" * 5000,
        b"ab" * 3000 + b"c" * 4000,
        bytes(rng.integers(0, 2, 6000, dtype=np.uint8)),
    ):
        out = compress(data, level=1, parallel=2)
        assert stdlib_bz2.decompress(out) == data
