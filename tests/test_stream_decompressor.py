"""Incremental push-style decoder vs stdlib bz2.BZ2Decompressor."""

import bz2 as stdlib_bz2

import numpy as np
import pytest

from bz2tpu import native
from bz2tpu.runtime.decompressor import StreamDecompressor

from conftest import make_corpus

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE, reason="native only")


@pytest.mark.parametrize("chunk", [1, 7, 1024, 65536])
def test_incremental_matches_one_shot(chunk):
    rng = np.random.default_rng(121)
    data = make_corpus(rng, "text", 400_000)
    comp = stdlib_bz2.compress(data, 1)
    d = StreamDecompressor()
    out = []
    for off in range(0, len(comp), chunk):
        out.append(d.decompress(comp[off : off + chunk]))
    assert b"".join(out) == data
    assert d.eof and d.unused_data == b""
    with pytest.raises(EOFError):
        d.decompress(b"x")


def test_unused_data_and_eof_parity():
    rng = np.random.default_rng(122)
    data = make_corpus(rng, "runs", 120_000)
    comp = stdlib_bz2.compress(data, 2)
    tail = b"TRAILING BYTES"
    ours = StreamDecompressor()
    ref = stdlib_bz2.BZ2Decompressor()
    got = ours.decompress(comp + tail)
    want = ref.decompress(comp + tail)
    assert got == want == data
    assert ours.eof == ref.eof is True
    assert ours.unused_data == ref.unused_data == tail


def test_incremental_partial_progress():
    rng = np.random.default_rng(123)
    data = make_corpus(rng, "text", 450_000)  # multiple level-1 blocks
    comp = stdlib_bz2.compress(data, 1)
    d = StreamDecompressor()
    half = d.decompress(comp[: len(comp) // 2])
    assert len(half) > 0  # at least one whole block decoded early
    assert not d.eof and d.needs_input
    rest = d.decompress(comp[len(comp) // 2 :])
    assert half + rest == data
    assert d.eof


def test_incremental_detects_corruption():
    rng = np.random.default_rng(124)
    data = make_corpus(rng, "text", 120_000)
    comp = bytearray(stdlib_bz2.compress(data, 1))
    comp[10] ^= 0x40  # stored block CRC
    d = StreamDecompressor()
    with pytest.raises(ValueError):
        d.decompress(bytes(comp))


def test_incremental_bad_magic():
    d = StreamDecompressor()
    with pytest.raises(ValueError):
        d.decompress(b"NOTB" + b"Z" * 100)
