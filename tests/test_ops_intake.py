"""Device intake ops: range CRCs (ops/crc.py) and RLE1 (ops/rle1.py),
differential-tested against the serial CRC oracle and the oracle splitter
(and the native C intake where built)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bz2tpu.format import constants as C
from bz2tpu.format.crc32 import crc32_serial
from bz2tpu.ops.crc import crc32_device, crc32_ranges
from bz2tpu.ops.rle1 import block_cuts, out_capacity, rle1_encode
from bz2tpu.oracle.encoder import _emit_pieces, _run_pieces, rle1_split

from conftest import make_corpus


def test_crc_ranges_match_serial():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 4096, dtype=np.uint8)
    starts = np.array([0, 0, 100, 555, 4000, 4096, 0, 17], dtype=np.int32)
    ends = np.array([4096, 1, 2000, 556, 4096, 4096, 4095, 17], dtype=np.int32)
    got = np.asarray(crc32_ranges(jnp.asarray(data), jnp.asarray(starts), jnp.asarray(ends), lanes=64))
    for g, (a, b) in zip(got, zip(starts, ends)):
        assert int(g) == crc32_serial(data[a:b]), (a, b)


def test_crc_device_lane_counts():
    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, 8192, dtype=np.uint8)
    want = crc32_serial(data[:5000])
    for lanes in (8, 64, 512, 2048):
        assert int(crc32_device(jnp.asarray(data), 5000, lanes=lanes)) == want


@pytest.mark.parametrize("kind", ["text", "runs", "zeros", "random"])
def test_rle1_encode_matches_oracle_pieces(kind):
    rng = np.random.default_rng(13)
    for n in (0, 1, 3, 4, 255, 256, 259, 260, 1000, 50_000):
        data = np.frombuffer(make_corpus(rng, kind, n), dtype=np.uint8) if n else np.zeros(0, np.uint8)
        N = 65536
        padded = np.zeros(N, np.uint8)
        padded[:n] = data
        r = rle1_encode(jnp.asarray(padded), n)
        out_len = int(r["out_len"])
        got = np.asarray(r["out"])[:out_len]
        vals, rl, ol = _run_pieces(data)
        want = _emit_pieces(vals, rl, ol) if vals.size else np.zeros(0, np.uint8)
        assert out_len == want.size, (kind, n)
        assert (got == want).all(), (kind, n)
        assert int(r["n_pieces"]) == vals.size
        assert out_len <= out_capacity(N)


@pytest.mark.parametrize("kind", ["text", "runs", "zeros"])
def test_rle1_block_cuts_match_oracle_split(kind):
    rng = np.random.default_rng(14)
    n = 250_000
    data = np.frombuffer(make_corpus(rng, kind, n), dtype=np.uint8)
    N = 1 << 18
    padded = np.zeros(N, np.uint8)
    padded[:n] = data
    r = rle1_encode(jnp.asarray(padded), n)
    cap = C.block_capacity(1)
    oc, rc, nb = block_cuts(
        r["piece_out_cum"], r["piece_raw_cum"], r["n_pieces"], cap=cap, max_blocks=8
    )
    blocks = rle1_split(data, 1)
    assert int(nb) == len(blocks)
    got_out = np.asarray(r["out"])
    ob = rb = 0
    for i, blk in enumerate(blocks):
        assert int(oc[i]) - ob == blk.data.size
        assert int(rc[i]) - rb == blk.raw_length
        assert (got_out[ob : int(oc[i])] == blk.data).all()
        ob, rb = int(oc[i]), int(rc[i])


def test_rle1_plus_crc_full_device_intake():
    # The composed story: RLE1 cuts + range CRCs over the ORIGINAL bytes
    # reproduce the oracle splitter's blocks end to end.
    rng = np.random.default_rng(15)
    n = 300_000
    data = np.frombuffer(make_corpus(rng, "text", n), dtype=np.uint8)
    N = 1 << 19
    padded = np.zeros(N, np.uint8)
    padded[:n] = data
    r = rle1_encode(jnp.asarray(padded), n)
    cap = C.block_capacity(1)
    oc, rc, nb = block_cuts(
        r["piece_out_cum"], r["piece_raw_cum"], r["n_pieces"], cap=cap, max_blocks=8
    )
    nb = int(nb)
    starts = np.concatenate([[0], np.asarray(rc)[: nb - 1]]).astype(np.int32)
    ends = np.asarray(rc)[:nb].astype(np.int32)
    crcs = np.asarray(crc32_ranges(jnp.asarray(padded), jnp.asarray(starts), jnp.asarray(ends)))
    blocks = rle1_split(data, 1)
    assert nb == len(blocks)
    for i, blk in enumerate(blocks):
        assert int(crcs[i]) == blk.crc, i
