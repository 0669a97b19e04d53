"""Fully-device compression intake (ops/intake.py) and the no-native
compress path built on it (compress_device_intake)."""

import bz2 as stdlib_bz2

import numpy as np
import pytest

import jax.numpy as jnp

from bz2tpu.ops.intake import chunk_capacity, device_intake
from bz2tpu.oracle.encoder import rle1_split
from bz2tpu.runtime.compressor import compress, compress_device_intake

from conftest import make_corpus


@pytest.mark.parametrize("kind", ["text", "runs", "zeros", "random"])
def test_device_intake_matches_oracle_split(kind):
    rng = np.random.default_rng(111)
    data = np.frombuffer(make_corpus(rng, kind, 250_000), np.uint8)
    n = data.size
    N = chunk_capacity(1, 4)
    padded = np.zeros(N, np.uint8)
    padded[:n] = data
    res = device_intake(jnp.asarray(padded), jnp.int32(n), level=1, max_blocks=4)
    blocks = rle1_split(data, 1)
    assert int(res["n_blocks"]) == len(blocks)
    rows = np.asarray(res["blocks"])
    ns = np.asarray(res["ns"])
    crcs = np.asarray(res["crcs"])
    raw = np.asarray(res["raw_lens"])
    for i, blk in enumerate(blocks):
        assert ns[i] == blk.data.size
        assert (rows[i, : blk.data.size] == blk.data).all()
        assert int(crcs[i]) == blk.crc
        assert int(raw[i]) == blk.raw_length


@pytest.mark.parametrize("kind,n", [
    ("text", 300_000), ("runs", 200_000), ("zeros", 500_000),
    ("random", 150_000), ("text", 50),
])
def test_compress_device_intake_round_trips(kind, n):
    rng = np.random.default_rng(112)
    data = make_corpus(rng, kind, n)
    out = compress_device_intake(data, level=1, parallel=2)
    assert stdlib_bz2.decompress(out) == data


def test_compress_device_intake_byte_identical_within_chunk():
    # When the input fits one chunk, block splits match the host C intake
    # exactly, so the streams are byte-identical.
    rng = np.random.default_rng(113)
    data = make_corpus(rng, "text", 250_000)
    assert compress_device_intake(data, level=1, parallel=4) == compress(
        data, level=1, parallel=4
    )


def test_compress_device_intake_empty():
    out = compress_device_intake(b"", level=1)
    assert stdlib_bz2.decompress(out) == b""


def test_device_intake_level9_slow():
    # Full-scale level-9 intake: a 900k-capacity block cut + CRC on device.
    import pytest

    rng = np.random.default_rng(114)
    data = np.frombuffer(make_corpus(rng, "text", 1_100_000), np.uint8)
    N = chunk_capacity(9, 2)
    padded = np.zeros(N, np.uint8)
    padded[: data.size] = data
    res = device_intake(jnp.asarray(padded), jnp.int32(data.size), level=9, max_blocks=2)
    blocks = rle1_split(data, 9)
    assert int(res["n_blocks"]) == len(blocks) == 2
    for i, blk in enumerate(blocks):
        assert int(np.asarray(res["ns"])[i]) == blk.data.size
        assert int(np.asarray(res["crcs"])[i]) == blk.crc


def test_compress_device_intake_escalate_then_reset():
    # A highly compressible prefix escalates the chunk window (nb==1,
    # under-full); the incompressible tail must then drop back to the
    # base window (a widened window caps at `batch` blocks per launch,
    # so staying wide would re-scan ~8x the consumable bytes). Stream
    # correctness across the escalate -> emit -> reset sequence:
    rng = np.random.default_rng(77)
    prefix = b"\x00" * 600_000
    tail = rng.integers(0, 256, 700_000, dtype=np.uint8).tobytes()
    data = prefix + tail
    out = compress_device_intake(data, level=1, parallel=2)
    assert stdlib_bz2.decompress(out) == data
