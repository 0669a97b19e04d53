"""Format layer tests: CRC32 and bit I/O, vs independent ground truth."""

import binascii

import numpy as np
import pytest

from bz2tpu.format import crc32 as crcmod
from bz2tpu.format.bitio import BitReader, BitWriter, concat_bitstreams, pack_bits


def _crc32_bzip2_ref(data: bytes) -> int:
    """Independent ground truth: CRC-32/BZIP2 = bit-reflected zlib crc32."""

    def rev32(x: int) -> int:
        return int(bin(x)[2:].zfill(32)[::-1], 2)

    rev_data = bytes(int(bin(b)[2:].zfill(8)[::-1], 2) for b in data)
    return rev32(binascii.crc32(rev_data) & 0xFFFFFFFF)


@pytest.mark.parametrize("n", [0, 1, 7, 63, 255, 1024, 100_003])
def test_crc32_matches_reflected_zlib(rng, n):
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    expected = _crc32_bzip2_ref(data)
    assert crcmod.crc32_serial(data) == expected
    assert crcmod.crc32(data) == expected


def test_crc32_known_vector():
    # CRC-32/BZIP2("123456789") = 0xFC891918 (published check value)
    assert crcmod.crc32(b"123456789") == 0xFC891918


def test_crc32_lane_parallel_equals_serial(rng):
    data = rng.integers(0, 256, 1_000_037, dtype=np.uint8).tobytes()
    assert crcmod.crc32(data) == crcmod.crc32_serial(data)


def test_crc32_combine(rng):
    a = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 777, dtype=np.uint8).tobytes()
    # raw states (pre-final-xor)
    sa = crcmod.crc32(a) ^ 0xFFFFFFFF
    sb = crcmod.crc32_serial(b, crc=0) ^ 0xFFFFFFFF  # zero-init raw state of b
    combined = crcmod.crc32_combine(sa, sb, len(b)) ^ 0xFFFFFFFF
    assert combined == crcmod.crc32(a + b)


def test_bitwriter_reader_roundtrip(rng):
    w = BitWriter()
    items = []
    for _ in range(2000):
        n = int(rng.integers(1, 33))
        v = int(rng.integers(0, 1 << n))
        items.append((n, v))
        w.write_bits(n, v)
    w.write_bits(48, 0x314159265359)
    items.append((48, 0x314159265359))
    r = BitReader(w.getvalue())
    for n, v in items:
        assert r.read_bits(n) == v


def test_unary():
    w = BitWriter()
    for v in [0, 1, 2, 5, 17]:
        w.write_unary(v)
    r = BitReader(w.getvalue())
    for v in [0, 1, 2, 5, 17]:
        assert r.read_unary() == v


def test_pack_bits_matches_bitwriter(rng):
    n = 5000
    lengths = rng.integers(1, 25, n)
    values = np.array([int(rng.integers(0, 1 << l)) for l in lengths], dtype=np.uint64)
    w = BitWriter()
    for v, l in zip(values.tolist(), lengths.tolist()):
        w.write_bits(int(l), int(v))
    packed, total = pack_bits(values, lengths)
    assert total == int(lengths.sum())
    assert packed.tobytes() == w.getvalue()


def test_concat_bitstreams(rng):
    parts = []
    w_all = BitWriter()
    for _ in range(37):
        nbits = int(rng.integers(1, 300))
        w = BitWriter()
        for _ in range(nbits):
            b = int(rng.integers(0, 2))
            w.write_bit(b)
            w_all.write_bit(b)
        parts.append((np.frombuffer(w.getvalue(), dtype=np.uint8), nbits))
    out, total = concat_bitstreams(parts)
    assert total == w_all.bit_length
    assert out.tobytes() == w_all.getvalue()
