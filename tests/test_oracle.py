"""Oracle codec tests: round-trip + cross-validation against stdlib bz2
(libbzip2), in BOTH directions — the fidelity the reference lacks (its
decoder rejects real 100k-scale streams, BlockDecompressor.hpp:213-215).
"""

import bz2 as stdlib_bz2

import numpy as np
import pytest

from bz2tpu.format import constants as C
from bz2tpu.oracle import compress, decompress
from bz2tpu.oracle import encoder as enc
from tests.conftest import CORPUS_KINDS, make_corpus


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [1, 100, 5_000, 150_000])
def test_our_encode_stdlib_decode(rng, kind, n):
    data = make_corpus(rng, kind, n)
    out = compress(data, level=1)
    assert stdlib_bz2.decompress(out) == data


@pytest.mark.parametrize("kind", CORPUS_KINDS)
def test_our_encode_our_decode(rng, kind):
    data = make_corpus(rng, kind, 60_000)
    out = compress(data, level=1)
    assert decompress(out) == data


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("level", [1, 9])
def test_stdlib_encode_our_decode(rng, kind, level):
    data = make_corpus(rng, kind, 250_000)
    out = stdlib_bz2.compress(data, compresslevel=level)
    assert decompress(out) == data


def test_level9_multiblock_roundtrip(rng):
    data = make_corpus(rng, "text", 250_000)
    out = compress(data, level=2)  # forces 2 blocks at level 2
    assert stdlib_bz2.decompress(out) == data
    assert decompress(out) == data


def test_empty_input():
    out = compress(b"")
    assert stdlib_bz2.decompress(out) == b""
    assert decompress(out) == b""


def test_ratio_close_to_stock(rng):
    data = make_corpus(rng, "text", 300_000)
    ours = len(compress(data, level=3))
    stock = len(stdlib_bz2.compress(data, compresslevel=3))
    assert ours <= stock * 1.02, (ours, stock)


def test_crc_detects_corruption(rng):
    data = make_corpus(rng, "text", 30_000)
    out = bytearray(compress(data, level=1))
    out[len(out) // 2] ^= 0x40
    with pytest.raises(Exception):
        decompress(bytes(out))


# --- stage-level unit tests ------------------------------------------------


def test_rle1_pieces_roundtrip(rng):
    data = np.frombuffer(make_corpus(rng, "runs", 50_000), dtype=np.uint8)
    blocks = enc.rle1_split(data, level=1)
    from bz2tpu.oracle.decoder import inverse_rle1

    decoded = np.concatenate([inverse_rle1(b.data) for b in blocks])
    assert np.array_equal(decoded, data)
    assert sum(b.raw_length for b in blocks) == data.size
    for b in blocks:
        # stock's fill rule: the crossing piece may overshoot by <= 4
        assert b.data.size <= C.block_capacity(1) + 4


def test_bwt_roundtrip(rng):
    from bz2tpu.oracle.decoder import inverse_bwt

    for kind in ["text", "random", "zeros", "alternating"]:
        data = np.frombuffer(make_corpus(rng, kind, 4099), dtype=np.uint8)
        last, ptr = enc.bwt_encode(data)
        assert np.array_equal(inverse_bwt(last, ptr), data)


def test_bwt_known():
    # BWT of rotations of "banana": sorted rotations rows; last column "nnbaaa"
    data = np.frombuffer(b"banana", dtype=np.uint8)
    last, ptr = enc.bwt_encode(data)
    assert last.tobytes() == b"nnbaaa"
    assert ptr == 3


def test_mtf_rle2_known():
    # BWT-ish input with zero runs after MTF
    data = np.frombuffer(b"aaabccc", dtype=np.uint8)
    res = enc.mtf_rle2_encode(data)
    # used = {a,b,c} -> dense a=0,b=1,c=2; eob = 4
    # seq: a a a b c c c -> mtf codes: 0 0 0 1 2 0 0
    # zero-run 3 -> [3-1=2 -> digits 0,0 -> RUNA,RUNA]
    # then 1->sym2, 2->sym3, run 2 -> [2-1=1 -> digit 1 -> RUNB]
    assert res.alpha_size == 5
    assert res.symbols.tolist() == [C.RUNA, C.RUNA, 2, 3, C.RUNB, 4]


def test_huffman_lengths_kraft(rng):
    freqs = rng.integers(0, 1000, 258)
    lengths = enc.make_code_lengths(freqs)
    assert lengths.max() <= C.HUFFMAN_ENCODE_MAX_LENGTH
    assert lengths.min() >= 1
    assert np.sum(2.0 ** (-lengths.astype(float))) <= 1.0 + 1e-12


def test_canonical_codes_prefix_free(rng):
    freqs = rng.integers(1, 100, 50)
    lengths = enc.make_code_lengths(freqs)
    codes = enc.assign_canonical_codes(lengths)
    seen = set()
    for code, ln in zip(codes.tolist(), lengths.tolist()):
        bits = format(code, f"0{ln}b")
        for p in seen:
            assert not bits.startswith(p) and not p.startswith(bits)
        seen.add(bits)
