"""Legacy bzip2 0.9.0 randomised-block decode.

No modern encoder emits the randomised bit (reference OutputStream.hpp:211
writes 0; ours does too), but stock bzip2 still DECODES such blocks —
the reference rejects them (include/BlockDecompressor.hpp:274-277), so this
is the one spot the decoder surface here exceeds it (VERDICT round 2 #6).

No real-world randomised stream exists on this image, so the tests CRAFT
one: take a block's RLE1 payload S, pre-randomise it (XOR is an
involution), encode that via the oracle block writer with the randomised
bit set, and fix up the block CRC to the true data's CRC. A correct
decoder must undo the randomisation and recover the original data. Stock
bzip2 (`bzip2 -dc`) is the decisive oracle: it validates both our crafted
stream AND the RAND_NUMS table extracted from libbz2.
"""

import bz2 as stdlib_bz2
import shutil
import subprocess

import numpy as np
import pytest

from conftest import make_corpus

from bz2tpu.format import constants as C
from bz2tpu.format.bitio import BitWriter
from bz2tpu.format.crc32 import stream_crc
from bz2tpu.oracle import encoder as E
from bz2tpu.oracle.decoder import decompress as oracle_decompress
from bz2tpu.oracle.decoder import rand_fire_positions


def craft_randomised_stream(data: bytes, level: int = 1) -> bytes:
    """A valid single-block .bz2 stream for `data` with randomised=1."""
    arr = np.frombuffer(data, dtype=np.uint8)
    blocks = E.rle1_split(arr, level)
    assert len(blocks) == 1, "craft one-block inputs only"
    blk = blocks[0]
    payload = blk.data.copy()
    payload[rand_fire_positions(payload.size)] ^= 1  # pre-randomise
    last, orig_ptr = E.bwt_encode(payload)
    mtf = E.mtf_rle2_encode(last)
    plan = E.huffman_plan(mtf.symbols, mtf.freqs, mtf.alpha_size)
    w = BitWriter()
    w.write_bits(24, int.from_bytes(C.STREAM_MAGIC, "big"))
    w.write_bits(8, ord("0") + level)
    E.write_block(w, blk.crc, orig_ptr, mtf.used, mtf, plan, randomised=True)
    w.write_bits(48, C.STREAM_END_MARKER)
    w.write_bits(32, stream_crc([blk.crc]))
    w.pad_to_byte()
    return w.getvalue()


def test_fire_positions_prefix():
    # First reload is RAND_NUMS[0]=619: countdown reads 1 at byte 617;
    # second fire at 619+720-2.
    fires = rand_fire_positions(3000)
    assert fires[0] == C.RAND_NUMS[0] - 2 == 617
    assert fires[1] == C.RAND_NUMS[0] + C.RAND_NUMS[1] - 2
    assert rand_fire_positions(0).size == 0
    assert rand_fire_positions(617).size == 0
    assert rand_fire_positions(618).tolist() == [617]


@pytest.mark.parametrize("kind", ["text", "runs", "random"])
def test_randomised_block_decodes_everywhere(kind):
    rng = np.random.default_rng(hash(kind) % 2**32)
    data = bytes(make_corpus(rng, kind, 40_000))
    stream = craft_randomised_stream(data)

    # stdlib bz2 (libbz2) is the decisive oracle: it proves the crafted
    # stream is well-formed AND that RAND_NUMS + schedule match libbz2.
    assert stdlib_bz2.decompress(stream) == data

    # our three host-facing decoders
    assert oracle_decompress(stream) == data

    from bz2tpu import native

    if native.HAVE_NATIVE:
        assert native.decode_stream(stream, True) == data

    from bz2tpu.runtime.decompressor import decompress

    assert decompress(stream) == data


def test_randomised_block_system_binary():
    bzip2 = shutil.which("bzip2")
    if bzip2 is None:
        pytest.skip("no system bzip2")
    rng = np.random.default_rng(99)
    data = bytes(make_corpus(rng, "text", 30_000))
    stream = craft_randomised_stream(data)
    r = subprocess.run([bzip2, "-dc"], input=stream, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:500]
    assert r.stdout == data


def test_randomised_block_device_path_falls_back():
    # The device decoder routes randomised blocks to the host path and
    # still returns the right bytes.
    rng = np.random.default_rng(7)
    data = bytes(make_corpus(rng, "text", 20_000))
    stream = craft_randomised_stream(data)
    from bz2tpu.runtime.device_decode import decompress_device

    assert decompress_device(stream) == data


def test_randomised_crc_still_enforced():
    rng = np.random.default_rng(13)
    data = bytes(make_corpus(rng, "text", 20_000))
    stream = bytearray(craft_randomised_stream(data))
    stream[len(stream) // 2] ^= 0x10  # corrupt mid-data
    from bz2tpu.oracle.decoder import Bz2CrcError, Bz2FormatError

    with pytest.raises((Bz2CrcError, Bz2FormatError, OSError, EOFError)):
        oracle_decompress(bytes(stream))
