"""Decoder robustness fuzzing: corrupted and random streams must raise
clean ValueError-family errors — never crash, hang, or return garbage
silently. Exercises both the native C core and the NumPy fallback."""

import bz2 as stdlib_bz2

import numpy as np
import pytest

from bz2tpu import native
from bz2tpu.oracle.decoder import Bz2FormatError, decompress as np_decompress
from bz2tpu.runtime.decompressor import decompress

from conftest import make_corpus


def _decoders():
    out = [("numpy", lambda d: np_decompress(d))]
    if native.HAVE_NATIVE:
        out.append(("native", lambda d: native.decode_stream(d)))
    return out


@pytest.mark.parametrize("name,dec", _decoders())
def test_bitflip_fuzz(rng, name, dec):
    data = make_corpus(rng, "text", 60_000)
    comp = stdlib_bz2.compress(data, 1)
    for trial in range(120):
        buf = bytearray(comp)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(4, len(buf)))] ^= 1 << int(rng.integers(8))
        try:
            out = dec(bytes(buf))
            # Undetected corruption must at least produce *some* bytes; a
            # flip that leaves the stream fully valid is possible but the
            # CRC makes silent wrong output astronomically unlikely.
            assert isinstance(out, bytes)
        except ValueError:
            pass  # clean rejection is the expected outcome


@pytest.mark.parametrize("name,dec", _decoders())
def test_random_garbage(rng, name, dec):
    for size in (0, 1, 4, 14, 100, 5000):
        blob = b"BZh1" + rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        with pytest.raises(ValueError):
            dec(blob)


@pytest.mark.parametrize("name,dec", _decoders())
def test_truncation_sweep(rng, name, dec):
    data = make_corpus(rng, "text", 30_000)
    comp = stdlib_bz2.compress(data, 1)
    for frac in (0.1, 0.3, 0.5, 0.9, 0.99):
        with pytest.raises(ValueError):
            dec(comp[: int(len(comp) * frac)])


def test_driver_rejects_garbage(rng):
    with pytest.raises((Bz2FormatError, ValueError)):
        decompress(b"not a bzip2 stream at all")


def test_parallel_decode_salvages_spurious_marker(rng):
    # A valid >=1MiB stream followed by junk containing the 48-bit block
    # marker: the optimistic scan finds a bogus header, but the chain walk
    # (blocks abut bit-exactly) never visits it — the parallel path decodes
    # the real data directly instead of paying the round-4-flagged O(2x)
    # restart (sequential parity: non-magic tail junk is ignorable).
    from bz2tpu.runtime.decompressor import _decompress_parallel

    data = make_corpus(rng, "text", 3_000_000)
    comp = stdlib_bz2.compress(data, 1)
    junk = comp + bytes.fromhex("314159265359") + b"\x00" * 6
    assert _decompress_parallel(junk, True) == data  # no fallback needed
    assert decompress(junk) == data
    # A member-like magic in the tail still defers to sequential (it owns
    # empty-member/truncation semantics).
    memberish = comp + b"BZh1" + bytes.fromhex("314159265359")
    assert _decompress_parallel(memberish, True) is None
    with pytest.raises(ValueError):
        decompress(memberish)


def test_stream_short_reads(rng):
    # file-likes may return short reads before EOF; no byte may be lost.
    import io

    import bz2 as stdlib
    from bz2tpu.runtime.stream import compress_stream

    class Dribble(io.RawIOBase):
        def __init__(self, data):
            self._d = data
            self._p = 0

        def read(self, n=-1):
            if self._p >= len(self._d):
                return b""
            step = min(1234, n if n > 0 else 1234)
            out = self._d[self._p : self._p + step]
            self._p += len(out)
            return out

    data = make_corpus(rng, "text", 300_000)
    sink = io.BytesIO()
    compress_stream(Dribble(data), sink, level=1, parallel=2, chunk_blocks=2)
    assert stdlib.decompress(sink.getvalue()) == data


def test_native_run_accumulator_bound():
    # Crafted stream with enough consecutive RUNA/RUNB symbols to overflow
    # a shifted 64-bit accumulator must be rejected, not silently decoded.
    from bz2tpu.format.bitio import BitWriter
    from bz2tpu.oracle.encoder import assign_canonical_codes, make_code_lengths

    if not native.HAVE_NATIVE:
        pytest.skip("native only")
    import numpy as np

    # Build a minimal hand-crafted block: 3-symbol alphabet {RUNA, RUNB, EOB}.
    freqs = np.array([100, 100, 1])
    lens = make_code_lengths(freqs)
    codes = assign_canonical_codes(lens)
    w = BitWriter()
    w.write_bits(24, int.from_bytes(b"BZh", "big"))
    w.write_bits(8, ord("1"))
    w.write_bits(48, 0x314159265359)
    w.write_bits(32, 0)  # crc (unchecked: verify=False below)
    w.write_bit(0)
    w.write_bits(24, 0)
    w.write_bits(16, 0x8000)  # range 0 used
    w.write_bits(16, 0x8000)  # byte 0 used -> n_in_use=1, alpha=3
    w.write_bits(3, 2)  # 2 tables
    w.write_bits(15, 2)  # 2 selectors
    w.write_unary(0)
    w.write_unary(0)
    for _ in range(2):  # both tables identical
        w.write_bits(5, int(lens[0]))
        cur = int(lens[0])
        for v in lens.tolist():
            while cur < v:
                w.write_bits(2, 2)
                cur += 1
            while cur > v:
                w.write_bits(2, 3)
                cur -= 1
            w.write_bit(0)
    for _ in range(70):  # 70 RUNA symbols: run ~ 2^70
        w.write_bits(int(lens[0]), int(codes[0]))
    w.write_bits(int(lens[2]), int(codes[2]))  # EOB
    w.write_bits(48, 0x177245385090)
    w.write_bits(32, 0)
    w.pad_to_byte()
    stream = w.getvalue()
    with pytest.raises(ValueError):
        native.decode_stream(stream, False)
    with pytest.raises(ValueError):
        np_decompress(stream, verify_crc=False)


def test_parallel_rejects_bad_magic(rng):
    from bz2tpu.runtime.decompressor import _decompress_parallel, decompress

    data = make_corpus(rng, "text", 2_000_000)
    comp = bytearray(stdlib_bz2.compress(data, 1))
    comp[0:3] = b"XXX"
    assert _decompress_parallel(bytes(comp), True) is None
    with pytest.raises(ValueError):
        decompress(bytes(comp))


def test_crc32_any_lane_count(rng):
    from bz2tpu.format.crc32 import crc32, crc32_serial

    data = make_corpus(rng, "random", 1000)
    want = crc32_serial(data)
    for lanes in (3, 5, 6, 7, 9, 12, 13, 64, 100, 256):
        assert crc32(data, lanes=lanes) == want, lanes


# ---------------------------------------------------------------------------
# stdlib-parity: trailing-data and truncation semantics (measured against
# CPython bz2.decompress; see native/_bz2dec.c stream loop comment).
# ---------------------------------------------------------------------------

_TAILS = [
    b"",  # clean stream
    b"B", b"BZ", b"BZh", b"BZh9",  # truncated magic prefixes -> must raise
    b"BX", b"BZx", b"BZh0",  # junk tails -> ignored
    b"hello junk here",  # junk tail -> ignored
    b"BZh9" + b"\xde\xad\xbe\xef" * 10,  # valid magic + junk -> ignored
]


@pytest.mark.parametrize("tail", _TAILS, ids=[repr(t)[:16] for t in _TAILS])
@pytest.mark.parametrize("name,dec", _decoders())
def test_stdlib_tail_parity(name, dec, tail):
    data = make_corpus(np.random.default_rng(7), "text", 20_000)
    comp = stdlib_bz2.compress(data, 1)
    try:
        want = stdlib_bz2.decompress(comp + tail)
    except ValueError:
        want = None
    if want is None:
        with pytest.raises(ValueError):
            dec(comp + tail)
    else:
        assert dec(comp + tail) == want


@pytest.mark.parametrize("name,dec", _decoders())
def test_truncated_second_member_raises(name, dec):
    # ADVICE r1 (medium): a cleanly-truncated trailing member must raise
    # like stdlib, not silently return only the first member.
    data = make_corpus(np.random.default_rng(8), "text", 20_000)
    comp = stdlib_bz2.compress(data, 1)
    for frac in (0.2, 0.5, 0.95):
        blob = comp + comp[: int(len(comp) * frac)]
        with pytest.raises(ValueError):
            stdlib_bz2.decompress(blob)
        with pytest.raises(ValueError):
            dec(blob)


def test_empty_input_stdlib_parity():
    assert stdlib_bz2.decompress(b"") == b""
    assert decompress(b"") == b""
    assert np_decompress(b"") == b""
    if native.HAVE_NATIVE:
        assert native.decode_stream(b"") == b""


@pytest.mark.parametrize("name,dec", _decoders())
def test_flipped_crc_detected(name, dec):
    # Strong CRC oracle: corrupt the stored block CRC (bits 80..112: after
    # the 4-byte magic + 6-byte block marker). The stream stays structurally
    # valid, so a decoder that ignored CRCs would "succeed" — verify_crc=True
    # must raise, verify_crc=False must return the original bytes.
    data = make_corpus(np.random.default_rng(9), "text", 20_000)
    comp = bytearray(stdlib_bz2.compress(data, 1))
    comp[10] ^= 0x40  # inside the stored block CRC field
    with pytest.raises(ValueError):
        dec(bytes(comp))
    if name == "native":
        assert native.decode_stream(bytes(comp), False) == data
    else:
        assert np_decompress(bytes(comp), verify_crc=False) == data


@pytest.mark.parametrize("name,dec", _decoders())
def test_selector_count_cap(name, dec):
    # Conformance: n_selectors is capped at 18002 (= 2 + 900000/50), the
    # standard-scale analog of reference include/BlockDecompressor.hpp:158-161.
    from bz2tpu.format.bitio import BitWriter

    w = BitWriter()
    w.write_bits(24, int.from_bytes(b"BZh", "big"))
    w.write_bits(8, ord("9"))
    w.write_bits(48, 0x314159265359)
    w.write_bits(32, 0)  # crc
    w.write_bit(0)
    w.write_bits(24, 0)
    w.write_bits(16, 0x8000)
    w.write_bits(16, 0x8000)
    w.write_bits(3, 2)  # 2 tables
    w.write_bits(15, 18003)  # over the cap
    for _ in range(64):
        w.write_bits(8, 0)  # would-be selector bits; must not be reached
    w.pad_to_byte()
    with pytest.raises(ValueError, match="selector"):
        dec(w.getvalue())


def test_device_decode_bitflip_fuzz():
    # The device decoder must behave like the host on corrupted streams:
    # raise, or fall back and produce the host's result — never return
    # silently wrong bytes.
    from bz2tpu.runtime.device_decode import decompress_device

    rng = np.random.default_rng(131)
    data = make_corpus(rng, "text", 120_000)
    comp = stdlib_bz2.compress(bytes(data), 1)
    for _ in range(25):
        buf = bytearray(comp)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(4, len(buf)))] ^= 1 << int(rng.integers(8))
        try:
            want = stdlib_bz2.decompress(bytes(buf))
        except (OSError, ValueError, EOFError):
            want = None
        try:
            got = decompress_device(bytes(buf))
        except ValueError:
            continue  # clean rejection
        if want is not None:
            assert got == want
