"""Checkpoint/resume API: a killed-and-resumed compression must produce a
byte-identical stream (SURVEY section 5, checkpoint/resume row)."""

import bz2 as stdlib_bz2
import io

import numpy as np
import pytest

from bz2tpu.runtime.stream import StreamCompressor, compress_stream

from conftest import make_corpus


def _one_shot(data: bytes, level: int, chunk_blocks: int = 2) -> bytes:
    sink = io.BytesIO()
    compress_stream(io.BytesIO(data), sink, level=level, chunk_blocks=chunk_blocks)
    return sink.getvalue()


@pytest.mark.parametrize("kind", ["text", "runs"])
def test_kill_and_resume_bit_identical(kind):
    rng = np.random.default_rng(81)
    data = make_corpus(rng, kind, 700_000)
    level = 1
    want = _one_shot(data, level)

    # Session 1: feed part of the input, checkpoint, then "crash".
    sink1 = io.BytesIO()
    sc = StreamCompressor(sink1, level=level, chunk_blocks=2)
    cut = 450_000
    sc.write(data[:cut])
    state = sc.checkpoint()
    emitted = sink1.getvalue()
    resume_from = sc.input_offset
    del sc  # never close()d: simulated kill

    # Session 2: truncate the sink to the checkpointed byte count, restore,
    # feed the rest.
    keep = StreamCompressor.state_sink_bytes(state)
    assert keep <= len(emitted)
    sink2 = io.BytesIO()
    sink2.write(emitted[:keep])
    sc2 = StreamCompressor(sink2, state=state)
    assert sc2.input_offset == resume_from == cut
    sc2.write(data[cut:])
    sc2.close()

    got = sink2.getvalue()
    assert got == want
    assert stdlib_bz2.decompress(got) == data


def test_checkpoint_every_write_still_identical():
    rng = np.random.default_rng(82)
    data = make_corpus(rng, "text", 500_000)
    want = _one_shot(data, 1)
    sink = io.BytesIO()
    sc = StreamCompressor(sink, level=1, chunk_blocks=2)
    state = None
    for off in range(0, len(data), 61_000):
        sc.write(data[off : off + 61_000])
        state = sc.checkpoint()  # state is cheap; take it every round
    # Resume from the FINAL checkpoint in a new object (full handoff).
    keep = StreamCompressor.state_sink_bytes(state)
    sink2 = io.BytesIO()
    sink2.write(sink.getvalue()[:keep])
    sc2 = StreamCompressor(sink2, state=state)
    assert sc2.input_offset == len(data)
    sc2.close()
    assert sink2.getvalue() == want


def test_compressible_input_makes_progress():
    # Zeros RLE1-encode ~51x smaller than raw: write() must not spin when a
    # threshold's worth of raw bytes yields less than one full block.
    sink = io.BytesIO()
    sc = StreamCompressor(sink, level=1, chunk_blocks=1)
    for _ in range(30):
        sc.write(b"\0" * 200_000)  # 6 MB total, RLE1 ~120 kB
    sc.close()
    assert stdlib_bz2.decompress(sink.getvalue()) == b"\0" * 6_000_000


def test_bad_checkpoint_version_rejected():
    import json

    state = json.dumps({"v": 999}).encode()
    with pytest.raises(ValueError, match="version"):
        StreamCompressor(io.BytesIO(), state=state)
