"""Streaming compression: bounded memory for arbitrarily large inputs.

The reference streams by construction (128 KiB read chunks feeding a
round-robin of block compressors, reference app.cpp:105-116); its only
cross-batch state is the combined CRC and the sub-byte bit remainder
(include/OutputStream.hpp:202,225-239). This module carries exactly that
state — (stream_crc, carry bits, raw-byte leftover) — across device
batches, which is also the checkpoint/resume story (SURVEY section 5): a
stream can be suspended and resumed at any batch boundary by saving those
three values plus the input offset.
"""

from __future__ import annotations

import numpy as np

from bz2tpu.format import constants as C
from bz2tpu.format.bitio import BitWriter
from bz2tpu.format.crc32 import stream_crc_fold


class BitStitcher:
    """Incremental bit-aligned concatenation into a byte sink.

    Semantics of the reference's writeFileBytes + getLeftBuffer carry loop
    (include/BitOutputStream.hpp:47-99) as whole-array byte shifts: full
    bytes flush to the sink as they complete; <8 trailing bits carry.
    Appended buffers must be zero-padded past their bit length (BitWriter
    and the device packer both guarantee this).
    """

    def __init__(self, sink) -> None:
        self._sink = sink
        self._carry = 0  # top `carry_bits` bits of the next byte, at LSB
        self._carry_bits = 0
        self.bits_written = 0

    def append(self, data: np.ndarray, nbits: int) -> None:
        if nbits == 0:
            return
        data = np.asarray(data, dtype=np.uint8)[: (nbits + 7) >> 3]
        s = self._carry_bits
        if s == 0:
            shifted = data
        else:
            ext = np.concatenate([np.zeros(1, np.uint8), data])
            shifted = np.concatenate(
                [
                    (ext[:-1] << np.uint8(8 - s)) | (ext[1:] >> np.uint8(s)),
                    (ext[-1:] << np.uint8(8 - s)) & np.uint8(0xFF),
                ]
            )
            shifted = shifted.copy()
            shifted[0] |= np.uint8(self._carry << (8 - s))
        total = s + nbits
        full = total >> 3
        rem = total & 7
        if rem:
            byte = int(shifted[full]) if full < shifted.size else 0
            self._carry = byte >> (8 - rem)
        else:
            self._carry = 0
        self._carry_bits = rem
        self._sink.write(shifted[:full].tobytes())
        self.bits_written += nbits

    def finish(self) -> None:
        """Zero-pad to a byte boundary and flush (reference padding,
        include/BitOutputStream.hpp:129-135)."""
        if self._carry_bits:
            self._sink.write(bytes([(self._carry << (8 - self._carry_bits)) & 0xFF]))
            self.bits_written += 8 - self._carry_bits
            self._carry = 0
            self._carry_bits = 0


def compress_stream(
    reader,
    sink,
    level: int = C.DEFAULT_LEVEL,
    parallel: int | None = None,
    chunk_blocks: int | None = None,
    metrics=None,
) -> None:
    """Compress `reader` (binary file-like) into `sink` with bounded memory.

    Reads ~chunk_blocks blocks of raw input at a time, encodes full blocks
    on the device, and carries the partial trailing block's raw bytes into
    the next chunk.
    """
    from bz2tpu.runtime.compressor import (
        DEFAULT_BATCH,
        _block_header_bits,
        _encode_batches,
        split_blocks,
    )

    if not C.MIN_LEVEL <= level <= C.MAX_LEVEL:
        raise ValueError(f"block size level must be 1..9, got {level}")
    batch = parallel or DEFAULT_BATCH
    chunk_blocks = chunk_blocks or batch
    capacity = C.BLOCK_SIZE_BASE * level
    # RLE1 in the worst case expands 4 raw bytes to 5 output bytes; reading
    # capacity*chunk_blocks raw bytes guarantees >= chunk_blocks-1 full
    # blocks per round while bounding memory.
    read_size = capacity * chunk_blocks

    from contextlib import nullcontext

    stage = metrics.stage if metrics is not None else (lambda name: nullcontext())

    stitcher = BitStitcher(sink)
    head = BitWriter()
    head.write_bits(24, int.from_bytes(C.STREAM_MAGIC, "big"))
    head.write_bits(8, ord("0") + level)
    stitcher.append(np.frombuffer(head.getvalue(), np.uint8), head.bit_length)

    s_crc = 0
    n_blocks = 0
    n_batches = 0
    leftover = b""
    eof = False
    while not eof:
        # Accumulate a full chunk: file-likes may legally return short
        # reads before EOF (pipes, sockets); only b"" means end of input.
        pieces = []
        got = 0
        while got < read_size:
            piece = reader.read(read_size - got)
            if not piece:
                eof = True
                break
            pieces.append(piece)
            got += len(piece)
        chunk = b"".join(pieces)
        data = np.frombuffer(leftover + chunk, dtype=np.uint8)
        del chunk
        with stage("rle1_split"):
            blocks = split_blocks(data, level)
        if not eof and blocks:
            # Hold back the trailing (possibly partial) block's raw bytes.
            raw_consumed = sum(b.raw_length for b in blocks[:-1])
            leftover = data[raw_consumed:].tobytes()
            blocks = blocks[:-1]
        else:
            leftover = b""
        batches = _encode_batches(blocks, capacity, batch)
        for blk in blocks:
            with stage("device_encode"):
                out = next(batches)
            with stage("stitch"):
                hdr_bytes, hdr_bits = _block_header_bits(
                    blk.crc,
                    int(out["orig_ptr"]),
                    out["used"],
                    int(out["n_groups"]),
                    int(out["n_selectors"]),
                    out["selector_mtf"],
                    out["lengths"],
                    int(out["n_in_use"]),
                )
                stitcher.append(hdr_bytes, hdr_bits)
                stitcher.append(
                    out["words"].astype(">u4").view(np.uint8), int(out["total_bits"])
                )
            s_crc = stream_crc_fold(s_crc, blk.crc)
            n_blocks += 1
        n_batches += (len(blocks) + batch - 1) // batch

    tail = BitWriter()
    tail.write_bits(48, C.STREAM_END_MARKER)
    tail.write_bits(32, s_crc)
    stitcher.append(np.frombuffer(tail.getvalue(), np.uint8), tail.bit_length)
    stitcher.finish()
    if metrics is not None:
        metrics.blocks += n_blocks
        metrics.batches += n_batches
        metrics.level = level


def compress_file(
    in_path: str,
    out_path: str,
    level: int = C.DEFAULT_LEVEL,
    parallel: int | None = None,
    metrics=None,
) -> None:
    """Stream-compress a file; the output appears atomically (unique temp +
    rename), so a failure mid-run never leaves a truncated .bz2 behind and
    concurrent compressions to the same path cannot clobber each other."""
    from bz2tpu.utils.atomic import atomic_output

    with open(in_path, "rb") as fin, atomic_output(out_path) as fout:
        compress_stream(fin, fout, level=level, parallel=parallel, metrics=metrics)
