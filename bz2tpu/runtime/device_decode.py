"""Device decompression driver: Huffman + MTF + IBWT on the TPU.

The reference decompresses 100% on the host (reference
include/InputStream.hpp:51-95 — single thread, one byte per pull). This
driver moves the three expensive stages onto the device per block:

  host   native bit-scan finds block boundaries (the same scan the
         block-parallel host path uses) and parses each block's small
         header (symbol map, selectors, delta tables) with the BitReader;
  device speculative group-parallel Huffman decode (ops/huffman_dec.py)
         -> run expansion + inverse MTF (ops/mtf_dec.py)
         -> pointer-doubling inverse BWT (ops/ibwt.py);
  host   native single-pass inverse RLE1 + CRC (native/_bz2dec.c), CRC
         verification, ordered concatenation.

Every device result is validated exactly (fixpoint + EOB-at-end-bit +
block CRC); any block the device path cannot certify routes the whole
stream to the host decoder, so behavior is identical to
runtime/decompressor.decompress on all inputs.

Compile shapes are quantized (group count to a power of two, output
capacity per level) so a handful of XLA programs serve every stream.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from bz2tpu import native
from bz2tpu.format import constants as C
from bz2tpu.format.bitio import BitReader
from bz2tpu.format.crc32 import stream_crc_fold
from bz2tpu.ops.huffman_dec import decode_symbol_data, decode_tables_arrays
from bz2tpu.ops.ibwt import ibwt
from bz2tpu.ops.mtf_dec import mtf_rle2_decode
from bz2tpu.oracle import decoder as od
from bz2tpu.oracle.decoder import Bz2CrcError, Bz2FormatError


def _parse_block_header(stream: bytes, bit_off: int) -> dict:
    """Host-side parse of one block header starting at its 48-bit marker."""
    r = BitReader(stream)
    r._pos = bit_off
    if r.read_bits(48) != C.BLOCK_HEADER_MARKER:
        raise Bz2FormatError("bad block marker")
    crc = r.read_bits(32)
    if r.read_bit():
        raise Bz2FormatError("randomised blocks are not supported")
    orig_ptr = r.read_bits(24)
    used = od._read_symbol_map(r)
    used_bytes = np.flatnonzero(used)
    if used_bytes.size == 0:
        raise Bz2FormatError("empty symbol map")
    alpha = used_bytes.size + 2
    n_groups = r.read_bits(3)
    if not C.HUFFMAN_MIN_TABLES <= n_groups <= C.HUFFMAN_MAX_TABLES:
        raise Bz2FormatError(f"bad table count {n_groups}")
    n_sel = r.read_bits(15)
    if not 1 <= n_sel <= C.HUFFMAN_MAX_SELECTORS:
        raise Bz2FormatError(f"bad selector count {n_sel}")
    selectors = od._decode_selectors(r, n_groups, n_sel)
    lengths = od._read_tables(r, n_groups, alpha)
    tables = [od.build_decode_tables(lengths[t]) for t in range(n_groups)]
    return {
        "crc": crc,
        "orig_ptr": orig_ptr,
        "used_bytes": used_bytes,
        "alpha": alpha,
        "selectors": np.asarray(selectors, dtype=np.int32),
        "tables": tables,
        "data_start_bit": r.bit_position,
    }


@functools.partial(
    jax.jit, static_argnames=("max_groups", "m_sym", "out_cap", "n_bits_cap")
)
def _decode_block_jit(
    stream,
    start_bit,
    end_bit,
    selectors,
    n_groups,
    limit,
    base,
    perm,
    eob,
    init_list,
    orig_ptr,
    *,
    max_groups: int,
    m_sym: int,
    out_cap: int,
    n_bits_cap: int,
):
    hd = decode_symbol_data(
        stream, start_bit, end_bit, selectors, n_groups, limit, base, perm,
        eob, max_groups=max_groups, n_bits_cap=n_bits_cap,
    )
    syms = jnp.full((m_sym,), -1, jnp.int32).at[: max_groups * C.HUFFMAN_GROUP_SIZE].set(
        hd["symbols"]
    )
    md = mtf_rle2_decode(syms, hd["n_sym"], init_list, eob, out_capacity=out_cap)
    decoded = ibwt(md["bwt"], md["n_bwt"], orig_ptr)
    ok = hd["ok"] & md["ok"] & (orig_ptr < md["n_bwt"])
    return decoded, md["n_bwt"], ok


def _pow2_at_least(n: int, floor: int = 16) -> int:
    v = floor
    while v < n:
        v <<= 1
    return v


def decompress_device(stream: bytes, verify_crc: bool = True) -> bytes:
    """Decode a .bz2 stream with the device pipeline; host fallback on any
    stream the device path cannot certify (multi-member, spurious marker
    matches, pathological convergence)."""
    from bz2tpu.runtime.decompressor import decompress as _host_decompress

    stream = bytes(stream)
    out = _decompress_device_inner(stream, verify_crc)
    if out is None:
        return _host_decompress(stream, verify_crc=verify_crc)
    return out


def _decompress_device_inner(stream: bytes, verify_crc: bool) -> bytes | None:
    if not native.HAVE_NATIVE:
        return None
    if len(stream) < 4 or stream[:3] != b"BZh" or not (ord("1") <= stream[3] <= ord("9")):
        return None  # host path raises the proper error
    level = stream[3] - ord("0")
    headers, ends = native.scan_blocks(stream)
    if not headers or not ends or headers[0] != 32:
        return None
    # Single-member streams only: the final end marker must follow the last
    # header; anything else (concatenations, stray matches) -> host path.
    boundaries = headers[1:] + [ends[-1]]

    arr = np.frombuffer(stream, dtype=np.uint8)
    padded = np.zeros(_pow2_at_least(arr.size, 1 << 12), dtype=np.uint8)
    padded[: arr.size] = arr
    stream_dev = jax.device_put(jnp.asarray(padded))

    out_cap = _pow2_at_least(level * C.BLOCK_SIZE_BASE)
    pieces: list[bytes] = []
    s_crc = 0
    for i, start in enumerate(headers):
        try:
            hdr = _parse_block_header(stream, start)
        except (Bz2FormatError, EOFError):
            return None
        n_groups = hdr["selectors"].size
        gmax = _pow2_at_least(n_groups)
        m_sym = -(-gmax * C.HUFFMAN_GROUP_SIZE // 128) * 128
        sel = np.zeros(gmax, np.int32)
        sel[:n_groups] = hdr["selectors"]
        limit, base, perm = decode_tables_arrays(hdr["tables"])
        init_list = np.zeros(256, np.int32)
        init_list[: hdr["used_bytes"].size] = hdr["used_bytes"]
        n_bits = boundaries[i] - hdr["data_start_bit"]
        if n_bits <= 0:
            return None
        decoded, n_bwt, ok = _decode_block_jit(
            stream_dev,
            jnp.int32(hdr["data_start_bit"]),
            jnp.int32(boundaries[i]),
            jnp.asarray(sel),
            jnp.int32(n_groups),
            jnp.asarray(limit),
            jnp.asarray(base),
            jnp.asarray(perm),
            jnp.int32(hdr["alpha"] - 1),
            jnp.asarray(init_list),
            jnp.int32(hdr["orig_ptr"]),
            max_groups=gmax,
            m_sym=m_sym,
            out_cap=out_cap,
            n_bits_cap=_pow2_at_least(n_bits, 1 << 12),
        )
        if not bool(ok):
            return None
        n_bwt = int(n_bwt)
        # Fetch the walked bytes (pow2-quantized slice width: one transfer
        # program per octave, see runtime/compressor.py).
        width = _pow2_at_least(n_bwt, 1 << 10)
        walked = np.asarray(jax.device_get(decoded[:width]))[:n_bwt]
        data, crc = native.inverse_rle1(walked.tobytes())
        if verify_crc and crc != hdr["crc"]:
            raise Bz2CrcError(f"block CRC mismatch: {hdr['crc']:#x} != {crc:#x}")
        s_crc = stream_crc_fold(s_crc, hdr["crc"])
        pieces.append(data)
    # Stream CRC sits 48 bits past the final end marker.
    pos = ends[-1] + 48
    if pos + 32 > len(stream) * 8:
        return None
    r = BitReader(stream)
    r._pos = pos
    stored = r.read_bits(32)
    if verify_crc and stored != s_crc:
        # Could be a multi-member stream (per-member CRCs): host path
        # decides whether this is an error or a member boundary.
        return None
    return b"".join(pieces)
