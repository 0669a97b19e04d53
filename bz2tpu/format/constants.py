"""bzip2 bitstream format constants.

Parity note: the reference centralizes format constants in
include/Config.hpp:27-47 but deliberately downscales the block size
(BLOCKSIZE_DEFAULT = 10000, Config.hpp:30) so "level 1-9" means 10-90 kB
blocks. This framework targets the *standard* bzip2 format: level N means
N * 100_000 byte blocks, so our output interoperates with stock bzip2 in both
directions (the reference's decoder rejects real 100k-scale blocks,
include/BlockDecompressor.hpp:213-215).
"""

# --- Stream container markers (Config.hpp:33-37 equivalents) ---
STREAM_MAGIC = b"BZh"  # followed by ASCII '1'..'9' level digit
BLOCK_HEADER_MARKER = 0x314159265359  # 48 bits, "pi"
STREAM_END_MARKER = 0x177245385090  # 48 bits, "sqrt(pi)"

# --- Block sizing (standard bzip2, NOT the reference's 10k downscale) ---
BLOCK_SIZE_BASE = 100_000
MIN_LEVEL = 1
MAX_LEVEL = 9
DEFAULT_LEVEL = 9
# Stock bzip2 stops filling a block this many bytes before capacity so the
# in-flight RLE1 run can always be flushed (bzlib: nblockMAX = 100000*bs - 20).
BLOCK_CAPACITY_SLACK = 20


def block_capacity(level: int) -> int:
    """Maximum RLE1-encoded bytes stored in one block at this level."""
    if not MIN_LEVEL <= level <= MAX_LEVEL:
        raise ValueError(f"block size level must be 1..9, got {level}")
    return BLOCK_SIZE_BASE * level - BLOCK_CAPACITY_SLACK


# --- Huffman coding limits (Config.hpp:39-46 equivalents, at standard scale) ---
HUFFMAN_MIN_TABLES = 2
HUFFMAN_MAX_TABLES = 6
HUFFMAN_GROUP_SIZE = 50
# Standard scale: 2 + 900000/50 (the reference scales this down to 1801,
# Config.hpp:41, which is why it can't decode stock bzip2 streams).
HUFFMAN_MAX_SELECTORS = 2 + (BLOCK_SIZE_BASE * MAX_LEVEL) // HUFFMAN_GROUP_SIZE
HUFFMAN_MAX_ALPHABET = 258  # 256 byte values + RUNA/RUNB share space with EOB
HUFFMAN_ENCODE_MAX_LENGTH = 17  # stock bzip2 encoder cap (1.0.x)
HUFFMAN_DECODE_MAX_LENGTH = 23  # decoder table size; lengths 1..20 accepted
HUFFMAN_DECODE_MAX_ACCEPTED_LENGTH = 20

# Number of group->table assignment refinement passes (stock BZ_N_ITERS).
HUFFMAN_REFINE_ITERS = 4

# --- RLE2 run symbols ---
RUNA = 0
RUNB = 1

# --- RLE1 (first stage) ---
RLE1_MIN_RUN = 4  # runs of 4..255 become 4 literals + count byte
RLE1_MAX_RUN = 255 + RLE1_MIN_RUN  # a single count byte covers up to 255 extra


# Symbol-count thresholds for 3, 4, 5, 6 Huffman tables (below the first:
# 2 tables). Stock bzip2 / reference selectTableCount, kernel.cpp:2808-2818.
# The JAX form (bz2tpu.ops.huffman.table_count) derives from this tuple too.
TABLE_COUNT_THRESHOLDS = (200, 600, 1200, 2400)


def table_count_for_symbols(n_symbols: int) -> int:
    """Number of Huffman tables for a block with n_symbols MTF/RLE2 symbols."""
    return HUFFMAN_MIN_TABLES + sum(n_symbols >= t for t in TABLE_COUNT_THRESHOLDS)
