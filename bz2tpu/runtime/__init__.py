"""Stream orchestration: block scheduling, batched device encode, ordered
bit-aligned stitching, stream assembly — the reference's OutputStream /
InputStream layer (include/OutputStream.hpp, include/InputStream.hpp)
re-designed around packed bitstreams and batched XLA dispatch.
"""

from bz2tpu.runtime.compressor import compress  # noqa: F401
from bz2tpu.runtime.decompressor import decompress  # noqa: F401
