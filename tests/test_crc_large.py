"""crc32_ranges must stay exact for chunks beyond 32 MB.

Regression for the operator-ladder bound: the ladders are sized from the
static chunk size, so exponents (n - end, end - start) above 2^25 — which
a fixed 25-rung ladder silently truncated — are covered.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_crc32_ranges_beyond_32mb(rng):
    import jax.numpy as jnp

    from bz2tpu.format.crc32 import crc32
    from bz2tpu.ops.crc import crc32_ranges

    n = 1 << 26  # 64 MB: start/end offsets need ladder rungs past 2^25
    data = np.zeros(n, np.uint8)
    # Non-trivial content near the range edges (middle stays zero: fast to
    # generate, and zeros are exactly the case the ladder corrects for).
    edge = rng.integers(0, 256, 1 << 16, dtype=np.uint8)
    lo = 1000
    hi = n - 777  # range length > 2^25: needs ladder rungs past 25
    data[lo : lo + edge.size] = edge
    data[hi - edge.size : hi] = edge[::-1]

    got = crc32_ranges(
        jnp.asarray(data),
        jnp.asarray([lo], np.int32),
        jnp.asarray([hi], np.int32),
        lanes=1 << 15,
    )
    expected = crc32(data[lo:hi], lanes=1 << 12)
    assert int(got[0]) == expected
