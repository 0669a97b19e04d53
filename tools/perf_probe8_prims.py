"""Round-3 primitive cost table on the compress working shape (8, 900k).

Times each backend primitive the pipeline leans on, same harness,
back-to-back: elementwise, cummax, 1/2/3-operand sort, random gather,
scatter-set (inverse permutation), scatter-add histogram (256 bins),
and the sort+searchsorted histogram alternative. Decides whether the
MTF/emit histograms should follow the scatter->sort rewrite and gives
PERF.md the per-primitive floor table.

Writes JSONL to tools/probe8_out.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe8_out.jsonl")


def main() -> int:
    from bz2tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    def rec(name, **kw):
        row = {"probe": name, **kw}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    rec("start", t=time.time())

    n = 900_000
    rng = np.random.default_rng(0)
    vals = jax.device_put(jnp.asarray(rng.integers(0, 256, (8, n)), jnp.int32))
    perm = np.stack([rng.permutation(n) for _ in range(8)]).astype(np.int32)
    permd = jax.device_put(jnp.asarray(perm))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a if a.ndim == 0 else a.reshape(-1)[:4]), out)
        for rep in range(3):
            t0 = time.time()
            out = f(*args)
            jax.tree_util.tree_map(
                lambda a: np.asarray(a if a.ndim == 0 else a.reshape(-1)[:4]), out
            )
            rec(f"{name}_{rep}", wall=time.time() - t0)

    timeit("elementwise", lambda a: a + 1, vals)
    timeit("cummax_ax1", lambda a: lax.cummax(a, axis=1), vals)
    timeit("sort1", lambda a: lax.sort((a,), num_keys=1)[0], vals)
    timeit(
        "sort2",
        lambda a, b: lax.sort((a, b), num_keys=1),
        vals, permd,
    )
    timeit(
        "sort3",
        lambda a, b: lax.sort((a, b, b), num_keys=2),
        vals, permd,
    )
    timeit(
        "gather_rand",
        lambda a, p: jax.vmap(lambda v, i: v[i])(a, p),
        vals, permd,
    )
    timeit(
        "scatter_set_invperm",
        lambda a, p: jax.vmap(lambda v, i: jnp.zeros(n, jnp.int32).at[i].set(v))(a, p),
        vals, permd,
    )
    timeit(
        "scatter_add_hist256",
        lambda a: jax.vmap(lambda v: jnp.zeros(256, jnp.int32).at[v].add(1))(a),
        vals,
    )

    def hist_by_sort(a):
        s = lax.sort((a,), num_keys=1)[0]
        edges = jnp.arange(257, dtype=jnp.int32)
        cuts = jax.vmap(lambda row: jnp.searchsorted(row, edges, side="left"))(s)
        return cuts[:, 1:] - cuts[:, :-1]

    timeit("hist_by_sort256", hist_by_sort, vals)

    # Validate the two histograms agree.
    import numpy as _np

    h1 = _np.asarray(
        jax.jit(lambda a: jax.vmap(lambda v: jnp.zeros(256, jnp.int32).at[v].add(1))(a))(vals)
    )
    h2 = _np.asarray(jax.jit(hist_by_sort)(vals))
    rec("hist_agree", ok=bool(_np.array_equal(h1, h2)))

    rec("done", t=time.time())
    return 0


if __name__ == "__main__":
    sys.exit(main())
