"""Microbench: 1-D 25M-element cumsum vs hierarchical 2-D prefix on TPU.

global_compact/slot_pool both cumsum over R*slots flat lanes; the flat-step
stage profile attributes ~1.7s to the compact stage while the ops measure
~free when hoisted — suspect the 1-D cumsum lowering. Varying input inside
the chain prevents loop-invariant hoisting this time.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = 25_000_000
    C = 4096
    M = (N + C - 1) // C
    PAD = M * C - N
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 2, N), jnp.int32)

    def cs_flat(x):
        return jnp.cumsum(x)

    def cs_hier(x):
        x2 = jnp.pad(x, (0, PAD)).reshape(M, C)
        within = jnp.cumsum(x2, axis=1)
        rows = jnp.concatenate([jnp.zeros(1, x.dtype),
                                jnp.cumsum(within[:, -1])[:-1]])
        return (within + rows[:, None]).reshape(-1)[:N]

    # sanity: equal results
    a = np.asarray(cs_flat(x0)); b = np.asarray(cs_hier(x0))
    assert np.array_equal(a, b)
    print("[cs] hier == flat: True", file=sys.stderr)

    def chain(fn, reps):
        @jax.jit
        def run(x):
            def body(i, acc):
                y = fn(x ^ (acc & 1))
                return acc + y[-1] + y[0]
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return run

    def timed(label, fn):
        f1, f5 = chain(fn, 1), chain(fn, 5)
        _ = np.asarray(f1(x0)); _ = np.asarray(f5(x0))
        ts = []
        for _i in range(3):
            t0 = time.time(); _ = np.asarray(f1(x0))
            t1 = time.time(); _ = np.asarray(f5(x0))
            t2 = time.time()
            ts.append((t1 - t0, t2 - t1))
        d1 = sorted(t for t, _ in ts)[1]
        d5 = sorted(t for _, t in ts)[1]
        print(f"[cs] {label}: {(d5-d1)/4*1e3:8.1f} ms/iter "
              f"(1rep {d1*1e3:.0f}ms 5rep {d5*1e3:.0f}ms)", file=sys.stderr)

    timed("cumsum 1-D 25M ", cs_flat)
    timed("cumsum hier 2-D", cs_hier)


if __name__ == "__main__":
    main()
