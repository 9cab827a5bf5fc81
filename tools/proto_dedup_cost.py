"""Microbench: pairwise_dedup vs global_compact at config-2 flat-step shapes.

K-slope method (chained iterations inside one jit) so dispatch floor and
transfer cost drop out; run on the real chip.
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

    from dream_yara_tpu.pipeline.map_step import global_compact, pairwise_dedup

    R, K = 625_000, 40
    cap2 = 625_000
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(0, 1 << 20, (R, K)), jnp.int32)
    V = jnp.asarray(rng.random((R, K)) < 0.3)
    row_ids = jnp.arange(R, dtype=jnp.int32)

    def chain(fn, reps):
        def run(a):
            def body(i, acc):
                out = fn(a + acc[:, None] % 3)
                return acc + out
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros(R, jnp.int32))
        return jax.jit(run)

    def timed(label, fn_reps1, fn_reps5):
        r1 = fn_reps1(A); _ = np.asarray(jnp.sum(r1[:1]))
        r5 = fn_reps5(A); _ = np.asarray(jnp.sum(r5[:1]))
        ts = []
        for _i in range(3):
            t0 = time.time(); _ = np.asarray(jnp.sum(fn_reps1(A)[:1]))
            t1 = time.time(); _ = np.asarray(jnp.sum(fn_reps5(A)[:1]))
            t2 = time.time()
            ts.append(((t1 - t0), (t2 - t1)))
        d1 = sorted(t for t, _ in ts)[1]
        d5 = sorted(t for _, t in ts)[1]
        per = (d5 - d1) / 4
        print(f"[dd] {label}: {per*1e3:8.1f} ms/iter  (1rep {d1*1e3:.0f}ms, "
              f"5rep {d5*1e3:.0f}ms)", file=sys.stderr)

    def dedup_only(a):
        return pairwise_dedup(a, V).sum(axis=1).astype(jnp.int32)

    def compact_only(a):
        vrow, vanch, keep2, ns = global_compact(a, V, row_ids, cap2)
        return (vrow + vanch).astype(jnp.int32)[:R] * 0 + ns

    def both(a):
        k2 = pairwise_dedup(a, V)
        vrow, vanch, keep2, ns = global_compact(a, k2, row_ids, cap2)
        return (vrow + vanch).astype(jnp.int32)[:R] * 0 + ns

    timed("pairwise_dedup ", chain(dedup_only, 1), chain(dedup_only, 5))
    timed("global_compact ", chain(compact_only, 1), chain(compact_only, 5))
    timed("dedup+compact  ", chain(both, 1), chain(both, 5))


if __name__ == "__main__":
    main()
