"""True TPU gather rate, measured ABOVE the ~25-30ms tunnel dispatch floor.

proto_pallas_rank.py timed single dispatches of 1M-index gathers (~35ms) —
that is mostly the fixed dispatch floor, not gather compute. Here a fori_loop
chains K dependent gather rounds inside ONE jitted program, so the floor
amortizes over K*Q indices and the slope gives the real per-index cost.

Also measures the same chained loop for:
  * row gather (nb, 24) int32   — the fused-rank table access pattern
  * flat int8 gather            — the read-matrix char access pattern
  * scatter-add                 — the compaction pattern

Run: python tools/proto_gather_rate.py [log2_Q [K]]
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

    log2_q = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    Q = 1 << log2_q
    nb = 36000
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 2**20, size=(nb, 24)).astype(np.int32))
    flat = jnp.asarray(rng.integers(0, 5, size=nb * 128).astype(np.int8))
    idx = jnp.asarray(rng.integers(0, nb, size=Q).astype(np.int32))

    def chain_rows(k, t, i0):
        def body(_, i):
            r = jnp.take(t, i, axis=0)          # (Q, 24)
            return (r[:, 0] + i) % nb           # dependent next index
        return jax.lax.fori_loop(0, k, body, i0)

    def chain_flat(k, f, i0):
        def body(_, i):
            v = jnp.take(f, i).astype(jnp.int32)
            return (v + i * 7 + 1) % (nb * 128)
        return jax.lax.fori_loop(0, k, body, i0 * 128 % (nb * 128))

    def chain_scatter(k, t, i0):
        def body(_, carry):
            i, acc = carry
            acc = acc.at[i].add(1)                  # (Q,) vector scatter
            return ((i * 5 + 1) % nb, acc)
        _, acc = jax.lax.fori_loop(0, k, body,
                                   (i0, jnp.zeros(nb, jnp.int32)))
        return acc

    def timed(fn, k, *args):
        """Median wall time of the full dispatch+compute+FETCH roundtrip.
        block_until_ready does not reliably block through the axon tunnel,
        so we force a (tiny) d2h fetch of a reduced scalar."""
        f = jax.jit(fn, static_argnums=0)
        _ = np.asarray(jnp.sum(f(k, *args)))   # warm/compile
        ts = []
        for _i in range(5):
            t0 = time.time()
            _ = np.asarray(jnp.sum(f(k, *args)))
            ts.append(time.time() - t0)
        return sorted(ts)[2]

    def bench(fn, *args, name):
        t1 = timed(fn, K // 4, *args)
        t2 = timed(fn, K, *args)
        slope = (t2 - t1) / (Q * (K - K // 4))      # s per index
        rate = 1.0 / slope / 1e6 if slope > 0 else float("inf")
        print(f"[rate] {name}: t({K//4})={t1*1e3:7.1f}ms t({K})={t2*1e3:7.1f}ms"
              f"  -> {rate:7.1f} M idx/s", file=sys.stderr)

    print(f"[rate] platform={jax.devices()[0].platform} Q={Q} K={K}",
          file=sys.stderr)
    bench(chain_rows, tab, idx, name="row24 gather ")
    bench(chain_flat, flat, idx, name="int8  gather ")
    bench(chain_scatter, tab[:, 0], idx, name="scatter-add  ")


if __name__ == "__main__":
    main()
