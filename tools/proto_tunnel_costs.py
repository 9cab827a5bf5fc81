"""Tunnel transfer cost model + remaining op rates (round-2 continuation).

Measures, on the real chip through the axon tunnel:
  * d2h fetch wall time vs payload size (fixed latency + per-byte rate)
  * h2d upload wall time vs payload size
  * int32 flat gather rate (SA expansion pattern), K-slope method
  * 2-column row scatter vs 2 separate scatters (compaction pattern)

Run: python tools/proto_tunnel_costs.py
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
    dev = jax.devices()[0]
    print(f"[tunnel] platform={dev.platform}", file=sys.stderr)

    # --- d2h: fetch arrays of growing size -------------------------------
    add1 = jax.jit(lambda x: x + 1)
    for mb in (0.001, 0.25, 1.0, 4.0):
        n = int(mb * (1 << 20) // 4)
        x = add1(jnp.zeros(n, jnp.int32))
        np.asarray(x)
        ts = []
        for _ in range(5):
            x = add1(x)
            t0 = time.time()
            _ = np.asarray(x)
            ts.append(time.time() - t0)
        t = sorted(ts)[2]
        print(f"[tunnel] d2h {mb:5.2f} MB: {t*1e3:7.1f} ms "
              f"({mb/t:6.1f} MB/s)", file=sys.stderr)

    # --- h2d: upload + force materialization ------------------------------
    for mb in (0.001, 0.25, 1.0, 4.0):
        n = int(mb * (1 << 20) // 4)
        h = np.zeros(n, np.int32)
        np.asarray(add1(jnp.asarray(h)))   # warm path
        ts = []
        for _ in range(5):
            h += 1
            t0 = time.time()
            _ = np.asarray(jnp.sum(add1(jnp.asarray(h))))
            ts.append(time.time() - t0)
        t = sorted(ts)[2]
        print(f"[tunnel] h2d+sum {mb:5.2f} MB: {t*1e3:7.1f} ms "
              f"({mb/t:6.1f} MB/s)", file=sys.stderr)

    # --- int32 flat gather (SA pattern), K-slope --------------------------
    Q = 1 << 20
    nsa = 4_600_000
    rng = np.random.default_rng(0)
    sa = jnp.asarray(rng.permutation(nsa).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, nsa, size=Q).astype(np.int32))

    def chain_sa(k, s, i0):
        def body(_, i):
            return jnp.take(s, i) % nsa
        return jax.lax.fori_loop(0, k, body, i0)

    def timed(fn, k, *args):
        f = jax.jit(fn, static_argnums=0)
        _ = np.asarray(jnp.sum(f(k, *args)))
        ts = []
        for _ in range(5):
            t0 = time.time()
            _ = np.asarray(jnp.sum(f(k, *args)))
            ts.append(time.time() - t0)
        return sorted(ts)[2]

    t1, t2 = timed(chain_sa, 8, sa, idx), timed(chain_sa, 32, sa, idx)
    rate = Q * 24 / (t2 - t1) / 1e6
    print(f"[tunnel] int32 flat gather: {rate:7.1f} M idx/s", file=sys.stderr)

    # --- scatter: 2 separate vs 1 two-column ------------------------------
    cap = 1 << 17

    def scat2(k, i0, a, b):
        def body(_, carry):
            i, o1, o2 = carry
            o1 = o1.at[i].set(a)
            o2 = o2.at[i].set(b)
            return ((i * 5 + 1) % cap, o1, o2)
        _, o1, o2 = jax.lax.fori_loop(
            0, k, body, (i0, jnp.zeros(cap, jnp.int32),
                         jnp.zeros(cap, jnp.int32)))
        return o1 + o2

    def scat_row(k, i0, ab):
        def body(_, carry):
            i, o = carry
            o = o.at[i].set(ab)
            return ((i * 5 + 1) % cap, o)
        _, o = jax.lax.fori_loop(
            0, k, body, (i0, jnp.zeros((cap, 2), jnp.int32)))
        return o[:, 0] + o[:, 1]

    Qs = 1 << 20
    i0 = jnp.asarray(rng.integers(0, cap, size=Qs).astype(np.int32))
    a = jnp.asarray(rng.integers(0, 100, size=Qs).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 100, size=Qs).astype(np.int32))
    ab = jnp.stack([a, b], axis=1)
    t1, t2 = timed(scat2, 8, i0, a, b), timed(scat2, 32, i0, a, b)
    print(f"[tunnel] scatter 2-sep : {Qs*24/(t2-t1)/1e6:7.1f} M idx/s",
          file=sys.stderr)
    t1, t2 = timed(scat_row, 8, i0, ab), timed(scat_row, 32, i0, ab)
    print(f"[tunnel] scatter 2-col : {Qs*24/(t2-t1)/1e6:7.1f} M idx/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
