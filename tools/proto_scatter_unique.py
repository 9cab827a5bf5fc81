"""Isolate the global_compact scatter cost at config-2 shapes (ROADMAP r3
item 6, localized by tools/profile_flat_step.py sub-stage stops to the
scatter: +cumsum 1780ms -> +scatter 3444ms).

Hypothesis: `buf.at[dst].set(ra)` with every dropped lane colliding on the
dump slot (dst == cap2) forces XLA's non-unique-indices scatter path over
25M lanes; sending drops OUT OF BOUNDS with mode='drop' leaves the
in-bounds indices unique so unique_indices=True can use the fast path.

Run: python tools/proto_scatter_unique.py
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

    LANES = 25_000_000
    CAP = 625_000
    rng = np.random.default_rng(0)
    keep_np = rng.random(LANES) < (CAP * 0.8 / LANES)
    keep = jnp.asarray(keep_np)
    rowv = jnp.asarray(rng.integers(0, 1 << 20, LANES).astype(np.int32))
    anch = jnp.asarray(rng.integers(0, 1 << 22, LANES).astype(np.int32))

    def compact_dump(keep, rowv, anch):
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep & (pos < CAP), pos, CAP)
        ra = jnp.stack([jnp.where(keep, rowv, 0), anch], axis=1)
        buf = jnp.zeros((CAP + 1, 2), jnp.int32).at[dst].set(ra)
        return buf[:CAP]

    def compact_drop(keep, rowv, anch):
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep & (pos < CAP), pos, CAP)  # CAP = out of bounds
        ra = jnp.stack([jnp.where(keep, rowv, 0), anch], axis=1)
        buf = jnp.zeros((CAP, 2), jnp.int32).at[dst].set(
            ra, mode="drop", unique_indices=True)
        return buf

    print("[scatter] devices:", jax.devices())
    for name, fn in (("dump-slot (non-unique)", compact_dump),
                     ("oob-drop (unique)", compact_drop)):
        f = jax.jit(fn)
        r = f(keep, rowv, anch)
        _ = np.asarray(jnp.sum(r[:1]))      # force through the tunnel
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = f(keep, rowv, anch)
            _ = np.asarray(jnp.sum(r[:1]))
            ts.append(time.time() - t0)
        print(f"[scatter] {name}: median {sorted(ts)[2]*1e3:8.1f} ms")

    a = np.asarray(jax.jit(compact_dump)(keep, rowv, anch))
    b = np.asarray(jax.jit(compact_drop)(keep, rowv, anch))
    print("[scatter] results equal:", bool((a == b).all()))


if __name__ == "__main__":
    main()
