"""Find a fast 25M-lane -> cap2 compaction for global_compact (ROADMAP r3
item 6). profile_flat_step sub-stage stops localized the +1.68s config-2
anomaly to the scatter; proto_scatter_unique (with forced transfers) shows
the (N,2)-update scatter costs 1.69s IN ISOLATION, while slot_pool's scalar
scatter at 2M lanes is ~free. Variants measured here:

  a) dump-slot (N,2) 2-col scatter           (current global_compact)
  b) two scalar (N,) scatters
  c) ONE scalar (N,) scatter of the lane id, then 2 gathers at src
  d) searchsorted (binary-search gather) — no scatter at all

Run: python tools/proto_compact_variants.py
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

    LANES = 25_000_000
    CAP = 625_000
    rng = np.random.default_rng(0)
    keep_np = rng.random(LANES) < (CAP * 0.8 / LANES)
    keep = jnp.asarray(keep_np)
    rowv = jnp.asarray(rng.integers(0, 1 << 20, LANES).astype(np.int32))
    anch = jnp.asarray(rng.integers(0, 1 << 22, LANES).astype(np.int32))

    from dream_yara_tpu.pipeline.map_step import flat_cumsum

    def a_dump2col(keep, rowv, anch):
        pos = flat_cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep & (pos < CAP), pos, CAP)
        ra = jnp.stack([jnp.where(keep, rowv, 0), anch], axis=1)
        buf = jnp.zeros((CAP + 1, 2), jnp.int32).at[dst].set(ra)
        return buf[:CAP, 0], buf[:CAP, 1]

    def b_two_scalar(keep, rowv, anch):
        pos = flat_cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep & (pos < CAP), pos, CAP)
        r = jnp.zeros(CAP + 1, jnp.int32).at[dst].set(
            jnp.where(keep, rowv, 0))[:CAP]
        a = jnp.zeros(CAP + 1, jnp.int32).at[dst].set(anch)[:CAP]
        return r, a

    def c_src_gather(keep, rowv, anch):
        pos = flat_cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep & (pos < CAP), pos, CAP)
        src = jnp.zeros(CAP + 1, jnp.int32).at[dst].set(
            jnp.arange(LANES, dtype=jnp.int32))[:CAP]
        return jnp.take(rowv, src), jnp.take(anch, src)

    def d_searchsorted(keep, rowv, anch):
        s = flat_cumsum(keep.astype(jnp.int32))          # inclusive counts
        q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
        src = jnp.searchsorted(s, q, side="left").astype(jnp.int32)
        src = jnp.minimum(src, LANES - 1)
        return jnp.take(rowv, src), jnp.take(anch, src)

    ref = None
    for name, fn in (("a dump 2-col ", a_dump2col),
                     ("b two scalar ", b_two_scalar),
                     ("c src+gather ", c_src_gather),
                     ("d searchsort ", d_searchsorted)):
        f = jax.jit(fn)
        r = f(keep, rowv, anch)
        _ = np.asarray(jnp.sum(r[0][:1]))
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = f(keep, rowv, anch)
            _ = np.asarray(jnp.sum(r[0][:1]) + jnp.sum(r[1][:1]))
            ts.append(time.time() - t0)
        rr = (np.asarray(r[0]), np.asarray(r[1]))
        n_kept = int(keep_np.sum())
        if ref is None:
            ref = rr
            ok = True
        else:
            ok = (bool((rr[0][:n_kept] == ref[0][:n_kept]).all())
                  and bool((rr[1][:n_kept] == ref[1][:n_kept]).all()))
        print(f"[cv] {name}: median {sorted(ts)[2]*1e3:8.1f} ms  equal={ok}")




def main2():
    """Row-structured variant: exploit keep being (R, 40) — scatter only row
    STARTS (<=R updates), prefix-max fill, within-row rank select."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    R, K = 625_000, 40
    CAP = 625_000
    LANES = R * K
    rng = np.random.default_rng(0)
    keep_np = (rng.random((R, K)) < (CAP * 0.8 / LANES))
    keep2 = jnp.asarray(keep_np)
    A = jnp.asarray(rng.integers(0, 1 << 22, (R, K)).astype(np.int32))
    row_ids = jnp.arange(R, dtype=jnp.int32)

    from dream_yara_tpu.pipeline.map_step import flat_cumsum, global_compact

    def e_rowstart(keep2, A):
        cnt = keep2.sum(axis=1, dtype=jnp.int32)            # (R,)
        incl = flat_cumsum(cnt)
        off = incl - cnt                                    # exclusive
        total = incl[-1]
        dst = jnp.where((cnt > 0) & (off < CAP), off, CAP)  # CAP = oob drop
        starts = jnp.zeros(CAP, jnp.int32).at[dst].set(
            row_ids, mode="drop", unique_indices=True)
        rowp = jax.lax.associative_scan(jnp.maximum, starts)  # prefix max
        j = jnp.arange(CAP, dtype=jnp.int32) - jnp.take(off, rowp)
        keepr = jnp.take(keep2, rowp, axis=0)               # (CAP, K)
        within = jnp.cumsum(keepr, axis=1, dtype=jnp.int32)
        hit = (within == (j[:, None] + 1)) & keepr
        slot = jnp.argmax(hit, axis=1).astype(jnp.int32)
        vanch = jnp.take_along_axis(jnp.take(A, rowp, axis=0),
                                    slot[:, None], axis=1)[:, 0]
        keep_out = jnp.arange(CAP, dtype=jnp.int32) < jnp.minimum(total, CAP)
        return (jnp.where(keep_out, rowp, 0),
                jnp.where(keep_out, vanch, 0), keep_out)

    def base(keep2, A):
        vrow, vanch, keep_out, _ = global_compact(A, keep2, row_ids, CAP)
        return (jnp.where(keep_out, vrow, 0),
                jnp.where(keep_out, vanch, 0), keep_out)

    ref = None
    for name, fn in (("base global_compact", base),
                     ("e row-start prefixmax", e_rowstart)):
        f = jax.jit(fn)
        r = f(keep2, A)
        _ = np.asarray(jnp.sum(r[0][:1]))
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = f(keep2, A)
            _ = np.asarray(jnp.sum(r[0][:1]) + jnp.sum(r[1][:1]))
            ts.append(time.time() - t0)
        rr = tuple(np.asarray(x) for x in r)
        if ref is None:
            ref = rr
            ok = True
        else:
            ok = all(bool((a == b).all()) for a, b in zip(rr, ref))
        print(f"[cv2] {name}: median {sorted(ts)[2]*1e3:8.1f} ms equal={ok}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "rows":
        main2()
        sys.exit(0)
    main()
