"""Isolate config-3-scale stage costs inside ONE process (remote compile is
~15+ min per program through the axon tunnel and the persistent compile
cache does not engage there, so iterate in a single live session).

Times, each as its own small jitted program on the config-3 database
(64 x 32 Mbp, sampled SA rate 16, blocked canonical IBF):
  classify  — IBF bin counts + thresholds on a 250k-read blob
  search    — seed backward search (prefix jump + fused rank trips)
  locate    — sampled-SA fused locate on the search's real SA rows
  verify    — banded DP on the locate's real candidates

Run: python tools/profile_c3_stages.py [n_reads]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def timed(f, args, name, reps=3):
    import jax
    import jax.numpy as jnp

    tc0 = time.time()
    r = jax.tree.leaves(f(*args))[0]
    np.asarray(jnp.ravel(jnp.asarray(r, jnp.int32))[:1])
    print(f"[c3p] {name}: compile+1st {time.time() - tc0:.1f}s",
          file=sys.stderr, flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = jax.tree.leaves(f(*args))[0]
        np.asarray(jnp.ravel(jnp.asarray(r, jnp.int32))[:1])
        ts.append(time.time() - t0)
    print(f"[c3p] {name}: {sorted(ts)[len(ts) // 2] * 1e3:9.1f} ms",
          file=sys.stderr, flush=True)
    return f(*args)


def main():
    import jax
    import jax.numpy as jnp

    from bench_config3 import build_or_load, make_reads
    from dream_yara_tpu.ops.ibf_query import (classify_thresholds,
                                              ibf_bin_counts)
    from dream_yara_tpu.ops.readpack import (pack_blob_with_lengths,
                                             unpack_blob, unpack_fwd,
                                             unpack_reads)
    from dream_yara_tpu.parallel.dream_mesh import MeshDreamMapper
    from dream_yara_tpu.pipeline.flat_step import flat_map_step, slot_pool
    from dream_yara_tpu.pipeline.map_step import (max_seed_len_static,
                                                  uniform_len_ok)
    from dream_yara_tpu.pipeline.seeding import (max_errors_for_batch,
                                                 rate_to_ppm)
    from dream_yara_tpu.utils.options import MapperOptions

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    stores, fms, index = build_or_load()
    opts = MapperOptions(error_rate=0.03)
    mapper = MeshDreamMapper(index, opts, lean=True)
    fmset, fw = mapper.fmset, mapper.filter_words
    B, k, nh, w = mapper.B, mapper.k, mapper.n_hashes, mapper.window

    rng = np.random.default_rng(7)
    batch = make_reads(stores, n_reads, rng)
    n, L = batch.n_reads, batch.max_len
    rate_ppm = rate_to_ppm(0.03)
    max_err = max(1, max_errors_for_batch(L, 0.03))
    max_slen = max_seed_len_static(L, rate_ppm)
    uniform = uniform_len_ok(batch.lengths, L, rate_ppm, max_err)
    half = n
    t_cap = max(256, 5 * half // 4)
    cap2v = float(os.environ.get("DY_CAP2V", "1.25"))
    compact_cap = max(8, int(cap2v * t_cap))
    blob = jnp.asarray(pack_blob_with_lengths(batch.seqs[:n], batch.lengths,
                                              half, L))
    print(f"[c3p] n={n} L={L} max_err={max_err} t_cap={t_cap} "
          f"compact_cap={compact_cap} uniform={uniform} "
          f"sample_rate={mapper.sample_rate}", file=sys.stderr, flush=True)

    # ---- classify (canonical path: forward rows only) ----
    def f_classify(fw_, blob_):
        packed, nmask, lengths = unpack_blob(blob_, half, L)
        fwd = unpack_fwd(packed, nmask, lengths, L)
        counts, n_sel = ibf_bin_counts(fw_, fwd, lengths, k, nh, w,
                                       canonical=True, blocked=True,
                                       n_bins=B, block_s=mapper.block_s)
        thr = classify_thresholds(lengths, n_sel, k, w, rate_ppm)
        return (counts >= thr[:, None])[:, :B]

    cand = timed(jax.jit(f_classify), (fw, blob), "classify        ")

    # ---- slot pool ----
    def f_pool(fw_, blob_):
        return slot_pool(f_classify(fw_, blob_), t_cap)

    rs, bs, valid, _ovf = timed(jax.jit(f_pool), (fw, blob),
                                "classify+pool   ")

    # ---- staged flat steps (shared prep, own compiles) ----
    def staged(which):
        def fn(fmset_, fw_, blob_):
            packed, nmask, lengths = unpack_blob(blob_, half, L)
            reads = unpack_reads(packed, nmask, lengths, L)
            rs_, bs_, valid_, _ = f_pool(fw_, blob_)
            return flat_map_step(fmset_, reads, lengths, rs_, bs_, valid_,
                                 half_loc=half, rate_ppm=rate_ppm,
                                 max_errors=max_err, capacity=8,
                                 max_slen=max_slen,
                                 prefix_q=mapper.prefix_q,
                                 compact_cap=compact_cap,
                                 uniform_len=uniform,
                                 sample_rate=mapper.sample_rate,
                                 use_pallas=mapper.use_pallas,
                                 stop_after=which)
        return jax.jit(fn)

    stages = os.environ.get(
        "DY_C3P_STAGES", "search,locate,compact,").split(",")
    for st in stages:
        label = f"+{st:15s}" if st else "FULL (=+verify) "
        timed(staged(st or None), (fmset, fw, blob), label)


if __name__ == "__main__":
    main()
