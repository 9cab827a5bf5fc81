"""Dump optimized-HLO op statistics for the flat-step '+dedup' vs
'+compact' programs — the compact stage adds +1.68s at config-2 shapes
while every one of its ops is ~free in isolation (docs/ROADMAP.md item 6).
Comparing the optimized op mix (fusion kinds, gather/scatter counts, loop
shapes) between the two programs localizes what XLA restructures.

Run (needs the device for the remote compile): python tools/diag_compact_hlo.py
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def op_stats(hlo_text: str) -> collections.Counter:
    c = collections.Counter()
    for m in re.finditer(r"=\s+[\w\[\]{},/ ]*?\b(\w+)\(", hlo_text):
        c[m.group(1)] += 1
    return c


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from bench_config2 import build_or_load, make_pairs
    from dream_yara_tpu.ops.device_index import DeviceFMSet
    from dream_yara_tpu.ops.ibf_query import (classify_thresholds,
                                              ibf_bin_counts)
    from dream_yara_tpu.pipeline.flat_step import flat_map_step, slot_pool
    from dream_yara_tpu.pipeline.map_step import (max_seed_len_static,
                                                  uniform_len_ok)
    from dream_yara_tpu.pipeline.seeding import (max_errors_for_batch,
                                                 rate_to_ppm)
    from dream_yara_tpu.ops.readpack import (pack_blob_with_lengths,
                                             unpack_blob, unpack_reads)

    which_stages = (sys.argv[2].split(",") if len(sys.argv) > 2
                    else ["dedup", "compact"])
    n_pairs = (int(sys.argv[1]) if len(sys.argv) > 1 else 250_000) // 2
    genomes, index = build_or_load()
    rng = np.random.default_rng(7)
    batch = make_pairs(genomes, index.stores, n_pairs, rng)
    n, L = batch.n_reads, batch.max_len
    rate_ppm = rate_to_ppm(0.03)
    max_err = max(1, max_errors_for_batch(L, 0.03))
    max_slen = max_seed_len_static(L, rate_ppm)
    uniform = uniform_len_ok(batch.lengths, L, rate_ppm, max_err)
    B = index.n_bins
    fmset = DeviceFMSet.from_host(list(index.fms),
                                  [st.text for st in index.stores])
    filt = index.filter
    blocked = bool(getattr(filt, "blocked", 0))
    wd = filt.words.shape[1] if blocked else max(1, (B + 31) // 32)
    fw = jnp.asarray(np.asarray(filt.words)[:, :wd])
    k, nh, w = filt.k, filt.n_hashes, getattr(filt, "window", 0)
    half = n
    t_cap = max(256, 5 * half // 4)
    blob = jnp.asarray(pack_blob_with_lengths(batch.seqs[:n], batch.lengths,
                                              half, L))

    def stage(which):
        def fn(fmset_, fw_, blob_):
            packed, nmask, lengths = unpack_blob(blob_, half, L)
            reads = unpack_reads(packed, nmask, lengths, L)
            counts, n_sel = ibf_bin_counts(fw_, reads[:half], lengths, k,
                                           nh, w, canonical=True,
                                           blocked=blocked, n_bins=B)
            thr = classify_thresholds(lengths, n_sel, k, w, rate_ppm)
            cand = (counts >= thr[:, None])[:, :B]
            rs, bs, valid, _ = slot_pool(cand, t_cap)
            return flat_map_step(fmset_, reads, lengths, rs, bs, valid,
                                 half_loc=half, rate_ppm=rate_ppm,
                                 max_errors=max_err, capacity=8,
                                 max_slen=max_slen, prefix_q=fmset.prefix_q,
                                 compact_cap=2 * t_cap, uniform_len=uniform,
                                 stop_after=which)
        return fn

    stats = {}
    for which in which_stages:
        lowered = jax.jit(stage(which)).lower(fmset, fw, blob)
        compiled = lowered.compile()
        txt = compiled.as_text()
        stats[which] = op_stats(txt)
        Path(f"/tmp/hlo_{which}.txt").write_text(txt)
        print(f"[hlo] {which}: {len(txt)} chars, "
              f"{sum(stats[which].values())} ops -> /tmp/hlo_{which}.txt")

    d, c = stats[which_stages[0]], stats[which_stages[1]]
    keys = sorted(set(d) | set(c), key=lambda x: -(c.get(x, 0) - d.get(x, 0)))
    print(f"{'op':28s} {'dedup':>8s} {'compact':>8s} {'delta':>7s}")
    for x in keys:
        dd, cc = d.get(x, 0), c.get(x, 0)
        if dd != cc:
            print(f"{x:28s} {dd:8d} {cc:8d} {cc - dd:+7d}")


if __name__ == "__main__":
    main()
