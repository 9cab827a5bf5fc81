"""Microprofile the single-bin device map step: which stage costs what.

Times partial pipelines (search / +locate / +dedup / full) on one bench-sized
chunk, on the real device. Run: python tools/profile_step.py
"""

from __future__ import annotations

import functools
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

    from bench import build_or_load_db, make_reads, BATCH, READ_LEN, ERROR_RATE
    from dream_yara_tpu.ops.backward_search import gather_hits, seed_search
    from dream_yara_tpu.ops.device_index import DeviceFM
    from dream_yara_tpu.pipeline.map_step import (
        dedup_compact, max_seed_len_static, seed_stop_depth,
        single_bin_map_step_packed, verify_candidates, use_pallas_default)
    from dream_yara_tpu.pipeline.seeding import make_seeds, rate_to_ppm
    from dream_yara_tpu.ops.readpack import pack_blob_with_lengths, unpack_blob, unpack_reads

    store, fm = build_or_load_db()
    batch = make_reads(store, BATCH)
    dev = DeviceFM.from_host(fm, store.text)
    rate_ppm = rate_to_ppm(ERROR_RATE)
    max_err = 3
    L = READ_LEN
    half = BATCH
    R2 = 2 * half
    max_slen = max_seed_len_static(L, rate_ppm)
    prefix_q = fm.prefix_q
    t_stop = seed_stop_depth(prefix_q)
    capacity = 4
    vcap = 4
    use_pallas = use_pallas_default()
    print(f"prefix_q={prefix_q} t_stop={t_stop} max_slen={max_slen} "
          f"sample_rate={fm.sample_rate} pallas={use_pallas}", file=sys.stderr)

    lens_c = batch.lengths.astype(np.int32)
    blob = jnp.asarray(pack_blob_with_lengths(batch.seqs[:half], lens_c, half, L))

    def stage_prep(fmd, blob):
        packed, nmask, lengths = unpack_blob(blob, half, L)
        reads = unpack_reads(packed, nmask, lengths, L)
        rows, starts, slens = make_seeds(lengths, R2, rate_ppm, max_err)
        slens_eff = jnp.minimum(slens, t_stop)
        starts_eff = starts + (slens - slens_eff)
        return reads, lengths, rows, starts_eff, slens_eff

    @jax.jit
    def p_unpack(fmd, blob):
        reads, lengths, rows, starts, slens = stage_prep(fmd, blob)
        return reads.sum(), rows.sum()

    @jax.jit
    def p_search(fmd, blob):
        reads, lengths, rows, starts, slens = stage_prep(fmd, blob)
        lo, hi, m_start = seed_search(fmd.bwt_blocks, fmd.occ, fmd.counts, fmd.n,
                             reads, rows, starts, slens, min(max_slen, t_stop),
                             pfx_lo=fmd.pfx_lo, pfx_hi=fmd.pfx_hi,
                             prefix_q=prefix_q, fused=fmd.fused)
        return lo.sum(), hi.sum()

    @jax.jit
    def p_locate(fmd, blob):
        reads, lengths, rows, starts, slens = stage_prep(fmd, blob)
        lo, hi, m_start = seed_search(fmd.bwt_blocks, fmd.occ, fmd.counts, fmd.n,
                             reads, rows, starts, slens, min(max_slen, t_stop),
                             pfx_lo=fmd.pfx_lo, pfx_hi=fmd.pfx_hi,
                             prefix_q=prefix_q, fused=fmd.fused)
        pos, hmask, ovf = gather_hits(fmd.sa, lo, hi, capacity)
        return pos.sum(), hmask.sum()

    @jax.jit
    def p_dedup(fmd, blob):
        reads, lengths, rows, starts, slens = stage_prep(fmd, blob)
        lo, hi, m_start = seed_search(fmd.bwt_blocks, fmd.occ, fmd.counts, fmd.n,
                             reads, rows, starts, slens, min(max_slen, t_stop),
                             pfx_lo=fmd.pfx_lo, pfx_hi=fmd.pfx_hi,
                             prefix_q=prefix_q, fused=fmd.fused)
        pos, hmask, ovf = gather_hits(fmd.sa, lo, hi, capacity)
        ns = max_err + 1
        A = (pos - starts[:, None]).reshape(R2, ns * capacity)
        V = hmask.reshape(R2, ns * capacity)
        row_ids = jnp.arange(R2, dtype=jnp.int32)
        vrow, vanch, keep, n_spilled = dedup_compact(A, V, row_ids, vcap)
        return vrow.sum(), vanch.sum(), keep.sum()

    @jax.jit
    def p_compact(fmd, blob):
        from dream_yara_tpu.pipeline.map_step import global_compact, pairwise_dedup
        reads, lengths, rows, starts, slens = stage_prep(fmd, blob)
        lo, hi, m_start = seed_search(fmd.bwt_blocks, fmd.occ, fmd.counts, fmd.n,
                             reads, rows, starts, slens, min(max_slen, t_stop),
                             pfx_lo=fmd.pfx_lo, pfx_hi=fmd.pfx_hi,
                             prefix_q=prefix_q, fused=fmd.fused)
        pos, hmask, ovf = gather_hits(fmd.sa, lo, hi, capacity)
        ns = max_err + 1
        A = (pos - starts[:, None]).reshape(R2, ns * capacity)
        V = hmask.reshape(R2, ns * capacity)
        row_ids = jnp.arange(R2, dtype=jnp.int32)
        keep2 = pairwise_dedup(A, V)
        vrow, vanch, kk, n_sp = global_compact(A, keep2, row_ids, R2)
        return vrow.sum(), vanch.sum(), kk.sum()

    @jax.jit
    def p_full(fmd, blob):
        reads, lengths, rows, starts, slens = stage_prep(fmd, blob)
        lo, hi, m_start = seed_search(fmd.bwt_blocks, fmd.occ, fmd.counts, fmd.n,
                             reads, rows, starts, slens, min(max_slen, t_stop),
                             pfx_lo=fmd.pfx_lo, pfx_hi=fmd.pfx_hi,
                             prefix_q=prefix_q, fused=fmd.fused)
        pos, hmask, ovf = gather_hits(fmd.sa, lo, hi, capacity)
        ns = max_err + 1
        A = (pos - starts[:, None]).reshape(R2, ns * capacity)
        V = hmask.reshape(R2, ns * capacity)
        row_ids = jnp.arange(R2, dtype=jnp.int32)
        from dream_yara_tpu.pipeline.map_step import global_compact, pairwise_dedup
        keep2 = pairwise_dedup(A, V)
        vrow, vanch, keep, n_spilled = global_compact(A, keep2, row_ids, R2)
        dist, beg, end, ok = verify_candidates(
            dev, reads, lengths, vrow, vanch, keep, rate_ppm, max_err,
            use_pallas=use_pallas)
        return dist.sum(), beg.sum(), ok.sum()

    def _sync(out):
        # block_until_ready does not reliably block through the axon tunnel;
        # fetching one element of every output does
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.ravel()[:1] if getattr(leaf, "ndim", 0) else leaf)

    stages = [("unpack+seeds", p_unpack), ("+search", p_search),
              ("+locate", p_locate), ("+dedup", p_dedup),
              ("+compact", p_compact), ("+verify", p_full)]
    for name, f in stages:
        t0 = time.time()
        _sync(f(dev, blob))
        compile_t = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            _sync(f(dev, blob))
            ts.append(time.time() - t0)
        print(f"{name:14s} compile {compile_t:7.1f}s   run {min(ts)*1e3:8.1f}ms"
              f" (all {[f'{t*1e3:.0f}' for t in ts]})")

    # and the production step incl. bundle + fetch
    from dream_yara_tpu.pipeline.map_step import single_bin_map_step_packed
    kw = dict(rate_ppm=rate_ppm, max_errors=max_err, capacity=capacity,
              max_slen=max_slen, compact_cap=R2, prefix_q=prefix_q,
              use_pallas=use_pallas, sample_rate=fm.sample_rate)
    out = single_bin_map_step_packed(dev, blob, half=half, L=L, **kw)
    jax.block_until_ready(out[0])
    ts, fs = [], []
    for _ in range(3):
        t0 = time.time()
        out = single_bin_map_step_packed(dev, blob, half=half, L=L, **kw)
        jax.block_until_ready(out[0])
        ts.append(time.time() - t0)
        t0 = time.time()
        b = np.asarray(out[0])
        fs.append(time.time() - t0)
    print(f"{'prod step':14s} run {min(ts)*1e3:8.1f}ms   fetch {min(fs)*1e3:8.1f}ms"
          f" ({b.nbytes/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
