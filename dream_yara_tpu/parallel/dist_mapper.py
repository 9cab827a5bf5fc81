"""Mesh-sharded DREAM mapping step.

TPU-native replacement for the reference's process-level distribution
(SURVEY.md §2.10: the reference farms bins out at the file level and merges
SAM offline; here the bin axis is a first-class mesh axis). Device (i, j) of
the (data, bin) mesh maps read-shard i against bin-shard j — the mesh itself
realizes the read x bin cross product, so no all-to-all routing is needed for
the dense path; the IBF mask is applied as lane masking inside each shard
(capacity-compacted routing is a later optimization, SURVEY.md §7 step 7).

Outputs are fixed-shape match buffers sharded over both axes; the host
gathers them and applies the canonical deterministic sort (pipeline/matches),
so SAM output is byte-identical for ANY mesh shape (SURVEY.md §4.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.backward_search import gather_hits, seed_search
from ..ops.device_index import DeviceFMSet
from ..ops.verify import banded_verify
from ..pipeline.seeding import errors_for, make_seeds


class DistMapOut(NamedTuple):
    read_id: jnp.ndarray  # (B, C) int32 GLOBAL read id
    strand: jnp.ndarray   # (B, C) int8
    begin: jnp.ndarray    # (B, C) int32 GLOBAL coords (bin offset applied)
    end: jnp.ndarray      # (B, C) int32
    dist: jnp.ndarray     # (B, C) int32
    ok: jnp.ndarray       # (B, C) bool


def _map_one_bin(bwt, occ, counts, sa, text, n, bin_start, reads, lengths,
                 bin_active, pfx_lo, pfx_hi, *, rate_ppm, max_errors, capacity,
                 max_slen, prefix_q):
    """Local single-bin map (same stages as pipeline/map_step, shard-local)."""
    R2, L = reads.shape
    n_loc = lengths.shape[0]

    rows, starts, slens = make_seeds(lengths, R2, rate_ppm, max_errors)
    slens = jnp.where(bin_active, slens, 0)  # IBF says this bin is irrelevant
    # truncated search (see pipeline.map_step.seed_stop_depth)
    from ..pipeline.map_step import seed_stop_depth

    t_stop = seed_stop_depth(prefix_q)
    slens_eff = jnp.minimum(slens, t_stop)
    starts = starts + (slens - slens_eff)
    lo, hi, m_start = seed_search(bwt, occ, counts, n, reads, rows, starts,
                                  slens_eff, min(max_slen, t_stop),
                                  pfx_lo=pfx_lo, pfx_hi=pfx_hi,
                                  prefix_q=prefix_q)
    pos, hmask, _overflow = gather_hits(sa, lo, hi, capacity)

    anchors = (pos - m_start[:, None]).reshape(-1)
    crow = jnp.broadcast_to(rows[:, None], pos.shape).reshape(-1)
    valid = hmask.reshape(-1)

    key_row = jnp.where(valid, crow, R2)
    perm = jnp.lexsort((anchors, key_row))
    srow = key_row[perm]
    sanch = anchors[perm]
    svalid = valid[perm]
    prev_row = jnp.concatenate([jnp.array([-1], jnp.int32), srow[:-1]])
    prev_anch = jnp.concatenate(
        [jnp.array([jnp.iinfo(jnp.int32).min], jnp.int32), sanch[:-1]])
    keep = svalid & ~((srow == prev_row) & (sanch == prev_anch))

    vrow = jnp.where(keep, srow, 0)
    vanch = jnp.where(keep, sanch, 0)
    lrow = jnp.take(lengths, vrow % n_loc).astype(jnp.int32)
    dist, beg, end = banded_verify(text, vanch, reads, vrow, lrow,
                                   max_err=max_errors)
    budget = errors_for(lrow, rate_ppm)
    ok = keep & (dist <= budget) & (beg >= 0) & (end <= n)
    return (vrow % n_loc, (vrow // n_loc).astype(jnp.int8),
            beg + bin_start, end + bin_start, dist, ok)


def build_dist_map_step(mesh: Mesh, *, rate_ppm: int, max_errors: int,
                        capacity: int, max_slen: int, prefix_q: int = 0):
    """Returns a jitted sharded step:
    (fmset, bin_starts, reads, lengths, routing) -> DistMapOut.

    fmset: DeviceFMSet stacked arrays, axis 0 sharded over 'bin';
    reads (R2, L) / lengths (n,) sharded over 'data' (rows [0,n) fwd, [n,2n) rc);
    routing (n, B) bool (IBF candidates), sharded over ('data', 'bin').
    """

    def local_step(fmset: DeviceFMSet, bin_starts, reads, lengths, routing):
        B_loc = fmset.bwt_blocks.shape[0]
        n_loc = lengths.shape[0]
        data_idx = jax.lax.axis_index("data")
        outs = []
        for b in range(B_loc):
            active_reads = routing[:, b]                       # (n_loc,)
            ns = max_errors + 1
            # per-seed active flag: row r -> read r % n_loc
            row_active = jnp.tile(active_reads, 2)             # (R2,)
            bin_active = jnp.repeat(row_active, ns)
            rid, strand, beg, end, dist, ok = _map_one_bin(
                fmset.bwt_blocks[b], fmset.occ[b], fmset.counts[b],
                fmset.sa[b], fmset.text[b], fmset.n[b], bin_starts[b],
                reads, lengths, bin_active,
                None if fmset.pfx_lo is None else fmset.pfx_lo[b],
                None if fmset.pfx_hi is None else fmset.pfx_hi[b],
                rate_ppm=rate_ppm, max_errors=max_errors,
                capacity=capacity, max_slen=max_slen, prefix_q=prefix_q)
            outs.append((rid + data_idx * n_loc, strand, beg, end, dist, ok))
        stack = [jnp.stack(x) for x in zip(*outs)]             # (B_loc, C)
        return DistMapOut(*stack)

    pfx_spec = P("bin") if prefix_q > 0 else None
    fmset_spec = DeviceFMSet(
        bwt_blocks=P("bin"), occ=P("bin"), counts=P("bin"),
        sa=P("bin"), text=P("bin"), n=P("bin"),
        pfx_lo=pfx_spec, pfx_hi=pfx_spec)
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(fmset_spec, P("bin"), P("data"), P("data"), P("data", "bin")),
        out_specs=DistMapOut(*(P("bin", "data"),) * 6),
        check_vma=False)
    return jax.jit(sharded)


def shard_db(mesh: Mesh, fmset: DeviceFMSet, bin_starts):
    """Place the stacked DB on the mesh ('bin'-sharded, replicated over 'data')."""
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    fmset_sh = DeviceFMSet(*(None if getattr(fmset, f) is None
                             else put(getattr(fmset, f), P("bin"))
                             for f in fmset._fields))
    return fmset_sh, put(bin_starts, P("bin"))


def shard_reads(seqs, lengths, n_data: int):
    """Arrange a batch for the 'data' axis: each shard block is
    [fwd rows of its reads; rc rows of its reads] so the shard-local layout
    matches the local_step convention. Global read id of (shard d, local r)
    is d * n_loc + r. n must divide evenly (callers pad with length-0 reads).
    """
    import numpy as np

    n = lengths.shape[0]
    assert n % n_data == 0, "pad the batch to a multiple of the data axis"
    n_loc = n // n_data
    order = []
    for d in range(n_data):
        ids = np.arange(d * n_loc, (d + 1) * n_loc)
        order.extend(ids.tolist())          # fwd rows
        order.extend((n + ids).tolist())    # rc rows
    return seqs[np.array(order)], lengths


def dist_map_step(mesh, fmset, bin_starts, reads, lengths, routing,
                  *, rate_ppm, max_errors, capacity, max_slen) -> DistMapOut:
    """One-shot convenience (rebuilds the jitted step; hold onto
    build_dist_map_step's result for repeated batches)."""
    step = build_dist_map_step(mesh, rate_ppm=rate_ppm, max_errors=max_errors,
                               capacity=capacity, max_slen=max_slen)
    return step(fmset, bin_starts, reads, lengths, routing)
