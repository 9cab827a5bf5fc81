"""Mesh-sharded DREAM mapping step: classify -> route -> map, one XLA program.

TPU-native replacement for the reference's process-level distribution
(SURVEY.md §2.10, §5.8: the reference farms bins out at the file level and
merges SAM offline; here the bin axis is a first-class mesh axis). Device
(i, j) of the (data, bin) mesh holds read-shard i and bin-shard j:

  1. classify: the replicated IBF is queried for shard i's reads (identical
     bit-for-bit to the single-chip classifier, ops/ibf_query.py); the
     (reads, bins) candidate mask is computed once per data shard.
  2. route: for each LOCAL bin, the reads routed to it are compacted
     (cumsum + scatter, no sort) into a fixed R_cap-slot buffer — the
     MoE-style capacity routing that realizes the IBF saving on device,
     instead of mapping every read against every bin with lane masking.
     Reads beyond R_cap are counted (route_overflow) and re-mapped on host.
  3. map: each local bin runs the SAME _map_step_core as the single-chip
     path (fused rank rows, q-mer prefix table, sampled SA, Pallas verify,
     global verify-lane compaction) under a lax.scan over local bins.

Every fixed-capacity truncation is COUNTED and surfaced (route_overflow,
seed overflow_total, verify n_spilled); the host driver re-maps affected
(bin, reads) subsets through the exact single-chip BinMapper, so the merged
match set is byte-identical to the single-device DREAM pipeline for any mesh
shape — fixed capacities never silently drop matches
(docs/OUTPUT_CONTRACT.md).

Outputs stay BIN-LOCAL int32 coordinates; the host applies the int64 global
bin offset (databases can exceed 2^31 bp in aggregate).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.device_index import DeviceFM, DeviceFMSet
from ..ops.ibf_query import classify_thresholds, ibf_bin_counts
from ..ops.readpack import pack_blob_with_lengths, unpack_blob, unpack_reads


class MeshMapOut(NamedTuple):
    """Stacked per-bin outputs; leading axis is the global bin axis."""

    begin: jnp.ndarray        # (B, D*cap2v) int32 BIN-LOCAL begin
    end: jnp.ndarray          # (B, D*cap2v) int32 BIN-LOCAL end
    meta: jnp.ndarray         # (B, D*cap2v) int32: subrow | dist<<18 | ok<<31
    overflow_total: jnp.ndarray  # (B, D) int32 seed-hit overflow per bin/shard
    n_spilled: jnp.ndarray    # (B, D) int32 verify-lane spills per bin/shard
    route_overflow: jnp.ndarray  # (B, D) int32 reads beyond R_cap per bin/shard
    route_words: jnp.ndarray  # (n_pad, ceil(Bp/32)) uint32 routing bits
    ovf_rows: jnp.ndarray     # (B, D*2*r_cap) bool: seed-hit overflow per
                              # ROUTED SLOT ROW (fwd rows then rc rows) — lets
                              # the host fall back per READ instead of per bin


META_DIST_SHIFT = 18
META_OK_SHIFT = 31


def _route_compact(routed: jnp.ndarray, r_cap: int):
    """Compact the routed read slots of one bin (cumsum + scatter, no sort).

    routed: (n_loc,) bool. Returns (slot_read, slot_valid, overflow):
    slot_read[s] = local id of the s-th routed read (ascending), s < r_cap.
    """
    n_loc = routed.shape[0]
    pos = jnp.cumsum(routed.astype(jnp.int32)) - 1
    total = jnp.where(n_loc > 0, pos[-1] + 1, 0)
    dst = jnp.where(routed & (pos < r_cap), pos, r_cap)
    slot_read = jnp.zeros(r_cap + 1, jnp.int32).at[dst].set(
        jnp.arange(n_loc, dtype=jnp.int32))[:r_cap]
    slot_valid = jnp.arange(r_cap, dtype=jnp.int32) < jnp.minimum(total, r_cap)
    return slot_read, slot_valid, jnp.maximum(total - r_cap, 0)


def routing_from_counts(counts, n_sel, lengths2, k: int, window: int,
                        rate_ppm: int, half: int):
    """Routing threshold (k-mer lemma, or the probabilistic minimizer bound
    when window > k) + orientation OR — identical to the single-chip
    classifier (ops/ibf_query.ibf_classify_packed)."""
    thr = classify_thresholds(lengths2, n_sel, k, window, rate_ppm)
    mask = counts >= thr[:, None]
    return mask[:half] | mask[half:]                       # (half, Bp)


def build_mesh_dream_step(mesh: Mesh, *, half_loc: int, L: int, B: int,
                          r_cap: int, rate_ppm: int, max_errors: int,
                          capacity: int, max_slen: int, prefix_q: int,
                          sample_rate: int, use_pallas: bool,
                          k: int = 0, n_hashes: int = 0, window: int = 0,
                          use_filter: bool = True, uniform_len: bool = False,
                          route_override: bool = False):
    """Jitted sharded step: (fmset, filter_words, blob[, route_words])
    -> MeshMapOut.

    fmset: DeviceFMSet, axis 0 sharded over 'bin' (B divisible by the bin
    axis); filter_words replicated; blob = concatenated per-data-shard
    pack_blob_with_lengths uploads, sharded over 'data'.

    `route_override=True` compiles a variant taking an explicit
    (n_pad, ceil(B/32)) uint32 routing-bit input instead of the IBF
    classify — the capacity-drain path for skewed databases: reads beyond
    r_cap are re-submitted through the SAME mesh step with only the
    leftover (read, bin) pairs routed, so hot-bin overflow costs extra
    mesh passes instead of host single-chip re-maps (config 5 skew
    tolerance, BASELINE row 5).
    """
    from ..pipeline.map_step import _map_step_core

    data_ax = mesh.shape["data"]
    bin_ax = mesh.shape["bin"]
    assert B % bin_ax == 0, "pad bins to a multiple of the bin axis"
    B_loc = B // bin_ax
    cap2v = 2 * r_cap  # global verify budget per bin: ~1 lane per seq row
    Wb_in = (B + 31) // 32

    def local_step(fmset: DeviceFMSet, filter_words, blob, route_in):
        packed, nmask, lengths = unpack_blob(blob, half_loc, L)
        reads = unpack_reads(packed, nmask, lengths, L)    # (2*half_loc, L)
        lengths2 = jnp.concatenate([lengths, lengths])

        if route_override:
            bits = ((route_in[:, :, None]
                     >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]) & 1)
            cand = bits.reshape(half_loc, Wb_in * 32)[:, :B].astype(bool)
            cand = cand & (lengths > 0)[:, None]
        elif use_filter:
            counts, n_sel = ibf_bin_counts(filter_words, reads, lengths2, k,
                                           n_hashes, window)
            cand = routing_from_counts(counts, n_sel, lengths2, k, window,
                                       rate_ppm, half_loc)
            cand = cand[:, :B]
        else:
            cand = jnp.broadcast_to((lengths > 0)[:, None], (half_loc, B))

        # routing bits for the host (fallback bookkeeping) — bit-packed
        Wb = (B + 31) // 32
        cb = jnp.pad(cand, ((0, 0), (0, Wb * 32 - B)))
        route_words = (cb.reshape(half_loc, Wb, 32).astype(jnp.uint32)
                       << jnp.arange(32, dtype=jnp.uint32)[None, None, :]).sum(
                           axis=2, dtype=jnp.uint32)

        base = jax.lax.axis_index("bin") * B_loc
        local_cols = jax.lax.dynamic_slice_in_dim(cand, base, B_loc, axis=1)

        def map_one_bin(_, xs):
            fm_b, routed = xs
            slot_read, slot_valid, route_ovf = _route_compact(routed, r_cap)
            sub_fwd = jnp.take(reads, slot_read, axis=0)
            sub_rc = jnp.take(reads, half_loc + slot_read, axis=0)
            sub_reads = jnp.concatenate([sub_fwd, sub_rc], axis=0)
            mask_col = jnp.where(slot_valid, 0, 4).astype(jnp.int8)[:, None]
            sub_reads = jnp.where(
                jnp.tile(mask_col, (2, 1)) == 4, jnp.int8(4), sub_reads)
            sub_lens = jnp.where(slot_valid, jnp.take(lengths, slot_read), 0)

            out = _map_step_core(
                fm_b, sub_reads, sub_lens, rate_ppm, max_errors, capacity,
                max_slen, None, cap2v, prefix_q, use_pallas, sample_rate,
                uniform_len)
            meta = (out.row
                    | (jnp.clip(out.dist, 0, 31) << META_DIST_SHIFT)
                    | (out.ok.astype(jnp.int32) << META_OK_SHIFT))
            # per seq-row seed overflow (seeds are (R2, ns) row-major)
            ovf_row = out.overflow.reshape(2 * r_cap, -1).sum(axis=1) > 0
            return None, (out.begin, out.end, meta, out.overflow_total,
                          out.n_spilled, route_ovf, ovf_row)

        fm_xs = DeviceFM(
            bwt_blocks=fmset.bwt_blocks, occ=fmset.occ, counts=fmset.counts,
            sa=fmset.sa, text=fmset.text, n=fmset.n,
            pfx_lo=fmset.pfx_lo, pfx_hi=fmset.pfx_hi, fused=fmset.fused,
            sa_mark_bits=fmset.sa_mark_bits, sa_rank_ck=fmset.sa_rank_ck)
        _, ys = jax.lax.scan(map_one_bin, None,
                             (fm_xs, local_cols.T.astype(bool)))
        begin, end, meta, ovf, spill, route_ovf, ovf_rows = ys
        return MeshMapOut(
            begin=begin, end=end, meta=meta,
            overflow_total=ovf[:, None], n_spilled=spill[:, None],
            route_overflow=route_ovf[:, None], route_words=route_words,
            ovf_rows=ovf_rows)

    fm_specs = DeviceFM(
        bwt_blocks=P("bin"), occ=P("bin"), counts=P("bin"), sa=P("bin"),
        text=P("bin"), n=P("bin"),
        pfx_lo=None if prefix_q == 0 else P("bin"),
        pfx_hi=None if prefix_q == 0 else P("bin"),
        fused=P("bin"),
        sa_mark_bits=None if sample_rate == 1 else P("bin"),
        sa_rank_ck=None if sample_rate == 1 else P("bin"))
    fmset_spec = DeviceFMSet(
        bwt_blocks=fm_specs.bwt_blocks, occ=fm_specs.occ,
        counts=fm_specs.counts, sa=fm_specs.sa, text=fm_specs.text,
        n=fm_specs.n, pfx_lo=fm_specs.pfx_lo, pfx_hi=fm_specs.pfx_hi,
        fused=fm_specs.fused, sa_mark_bits=fm_specs.sa_mark_bits,
        sa_rank_ck=fm_specs.sa_rank_ck)

    out_specs = MeshMapOut(
        begin=P("bin", "data"), end=P("bin", "data"),
        meta=P("bin", "data"), overflow_total=P("bin", "data"),
        n_spilled=P("bin", "data"), route_overflow=P("bin", "data"),
        route_words=P("data"), ovf_rows=P("bin", "data"))
    if route_override:
        sharded = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(fmset_spec, P(), P("data"), P("data")),
            out_specs=out_specs, check_vma=False)
    else:
        sharded = jax.shard_map(
            lambda fmset_, fw_, blob_: local_step(fmset_, fw_, blob_, None),
            mesh=mesh, in_specs=(fmset_spec, P(), P("data")),
            out_specs=out_specs, check_vma=False)
    return jax.jit(sharded)


def shard_db(mesh: Mesh, fmset: DeviceFMSet):
    """Place the stacked DB on the mesh ('bin'-sharded, replicated over 'data')."""
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P("bin")))
    return DeviceFMSet(*(None if getattr(fmset, f) is None
                         else put(getattr(fmset, f))
                         for f in fmset._fields))


def pack_batch_blob(seqs_fwd: np.ndarray, lengths: np.ndarray,
                    data_ax: int, L: int):
    """Per-data-shard packed uploads, concatenated so axis 0 shards evenly.

    seqs_fwd: (n, L) forward rows only. Returns (blob, half_loc): reads are
    padded with length-0 rows to data_ax * half_loc; global read id of
    (shard d, slot s) = d * half_loc + s.
    """
    n = len(lengths)
    half_loc = (n + data_ax - 1) // data_ax
    blobs = []
    for d in range(data_ax):
        ids = np.arange(d * half_loc, min((d + 1) * half_loc, n))
        lens = np.zeros(half_loc, dtype=np.int32)
        lens[: len(ids)] = lengths[ids]
        blobs.append(pack_blob_with_lengths(seqs_fwd[ids], lens, half_loc, L))
    return np.concatenate(blobs), half_loc


def pack_route_words(routing: np.ndarray, B: int) -> np.ndarray:
    """(n_pad, B) bool -> (n_pad, ceil(B/32)) uint32 (inverse of
    decode_routing) — the route-override input of the capacity-drain pass."""
    n_pad = routing.shape[0]
    Wb = (B + 31) // 32
    rb = np.zeros((n_pad, Wb * 32), dtype=bool)
    rb[:, :B] = routing[:, :B]
    return (rb.reshape(n_pad, Wb, 32).astype(np.uint32)
            << np.arange(32, dtype=np.uint32)[None, None, :]).sum(
                axis=2, dtype=np.uint32)


def decode_routing(route_words: np.ndarray, n: int, B: int) -> np.ndarray:
    """(n_pad, Wb) uint32 -> (n, B) bool candidate mask."""
    bits = ((route_words[:, :, None]
             >> np.arange(32, dtype=np.uint32)[None, None, :]) & 1)
    return bits.reshape(route_words.shape[0], -1)[:n, :B].astype(bool)
