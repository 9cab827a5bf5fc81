"""Single-bin device mapping step: seed -> search -> locate -> dedup -> verify.

This is the jitted hot path (reference _mapReadsImpl, SURVEY.md §3.1, stages
collectSeeds/findSeeds/extendHits fused into one XLA program). All shapes are
static: R2 seq rows x NS seeds x CAP hits; dead lanes are masked, never
branched on. Host-side post-processing (match table, ranking, SAM) lives in
pipeline/matches.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.backward_search import gather_hits, seed_search
from ..ops.device_index import DeviceFM
from ..ops.verify import banded_verify
from .seeding import errors_for, make_seeds


class MapStepOut(NamedTuple):
    row: jnp.ndarray       # (Cv,) int32 seq row (garbage where ~ok)
    begin: jnp.ndarray     # (Cv,) int32 global text begin
    end: jnp.ndarray       # (Cv,) int32 global text end (exclusive)
    dist: jnp.ndarray      # (Cv,) int32 edit distance
    ok: jnp.ndarray        # (Cv,) bool
    seed_lo: jnp.ndarray   # (S,) int32 — SA interval for overflow fallback
    seed_hi: jnp.ndarray   # (S,) int32
    overflow: jnp.ndarray  # (S,) int32 hits beyond capacity per seed
    n_spilled: jnp.ndarray     # () int32 candidates dropped by per-row
                               # compaction; > 0 => host re-runs the chunk
                               # densely to preserve completeness


def max_seed_len_static(max_len: int, rate_ppm: int) -> int:
    """Static bound on seed length over all read lengths <= max_len."""
    best = 1
    for l in range(1, max_len + 1):
        e = (l * rate_ppm) // 10_000
        best = max(best, l // (e + 1))
    return best


def max_rep_seed_len_static(max_len: int, rate_ppm: int) -> int:
    """Static bound on the LONG seeds of the repetitive path (s'=ceil((E+1)/2))."""
    best = 1
    for l in range(1, max_len + 1):
        e = (l * rate_ppm) // 10_000
        best = max(best, l // max(1, (e + 2) // 2))
    return best


@functools.partial(
    jax.jit, static_argnames=("rate_ppm", "max_errors", "capacity", "max_slen",
                              "verify_capacity"))
def single_bin_map_step(fm: DeviceFM, reads: jnp.ndarray, lengths: jnp.ndarray,
                        *, rate_ppm: int, max_errors: int, capacity: int,
                        max_slen: int,
                        verify_capacity: int | None = None) -> MapStepOut:
    R2, L = reads.shape
    n_reads = lengths.shape[0]

    rows, starts, slens = make_seeds(lengths, R2, rate_ppm, max_errors)
    lo, hi = seed_search(fm.bwt_blocks, fm.occ, fm.counts, fm.n,
                         reads, rows, starts, slens, max_slen)
    pos, hmask, overflow = gather_hits(fm.sa, lo, hi, capacity)

    ns = max_errors + 1
    A = (pos - starts[:, None]).reshape(R2, ns * capacity)
    V = hmask.reshape(R2, ns * capacity)
    row_ids = jnp.arange(R2, dtype=jnp.int32)
    vrow, vanch, keep, n_spilled = dedup_compact(A, V, row_ids, verify_capacity)
    dist, beg, end, ok = verify_candidates(
        fm, reads, lengths, vrow, vanch, keep, rate_ppm, max_errors)
    return MapStepOut(row=vrow, begin=beg, end=end, dist=dist, ok=ok,
                      seed_lo=lo, seed_hi=hi, overflow=overflow,
                      n_spilled=n_spilled)


def dedup_compact(A, V, row_ids, verify_capacity: int | None):
    """Per-row anchor dedup + compaction.

    Duplicate (row, anchor) pairs can only occur WITHIN a seq row (the E+1
    seeds of one read all hit the same diagonal), so a per-row sort over the
    hit slots suffices — far cheaper on TPU than a global lexsort (minor-axis
    bitonic sorts vs a 500k-element radix sort). Compaction keeps at most
    verify_capacity candidates per row for the banded DP; spilled candidates
    are counted so the host can re-run densely (completeness never lost).

    A, V: (R, slots) anchors + validity; row_ids: (R,) seq-row id per row.
    Returns (vrow, vanch, keep) flattened (R*kv,) + n_spilled scalar.
    """
    R, slots = A.shape
    BIG = jnp.int32(1 << 30)
    Am = jnp.where(V, A, BIG)
    Am = jnp.sort(Am, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((R, 1), bool), Am[:, 1:] == Am[:, :-1]], axis=1)
    keep2 = (Am < BIG) & ~dup
    kept_before = keep2.sum(dtype=jnp.int32)

    if verify_capacity is not None and verify_capacity < slots:
        corder = jnp.argsort(~keep2, axis=1, stable=True)[:, :verify_capacity]
        Am = jnp.take_along_axis(Am, corder, axis=1)
        keep2 = jnp.take_along_axis(keep2, corder, axis=1)
        kv = verify_capacity
    else:
        kv = slots
    n_spilled = kept_before - keep2.sum(dtype=jnp.int32)

    keep = keep2.reshape(-1)
    vrow = jnp.repeat(row_ids, kv)
    vanch = Am.reshape(-1)
    return (jnp.where(keep, vrow, 0), jnp.where(keep, vanch, 0),
            keep, n_spilled)


def verify_candidates(fm: DeviceFM, reads, lengths, vrow, vanch, keep,
                      rate_ppm: int, max_errors: int):
    n_reads = lengths.shape[0]
    lrow = jnp.take(lengths, vrow % n_reads).astype(jnp.int32)
    dist, beg, end = banded_verify(fm.text, vanch, reads, vrow, lrow,
                                   max_err=max_errors)
    budget = errors_for(lrow, rate_ppm)
    ok = keep & (dist <= budget) & (beg >= 0) & (end <= fm.n)
    return dist, beg, end, ok


@functools.partial(
    jax.jit, static_argnames=("rate_ppm", "max_errors", "capacity",
                              "max_slen_rep", "verify_capacity"))
def repetitive_map_step(fm: DeviceFM, reads: jnp.ndarray, lengths: jnp.ndarray,
                        rep_rows: jnp.ndarray, rep_mask: jnp.ndarray,
                        *, rate_ppm: int, max_errors: int, capacity: int,
                        max_slen_rep: int, verify_capacity: int = 8):
    """Re-seed repetitive rows with fewer/longer Hamming<=1 seeds.

    The classifier path (reference mapper_classifier.h + findSeeds<1> [U]):
    rows whose exact seeds overflowed hit capacity get s' = ceil((E+1)/2)
    seeds of length l // s', searched with up to one substitution
    (ops/approx_search.py). rep_rows: (K,) seq-row ids; rep_mask: (K,) bool.

    Returns (row, begin, end, dist, ok): (K*verify_capacity,) arrays.
    """
    from ..ops.approx_search import seed_search_1sub

    K = rep_rows.shape[0]
    n_reads = lengths.shape[0]

    l = jnp.take(lengths, rep_rows % n_reads).astype(jnp.int32)
    l = jnp.where(rep_mask, l, 0)
    e = errors_for(l, rate_ppm).astype(jnp.int32)
    ns2 = (e + 2) // 2                                   # ceil((E+1)/2)
    ns2_max = (max_errors + 2) // 2

    rows_s = jnp.repeat(rep_rows, ns2_max)
    sidx = jnp.tile(jnp.arange(ns2_max, dtype=jnp.int32), K)
    l_s = jnp.repeat(l, ns2_max)
    ns2_s = jnp.repeat(ns2, ns2_max)
    slen = jnp.where(ns2_s > 0, l_s // jnp.maximum(ns2_s, 1), 0)
    valid_s = sidx < ns2_s
    starts = sidx * slen
    slens = jnp.where(valid_s, slen, 0)

    t_lo, t_hi, b_lo, b_hi, b_valid = seed_search_1sub(
        fm.bwt_blocks, fm.occ, fm.counts, fm.n, reads,
        rows_s, starts, slens, max_slen_rep)

    S = rows_s.shape[0]
    NB = b_lo.shape[1]
    all_lo = jnp.concatenate([t_lo[:, None], b_lo], axis=1).reshape(-1)
    all_hi = jnp.concatenate([t_hi[:, None], b_hi], axis=1).reshape(-1)
    pos, hmask, _ov = gather_hits(fm.sa, all_lo, all_hi, capacity)

    # anchors: substitution branches keep the diagonal
    starts_b = jnp.repeat(starts, NB + 1)
    A = pos - starts_b[:, None]                               # (S*(NB+1), cap)
    slots = ns2_max * (NB + 1) * capacity
    A = A.reshape(K, slots)
    V = hmask.reshape(K, slots)
    vrow, vanch, keep, n_spilled = dedup_compact(
        A, V, jnp.where(rep_mask, rep_rows, 0), verify_capacity)
    dist, beg, end, ok = verify_candidates(
        fm, reads, lengths, vrow, vanch, keep, rate_ppm, max_errors)
    return vrow, beg, end, dist, ok, n_spilled


@functools.partial(jax.jit, static_argnames=("max_errors",))
def verify_positions(fm: DeviceFM, reads, lengths, rows, anchors, mask,
                     *, max_errors: int):
    """Verify explicit (row, anchor) candidates (overflow fallback / rescue)."""
    n_reads = lengths.shape[0]
    vrow = jnp.where(mask, rows, 0)
    lrow = jnp.take(lengths, vrow % n_reads).astype(jnp.int32)
    dist, beg, end = banded_verify(fm.text, jnp.where(mask, anchors, 0),
                                   reads, vrow, lrow, max_err=max_errors)
    return dist, beg, end
