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
    n_candidates: jnp.ndarray  # () int32 deduped candidates (compaction check:
                               # if > Cv the host must re-run with higher
                               # verify_capacity to preserve completeness)


def max_seed_len_static(max_len: int, rate_ppm: int) -> int:
    """Static bound on seed length over all read lengths <= max_len."""
    best = 1
    for l in range(1, max_len + 1):
        e = (l * rate_ppm) // 10_000
        best = max(best, l // (e + 1))
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

    anchors = (pos - starts[:, None]).reshape(-1)                # (C,)
    crow = jnp.broadcast_to(rows[:, None], pos.shape).reshape(-1)
    valid = hmask.reshape(-1)

    # Dedup identical (row, anchor) pairs so each diagonal verifies once.
    key_row = jnp.where(valid, crow, R2)                         # invalid sorts last
    perm = jnp.lexsort((anchors, key_row))
    srow = key_row[perm]
    sanch = anchors[perm]
    svalid = valid[perm]
    prev_row = jnp.concatenate([jnp.array([-1], jnp.int32), srow[:-1]])
    prev_anch = jnp.concatenate([jnp.array([jnp.iinfo(jnp.int32).min], jnp.int32),
                                 sanch[:-1]])
    dup = (srow == prev_row) & (sanch == prev_anch)
    keep = svalid & ~dup
    n_candidates = keep.sum(dtype=jnp.int32)

    # Compact survivors to the front so the expensive banded DP runs on a
    # verify_capacity-sized buffer instead of all S*capacity hit slots
    # (typically an ~8x lane saving; n_candidates reports spill).
    if verify_capacity is not None and verify_capacity < srow.shape[0]:
        cperm = jnp.argsort(~keep, stable=True)[:verify_capacity]
        srow = srow[cperm]
        sanch = sanch[cperm]
        keep = keep[cperm]

    vrow = jnp.where(keep, jnp.clip(srow, 0, R2 - 1), 0)
    vanch = jnp.where(keep, sanch, 0)
    lrow = jnp.take(lengths, vrow % n_reads).astype(jnp.int32)
    dist, beg, end = banded_verify(fm.text, vanch, reads, vrow, lrow,
                                   max_err=max_errors)
    budget = errors_for(lrow, rate_ppm)
    ok = keep & (dist <= budget) & (beg >= 0) & (end <= fm.n)
    return MapStepOut(row=vrow, begin=beg, end=end, dist=dist, ok=ok,
                      seed_lo=lo, seed_hi=hi, overflow=overflow,
                      n_candidates=n_candidates)


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
