"""Paired-end selection and mate rescue.

Reference analogs: src/mapper_selector.h PairsSelector (library-consistent
combo selection), src/mapper_verifier.h AnchorsVerifier (mate rescue by banded
verification inside the insert window) [U]; SURVEY.md §3.5.

Contract (docs/OUTPUT_CONTRACT.md): FR orientation only. A combo
(m1 fwd, m2 rc) is proper iff same contig, begin1 <= end2 and
tlen = end2 - begin1 in [ll-ld, ll+ld]; symmetrically for (m1 rc, m2 fwd) with
tlen = end1 - begin2. The selected combo minimizes
(d1+d2, begin1, begin2, strand1) — deterministic. Pairing selects primaries
and flags; it never removes strata matches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .matches import Matches, Ranked


@dataclass
class PairInfo:
    """Per-read pairing outcome (index into ranked.matches rows or -1)."""

    primary_idx: np.ndarray   # (n_reads,) int64 — chosen primary match row
    proper: np.ndarray        # (n_reads,) bool
    tlen: np.ndarray          # (n_reads,) int64 signed template length


def _groups(m: Matches, n_reads: int):
    starts = np.searchsorted(m.read_id, np.arange(n_reads), side="left")
    ends = np.searchsorted(m.read_id, np.arange(n_reads), side="right")
    return starts, ends


def select_pairs(ranked: Ranked, n_reads: int, contigs, library_length: int,
                 library_deviation: int) -> PairInfo:
    """Pick library-consistent primary combos. Reads [0,h) pair with [h,2h)."""
    m = ranked.matches
    h = n_reads // 2
    starts, ends = _groups(m, n_reads)
    cid = contigs.contig_of(m.begin) if len(m) else np.zeros(0, dtype=np.int64)

    primary_idx = np.full(n_reads, -1, dtype=np.int64)
    proper = np.zeros(n_reads, dtype=bool)
    tlen = np.zeros(n_reads, dtype=np.int64)

    lo_t = library_length - library_deviation
    hi_t = library_length + library_deviation

    for r1 in range(h):
        r2 = r1 + h
        s1, e1 = int(starts[r1]), int(ends[r1])
        s2, e2 = int(starts[r2]), int(ends[r2])
        # default primaries: first (canonical-best) match of each group
        if s1 < e1:
            primary_idx[r1] = s1
        if s2 < e2:
            primary_idx[r2] = s2
        if s1 == e1 or s2 == e2:
            continue
        best = None
        for i in range(s1, e1):
            for j in range(s2, e2):
                if cid[i] != cid[j] or m.strand[i] == m.strand[j]:
                    continue
                if m.strand[i] == 0:   # m1 fwd, m2 rc
                    t = int(m.end[j] - m.begin[i])
                else:                  # m1 rc, m2 fwd
                    t = int(m.end[i] - m.begin[j])
                if not (lo_t <= t <= hi_t):
                    continue
                key = (int(m.dist[i] + m.dist[j]), int(m.begin[i]),
                       int(m.begin[j]), int(m.strand[i]))
                if best is None or key < best[0]:
                    best = (key, i, j, t)
        if best is not None:
            _, i, j, t = best
            primary_idx[r1], primary_idx[r2] = i, j
            proper[r1] = proper[r2] = True
            # signed TLEN: leftmost mate positive
            b1, b2 = int(m.begin[i]), int(m.begin[j])
            tlen[r1] = t if b1 <= b2 else -t
            tlen[r2] = -tlen[r1]
    return PairInfo(primary_idx=primary_idx, proper=proper, tlen=tlen)


@dataclass
class RescueCandidates:
    """Explicit (row, anchor) candidates for the device verifier."""

    rows: np.ndarray      # seq row of the mate orientation to try
    anchors: np.ndarray   # text begin anchors
    read_ids: np.ndarray  # mate read id per candidate


def rescue_candidates(ranked: Ranked, n_reads: int, lengths: np.ndarray,
                      library_length: int, library_deviation: int,
                      band: int, max_anchor_matches: int = 4) -> RescueCandidates:
    """Anchors for unmapped mates of mapped reads (reference AnchorsVerifier
    scans the +-(ll+ld) window with Myers [U]; we tile the window with banded
    anchors spaced 2*band+1 apart so the band sweep covers every begin)."""
    m = ranked.matches
    h = n_reads // 2
    starts, ends = _groups(m, n_reads)
    rows_l, anch_l, rid_l = [], [], []
    stride = 2 * band + 1

    for rid in range(n_reads):
        mate = rid + h if rid < h else rid - h
        if ends[rid] == starts[rid] or ends[mate] > starts[mate]:
            continue  # this read unmapped, or mate already mapped
        mlen = int(lengths[mate])
        for k in range(int(starts[rid]), min(int(ends[rid]),
                                             int(starts[rid]) + max_anchor_matches)):
            if m.strand[k] == 0:
                # anchor fwd -> mate rc, end2 in [b1+ll-ld, b1+ll+ld]
                lo = int(m.begin[k]) + library_length - library_deviation - mlen
                hi = int(m.begin[k]) + library_length + library_deviation - mlen
                mate_row_strand = 1
            else:
                # anchor rc -> mate fwd, begin2 in [e1-ll-ld, e1-ll+ld]
                lo = int(m.end[k]) - library_length - library_deviation
                hi = int(m.end[k]) - library_length + library_deviation
                mate_row_strand = 0
            for a in range(lo, hi + 1, stride):
                rows_l.append(mate + mate_row_strand * n_reads)
                anch_l.append(a)
                rid_l.append(mate)
    return RescueCandidates(
        rows=np.array(rows_l, dtype=np.int32),
        anchors=np.array(anch_l, dtype=np.int32),
        read_ids=np.array(rid_l, dtype=np.int32),
    )
