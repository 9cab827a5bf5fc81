"""Paired-end pipeline: pair selection, flags/TLEN, mate rescue."""

import numpy as np

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.pipeline import rank_matches
from dream_yara_tpu.pipeline.mapper import (
    BinMapper, map_paired_bin, paired_bin_sam, rescue_mates,
)
from dream_yara_tpu.pipeline.matches import Matches
from dream_yara_tpu.utils.alphabet import revcomp
from dream_yara_tpu.utils.options import MapperOptions
from tests.conftest import mutate, random_text


def make_pe_case(rng, n_pairs=12, genome_len=20000, read_len=100,
                 ll=300, ld=50, junk_mate2=()):
    genome = random_text(rng, genome_len)
    store = SeqStore.from_seqs(["chr"], [genome])
    fm = FMIndex.build(store.text)
    m1, m2, tlens, poss = [], [], [], []
    for i in range(n_pairs):
        t = int(rng.integers(ll - ld + 10, ll + ld - 10))
        p = int(rng.integers(0, genome_len - t - 1))
        r1 = mutate(rng, genome[p : p + read_len].copy(), n_sub=1)
        r2 = revcomp(mutate(rng, genome[p + t - read_len : p + t].copy(), n_sub=1))
        if i in junk_mate2:
            r2 = random_text(rng, read_len)
        m1.append(r1); m2.append(r2); tlens.append(t); poss.append(p)
    names = [f"p{i}" for i in range(n_pairs)] * 2
    batch = ReadBatch.from_reads(names, m1 + m2, paired=True)
    return store, fm, batch, tlens, poss


def test_pe_proper_pairs(rng):
    store, fm, batch, tlens, poss = make_pe_case(rng)
    opts = MapperOptions(error_rate=0.05, library_length=300, library_deviation=50)
    ranked, cigars, contigs, pi = map_paired_bin(store, fm, batch, opts)
    n = batch.n_reads
    h = n // 2
    assert pi.proper.all()
    m = ranked.matches
    for i in range(h):
        p1 = int(pi.primary_idx[i]); p2 = int(pi.primary_idx[i + h])
        assert int(m.begin[p1]) == poss[i]
        assert int(m.strand[p1]) == 0 and int(m.strand[p2]) == 1
        assert int(pi.tlen[i]) == tlens[i]
        assert int(pi.tlen[i + h]) == -tlens[i]


def test_pe_sam_records(rng):
    store, fm, batch, tlens, poss = make_pe_case(rng, junk_mate2=(0,))
    opts = MapperOptions(error_rate=0.05, library_length=300,
                         library_deviation=50, rescue=False)
    sam = paired_bin_sam(store, fm, batch, opts).decode()
    recs = [l.split("\t") for l in sam.strip().split("\n") if not l.startswith("@")]
    assert len(recs) == batch.n_reads
    by_name = {}
    for r in recs:
        by_name.setdefault(r[0], []).append(r)
    for name, rr in by_name.items():
        assert len(rr) == 2
        f1, f2 = int(rr[0][1]), int(rr[1][1])
        assert f1 & 0x1 and f2 & 0x1
        assert (f1 & 0x40 and f2 & 0x80) or (f1 & 0x80 and f2 & 0x40)
    # the junk mate2 pair: mate2 unmapped, placed at mate1's position
    junk = by_name["p0"]
    r1 = next(r for r in junk if int(r[1]) & 0x40)
    r2 = next(r for r in junk if int(r[1]) & 0x80)
    assert int(r2[1]) & 0x4                    # mate2 unmapped
    assert int(r1[1]) & 0x8                    # mate1 sees mate unmapped
    assert not int(r1[1]) & 0x2                # not proper
    assert r2[3] == r1[3]                      # unmapped placed at mate pos
    # proper pairs have correct TLEN cross-reference
    good = by_name["p1"]
    g1 = next(r for r in good if int(r[1]) & 0x40)
    g2 = next(r for r in good if int(r[1]) & 0x80)
    assert int(g1[1]) & 0x2 and int(g2[1]) & 0x2
    assert int(g1[8]) == -int(g2[8]) != 0
    assert g1[6] == "=" and int(g1[7]) == int(g2[3])


def test_mate_rescue_machinery(rng):
    """Strip mate2 matches, assert rescue re-finds them via the anchor window."""
    store, fm, batch, tlens, poss = make_pe_case(rng, n_pairs=6)
    opts = MapperOptions(error_rate=0.05, library_length=300, library_deviation=50)
    mapper = BinMapper(store, fm, opts)
    m = mapper.map_batch(batch)
    n = batch.n_reads
    h = n // 2
    from dream_yara_tpu.pipeline.matches import dedup_matches
    keep = m.read_id < h                      # drop ALL mate2 matches
    ranked = rank_matches(dedup_matches(m.take(keep)), n)
    rescued = rescue_mates(mapper, batch, ranked, opts, max_err=5, rate_ppm=500)
    assert len(rescued) > 0
    got = {}
    for i in range(len(rescued)):
        rid = int(rescued.read_id[i])
        if rid >= h and int(rescued.dist[i]) <= 5:
            got.setdefault(rid, []).append(
                (int(rescued.begin[i]), int(rescued.strand[i])))
    for i in range(6):
        rid = i + h
        want_begin = poss[i] + tlens[i] - 100
        assert rid in got, f"mate {rid} not rescued"
        assert any(b == want_begin and s == 1 for b, s in got[rid]), \
            (got[rid], want_begin)


def test_pe_pipeline_matches_golden_pe(rng):
    """Full PE pipeline (incl. rescue + pair selection) vs the scalar oracle."""
    from dream_yara_tpu.golden.golden_mapper import golden_map_pe

    store, fm, batch, tlens, poss = make_pe_case(
        rng, n_pairs=10, junk_mate2=(0, 3))
    opts = MapperOptions(error_rate=0.05, library_length=300,
                         library_deviation=50)
    ranked, cigars, contigs, pi = map_paired_bin(store, fm, batch, opts)
    g_reads, g_prim, g_proper, g_tlen = golden_map_pe(
        store, fm, batch, error_rate=0.05,
        library_length=300, library_deviation=50)

    m = ranked.matches
    n = batch.n_reads
    for rid in range(n):
        got = [(int(m.dist[i]), int(m.begin[i]), int(m.end[i]), int(m.strand[i]))
               for i in np.flatnonzero(m.read_id == rid)]
        assert got == g_reads[rid].matches, f"read {rid}"
        assert int(ranked.c1[rid]) == g_reads[rid].c1, rid
    for rid in range(n):
        assert bool(pi.proper[rid]) == g_proper[rid], rid
        assert int(pi.tlen[rid]) == g_tlen[rid], rid
        p = int(pi.primary_idx[rid])
        if g_prim[rid] is None:
            assert p < 0, rid
        else:
            d, b, e, s = g_prim[rid]
            assert (int(m.dist[p]), int(m.begin[p]), int(m.end[p]),
                    int(m.strand[p])) == (d, b, e, s), rid
