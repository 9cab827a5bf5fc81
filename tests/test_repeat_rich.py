"""Repeat-rich synthetic stress (VERDICT r2 weak #8): sensitivity must hold
on genomes with interspersed repeat families, tandem arrays, N-runs and GC
skew — not just the uniform-random DNA that flatters an FM-index mapper."""

import numpy as np
import pytest

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.index.ibf import InterleavedBloomFilter
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.pipeline.dis_mapper import DreamIndex, dis_map_batch
from dream_yara_tpu.pipeline.matches import dedup_matches, rank_matches
from dream_yara_tpu.utils.options import MapperOptions
from dream_yara_tpu.utils.simulate import (gc_skewed_text,
                                           repeat_rich_genome, sample_reads)


@pytest.fixture(scope="module")
def rich_db():
    rng = np.random.default_rng(2027)
    B = 3
    genomes, anns = [], []
    for b in range(B):
        g, ann = repeat_rich_genome(rng, 60_000, alu_count=20,
                                    tandem_loci=2, n_runs=2)
        genomes.append(g)
        anns.append(ann)
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    filt = InterleavedBloomFilter.create(B, size_bits=1 << 23, n_hashes=3,
                                         k=19)
    for b, g in enumerate(genomes):
        filt.add_kmers(g, b)
    return genomes, anns, DreamIndex(stores, fms, filt, "bloom")


def test_generator_structure():
    rng = np.random.default_rng(7)
    g, ann = repeat_rich_genome(rng, 100_000)
    assert len(g) == 100_000
    assert ann["alu"] and ann["tandem"] and ann["nrun"]
    # N-runs really are N
    lo, hi = ann["nrun"][0]
    assert (g[lo:hi] == 4).all()
    # GC skew holds outside N-runs
    real = g[g < 4]
    gc = ((real == 1) | (real == 2)).mean()
    assert 0.55 < gc < 0.65
    # interspersed copies are homologous but diverged: two ALU copies agree
    # far above random (25%) yet below identity
    (a0, a1), (b0, b1) = ann["alu"][0], ann["alu"][1]
    if a1 - a0 == b1 - b0:
        agree = (g[a0:a1] == g[b0:b1]).mean()
        assert agree > 0.6


def test_sensitivity_on_repeats(rich_db):
    """Every planted read (<=2 substitutions, half from repeat regions) must
    report its true site among the matches within 2 strata of the best —
    the all-mapper contract on multi-mapping reads (a diverged repeat copy
    can beat the true site, so the check uses -s 2, not the best stratum)."""
    rng = np.random.default_rng(11)
    genomes, anns, index = rich_db
    opts = MapperOptions(error_rate=0.03, strata_count=2, sensitivity="full")
    names, reads, truth = [], [], []
    for b in range(len(genomes)):
        regions = anns[b]["alu"] + anns[b]["tandem"]
        rs, ts = sample_reads(rng, genomes[b], 30, regions=regions)
        for i, (r, t) in enumerate(zip(rs, ts)):
            names.append(f"b{b}r{i}")
            reads.append(r)
            truth.append((b, *t))
    batch = ReadBatch.from_reads(names, reads)
    raw = dis_map_batch(index, batch, opts)
    ranked = rank_matches(dedup_matches(raw), batch.n_reads,
                          strata_count=opts.strata_count)
    m = ranked.matches
    starts = index.contigs.bin_starts
    found = set(zip(m.read_id.tolist(), m.strand.tolist(), m.begin.tolist()))
    missed = []
    for rid, (b, p, strand, k) in enumerate(truth):
        if (rid, strand, int(starts[b]) + p) not in found:
            missed.append((names[rid], b, p, strand, k))
    assert not missed, f"{len(missed)} planted reads missed: {missed[:5]}"


def test_ibf_no_false_negatives_on_repeats(rich_db):
    """The k-mer lemma threshold must never filter out the true bin, even
    when reads come from tandem/N-adjacent regions (repeated k-mers hash to
    the same bits — counting distinct windows could undercount)."""
    rng = np.random.default_rng(13)
    genomes, anns, index = rich_db
    filt = index.filter
    for b, g in enumerate(genomes):
        regions = anns[b]["alu"] + anns[b]["tandem"]
        reads, ts = sample_reads(rng, g, 20, n_sub=2, regions=regions,
                                 rc_half=True)
        for r, (p, strand, k) in zip(reads, ts):
            e = 3   # error budget at 3% of 100bp
            # the k-mer lemma counts only HASHABLE windows: k-mers crossing
            # an N (in read or genome) are never inserted nor counted
            w = np.lib.stride_tricks.sliding_window_view(r, filt.k)
            n_hashable = int(((w < 4).all(axis=1)).sum())
            t = n_hashable - filt.k * e
            if t <= 0:
                continue
            bins = filt.which_bins(r, t)
            assert b in bins, f"bin {b} filtered out (read at {p}, {k} subs)"


def test_mesh_identical_on_repeat_rich(rich_db):
    """Cross-path determinism holds on repeat-rich data too (seed-interval
    blowups exercise overflow/drain paths uniform-random never hits)."""
    from dream_yara_tpu.parallel.dream_mesh import (MeshDreamMapper,
                                                    mesh_dream_sam)
    from dream_yara_tpu.pipeline.dis_mapper import dream_map_sam

    rng = np.random.default_rng(17)
    genomes, anns, index = rich_db
    names, reads = [], []
    for b in range(len(genomes)):
        regions = anns[b]["tandem"]
        rs, _ = sample_reads(rng, genomes[b], 10, regions=regions)
        reads.extend(rs)
        names.extend(f"m{b}_{i}" for i in range(len(rs)))
    batch = ReadBatch.from_reads(names, reads)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts)
    for nd in (2, 8):
        mapper = MeshDreamMapper(index, opts, n_devices=nd)
        assert mesh_dream_sam(mapper, batch) == ref, f"mesh({nd})"
