"""Multi-bin DREAM orchestration: routing, merge, dynamic update (configs 2/4)."""

import numpy as np
import pytest

from dream_yara_tpu.golden.golden_mapper import golden_map_se
from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.index.ibf import InterleavedBloomFilter
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.pipeline.dis_mapper import (
    DreamIndex, classify_reads, dis_map_batch, dream_map_sam,
)
from dream_yara_tpu.utils.alphabet import revcomp
from dream_yara_tpu.utils.options import MapperOptions
from tests.conftest import mutate, random_text


@pytest.fixture(scope="module")
def dream_db():
    rng = np.random.default_rng(21)
    B = 4
    genomes = [random_text(rng, 8000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"b{b}c0"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    ibf = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3, k=19)
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    return rng, genomes, DreamIndex(stores, fms, ibf, "bloom")


def planted_batch(rng, genomes, n_per_bin=6, read_len=100):
    names, reads, truth = [], [], []
    for b, g in enumerate(genomes):
        for i in range(n_per_bin):
            p = int(rng.integers(0, len(g) - read_len))
            r = mutate(rng, g[p : p + read_len].copy(), n_sub=2)
            strand = int(rng.random() < 0.5)
            if strand:
                r = revcomp(r)
            names.append(f"b{b}r{i}")
            reads.append(r)
            truth.append((b, p, strand))
    return ReadBatch.from_reads(names, reads), truth


def test_routing(dream_db):
    rng, genomes, index = dream_db
    batch, truth = planted_batch(rng, genomes)
    opts = MapperOptions(error_rate=0.03)
    routing = classify_reads(index, batch, opts)
    for rid, (b, p, strand) in enumerate(truth):
        assert routing[rid, b], f"read {rid} not routed to its bin {b}"
    # routing should be selective: on random genomes each read hits ~1 bin
    assert routing.sum() <= len(truth) * 2


def test_dis_map_global_coords(dream_db):
    rng, genomes, index = dream_db
    batch, truth = planted_batch(rng, genomes)
    opts = MapperOptions(error_rate=0.03)
    m = dis_map_batch(index, batch, opts)
    for rid, (b, p, strand) in enumerate(truth):
        sel = np.flatnonzero((m.read_id == rid) & (m.dist <= 2))
        glob = int(index.contigs.bin_starts[b]) + p
        assert any(int(m.begin[i]) == glob and int(m.strand[i]) == strand
                   for i in sel), f"read {rid}"


def test_dream_sam_rname(dream_db):
    rng, genomes, index = dream_db
    batch, truth = planted_batch(rng, genomes, n_per_bin=3)
    opts = MapperOptions(error_rate=0.03)
    sam = dream_map_sam(index, batch, opts).decode()
    recs = {l.split("\t")[0]: l.split("\t")
            for l in sam.strip().split("\n") if not l.startswith("@")}
    for rid, (b, p, strand) in enumerate(truth):
        r = recs[f"b{b}r{rid % 3}"] if False else recs[batch.names[rid]]
        assert r[2] == f"b{b}c0"
        assert int(r[3]) == p + 1
        assert (int(r[1]) & 0x10 != 0) == bool(strand)


def test_filter_none_equals_bloom(dream_db):
    """--filter-type none must give the identical match set (correctness mode)."""
    rng, genomes, index = dream_db
    batch, truth = planted_batch(rng, genomes, n_per_bin=2)
    opts = MapperOptions(error_rate=0.03)
    sam_bloom = dream_map_sam(index, batch, opts)
    index_none = DreamIndex(index.stores, index.fms, None, "none")
    index_none._bin_mappers = index._bin_mappers  # reuse device arrays
    sam_none = dream_map_sam(index_none, batch, opts)
    assert sam_bloom == sam_none


def test_dynamic_update(dream_db):
    """Config 4: replace one bin; other bins' results byte-stable."""
    rng, genomes, index = dream_db
    opts = MapperOptions(error_rate=0.03)
    batch, truth = planted_batch(rng, genomes, n_per_bin=4)
    sam_before = dream_map_sam(index, batch, opts)

    # replace bin 2 with a new genome
    new_g = random_text(rng, 8000)
    new_store = SeqStore.from_seqs(["b2c0"], [new_g])
    new_fm = FMIndex.build(new_store.text)
    ibf2 = InterleavedBloomFilter(
        bins=index.filter.bins, n_rows=index.filter.n_rows,
        n_hashes=index.filter.n_hashes, k=index.filter.k,
        words=index.filter.words.copy(),
        canonical=index.filter.canonical,  # hash mode must travel with words
        blocked=index.filter.blocked)
    ibf2.clear_bins([2])
    ibf2.add_kmers(new_g, 2)
    stores2 = list(index.stores); stores2[2] = new_store
    fms2 = list(index.fms); fms2[2] = new_fm
    index2 = DreamIndex(stores2, fms2, ibf2, "bloom")

    # reads planted in the NEW bin 2 map there now
    p = 1234
    r_new = new_g[p : p + 100]
    nb = ReadBatch.from_reads(["new"], [r_new])
    sam_new = dream_map_sam(index2, nb, opts).decode()
    rec = [l.split("\t") for l in sam_new.strip().split("\n")
           if not l.startswith("@")][0]
    assert rec[2] == "b2c0" and int(rec[3]) == p + 1

    # reads from untouched bins give byte-identical records
    sam_after = dream_map_sam(index2, batch, opts)
    rec_b = {l.split(b"\t")[0]: l for l in sam_before.splitlines()
             if not l.startswith(b"@")}
    rec_a = {l.split(b"\t")[0]: l for l in sam_after.splitlines()
             if not l.startswith(b"@")}
    for rid, (b, _, _) in enumerate(truth):
        if b != 2:
            name = batch.names[rid].encode()
            assert rec_a[name] == rec_b[name]


def test_metagenomic_skew():
    """Config-5 shape: many small bins, heavily skewed routing (90% of reads
    from one genome) — correctness and selective routing must hold."""
    rng = np.random.default_rng(55)
    B = 32
    sizes = [1500 + int(rng.integers(0, 3000)) for _ in range(B)]
    genomes = [random_text(rng, s) for s in sizes]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    ibf = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3, k=19)
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    index = DreamIndex(stores, fms, ibf, "bloom")

    names, reads, truth = [], [], []
    hot = 7
    for i in range(60):
        b = hot if i % 10 else int(rng.integers(0, B))   # 90% from bin `hot`
        g = genomes[b]
        p = int(rng.integers(0, len(g) - 100))
        r = mutate(rng, g[p : p + 100].copy(), n_sub=1)
        names.append(f"r{i}")
        reads.append(r)
        truth.append((b, p))
    batch = ReadBatch.from_reads(names, reads)
    opts = MapperOptions(error_rate=0.03)

    routing = classify_reads(index, batch, opts)
    # selective despite skew: vast majority of (read, bin) pairs pruned
    assert routing.sum() < 60 * 4
    sam = dream_map_sam(index, batch, opts).decode()
    recs = {l.split("\t")[0]: l.split("\t")
            for l in sam.splitlines() if not l.startswith("@")}
    correct = sum(1 for i, (b, p) in enumerate(truth)
                  if recs[f"r{i}"][2] == f"g{b}" and int(recs[f"r{i}"][3]) == p + 1)
    assert correct == len(truth)


def test_stream_error_propagates(dream_db):
    """An exception in the reader thread must surface to the consumer."""
    rng, genomes, index = dream_db
    opts = MapperOptions(error_rate=0.03)

    def bad_batches():
        batch, _ = planted_batch(rng, genomes, n_per_bin=1)
        yield batch
        raise RuntimeError("reader exploded")

    from dream_yara_tpu.pipeline.dis_mapper import dream_map_stream
    got = []
    with pytest.raises(RuntimeError, match="reader exploded"):
        for sam in dream_map_stream(index, bad_batches(), opts):
            got.append(sam)
    assert len(got) == 1  # the good batch was delivered first


def test_stream_multi_batch_order(dream_db):
    """Streamed batches come back in order with one header."""
    rng, genomes, index = dream_db
    opts = MapperOptions(error_rate=0.03)
    b1, t1 = planted_batch(rng, genomes, n_per_bin=1)
    b2, t2 = planted_batch(rng, genomes, n_per_bin=1)
    from dream_yara_tpu.pipeline.dis_mapper import dream_map_stream
    outs = list(dream_map_stream(index, iter([b1, b2]), opts))
    assert len(outs) == 2
    assert outs[0].startswith(b"@HD")
    assert not outs[1].startswith(b"@HD")
    first_names = [l.split(b"\t")[0].decode() for l in outs[0].splitlines()
                   if not l.startswith(b"@")]
    assert first_names == b1.names


def test_stream_finisher_pool_identical(dream_db, monkeypatch):
    """The ordered finisher pool (DY_FINISH_WORKERS>1) yields byte-identical
    SAM in batch order vs serial finishing, across several batches."""
    rng, genomes, index = dream_db
    opts = MapperOptions(error_rate=0.03)
    from dream_yara_tpu.pipeline.dis_mapper import dream_map_stream
    batches = [planted_batch(rng, genomes, n_per_bin=2)[0] for _ in range(5)]
    monkeypatch.setenv("DY_FINISH_WORKERS", "1")
    serial = list(dream_map_stream(index, iter(batches), opts))
    monkeypatch.setenv("DY_FINISH_WORKERS", "3")
    pooled = list(dream_map_stream(index, iter(batches), opts))
    assert serial == pooled


def test_dream_equals_monolithic(dream_db):
    """The paper's validation method (SURVEY.md §4): the B-bin DREAM run must
    produce the identical SAM to a single monolithic index over the
    concatenated database."""
    rng, genomes, index = dream_db
    batch, truth = planted_batch(rng, genomes, n_per_bin=3)
    opts = MapperOptions(error_rate=0.03)

    # monolithic: one store holding every contig in bin order — the
    # concatenated text is byte-identical to the DREAM global text
    names = [n for st in index.stores for n in st.names]
    seqs = []
    for b, st in enumerate(index.stores):
        for c in range(st.n_contigs):
            o = int(st.offsets[c])
            seqs.append(st.text[o : o + int(st.lengths[c])])
    mono_store = SeqStore.from_seqs(names, seqs)
    assert np.array_equal(mono_store.text, index.global_text)
    mono_fm = FMIndex.build(mono_store.text)
    mono = DreamIndex([mono_store], [mono_fm], None, "none")

    sam_dream = dream_map_sam(index, batch, opts)
    sam_mono = dream_map_sam(mono, batch, opts)
    assert sam_dream == sam_mono


def test_minimizer_filter_end_to_end(dream_db):
    """DREAM run with a minimizer IBF (w > k): planted reads still map to
    their true bins/positions, and routing stays selective."""
    rng, genomes, index = dream_db
    B = len(genomes)
    ibf = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3,
                                        k=19, window=27)
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    index_m = DreamIndex(index.stores, index.fms, ibf, "bloom")
    batch, truth = planted_batch(rng, genomes)
    opts = MapperOptions(error_rate=0.03)
    routing = classify_reads(index_m, batch, opts)
    for rid, (b, p, strand) in enumerate(truth):
        assert routing[rid, b], f"read {rid} not routed to bin {b}"
    assert routing.sum() <= 2 * len(truth), "minimizer routing not selective"
    m = dis_map_batch(index_m, batch, opts)
    starts = index_m.contigs.bin_starts
    found = set(zip(m.read_id.tolist(), m.strand.tolist(), m.begin.tolist()))
    for rid, (b, p, strand) in enumerate(truth):
        assert (rid, strand, int(starts[b]) + p) in found, f"read {rid}"


def test_minimizer_filter_calibrated_table_end_to_end(dream_db):
    """Same as above but with the calibrated slack table stored in the
    artifact (the production minimizer config): planted reads still route
    and map, and the tighter threshold is no less selective than the
    heuristic's."""
    rng, genomes, index = dream_db
    B = len(genomes)
    ibf = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3,
                                        k=19, window=27)
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    ibf.calibrate(e_max=4, trials=300, read_lens=(100,))
    assert ibf.slack_table is not None and ibf.slack_table[0] == 0
    index_m = DreamIndex(index.stores, index.fms, ibf, "bloom")
    batch, truth = planted_batch(rng, genomes)
    opts = MapperOptions(error_rate=0.03)
    routing = classify_reads(index_m, batch, opts)
    for rid, (b, p, strand) in enumerate(truth):
        assert routing[rid, b], f"read {rid} not routed to bin {b}"
    # calibrated threshold is >= the heuristic's, so routing can only shrink
    ibf_h = InterleavedBloomFilter(bins=ibf.bins, n_rows=ibf.n_rows,
                                   n_hashes=ibf.n_hashes, k=ibf.k,
                                   words=ibf.words, window=ibf.window,
                                   canonical=ibf.canonical,
                                   blocked=ibf.blocked)
    index_h = DreamIndex(index.stores, index.fms, ibf_h, "bloom")
    routing_h = classify_reads(index_h, batch, opts)
    assert routing.sum() <= routing_h.sum()
    m = dis_map_batch(index_m, batch, opts)
    starts = index_m.contigs.bin_starts
    found = set(zip(m.read_id.tolist(), m.strand.tolist(), m.begin.tolist()))
    for rid, (b, p, strand) in enumerate(truth):
        assert (rid, strand, int(starts[b]) + p) in found, f"read {rid}"
