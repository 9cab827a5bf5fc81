"""Mesh DREAM pipeline on the virtual 8-device CPU mesh (SURVEY.md §4.3):
classify -> route -> map -> merge -> SAM, byte-identical to the single-device
pipeline for any mesh shape, with every fixed capacity overflow-safe."""

import numpy as np
import pytest

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.index.ibf import InterleavedBloomFilter
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.parallel.dream_mesh import MeshDreamMapper, mesh_dream_sam
from dream_yara_tpu.parallel.mesh import make_mesh, mesh_factors
from dream_yara_tpu.pipeline.dis_mapper import DreamIndex, dream_map_sam
from dream_yara_tpu.utils.alphabet import revcomp
from dream_yara_tpu.utils.options import MapperOptions
from tests.conftest import mutate, random_text


def test_mesh_factors():
    assert mesh_factors(8, 4) == (2, 4)
    assert mesh_factors(8, 64) == (1, 8)
    assert mesh_factors(8, 1) == (8, 1)
    assert mesh_factors(4, 3) == (4 // 2, 2) or mesh_factors(4, 3)[1] <= 3


def _make_db(rng, B, glen=6000, with_filter=True):
    genomes = [random_text(rng, glen) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    filt = None
    if with_filter:
        filt = InterleavedBloomFilter.create(B, size_bits=1 << 22,
                                             n_hashes=3, k=19)
        for b, g in enumerate(genomes):
            filt.add_kmers(g, b)
    return genomes, DreamIndex(stores, fms, filt,
                               "bloom" if with_filter else "none")


def _planted(rng, genomes, n_per_bin=6, read_len=100, n_sub=2):
    names, reads, truth = [], [], []
    for b, g in enumerate(genomes):
        for i in range(n_per_bin):
            p = int(rng.integers(0, len(g) - read_len))
            r = mutate(rng, g[p : p + read_len].copy(), n_sub=n_sub)
            strand = int(rng.random() < 0.5)
            if strand:
                r = revcomp(r)
            names.append(f"b{b}r{i}")
            reads.append(r)
            truth.append((b, p, strand))
    return ReadBatch.from_reads(names, reads), truth


@pytest.fixture(scope="module")
def db_and_reads():
    rng = np.random.default_rng(31)
    genomes, index = _make_db(rng, B=4)
    batch, truth = _planted(rng, genomes)
    return genomes, index, batch, truth


def test_mesh_finds_planted(db_and_reads):
    genomes, index, batch, truth = db_and_reads
    opts = MapperOptions(error_rate=0.03)
    mapper = MeshDreamMapper(index, opts, n_devices=8)
    m = mapper.map_batch(batch)
    starts = index.contigs.bin_starts
    found = set(zip(m.read_id.tolist(), m.strand.tolist(), m.begin.tolist()))
    for rid, (b, p, strand) in enumerate(truth):
        assert (rid, strand, int(starts[b]) + p) in found, f"read {rid}"


def test_mesh_sam_identical_to_single_device(db_and_reads):
    """The determinism contract (SURVEY.md §4.4): byte-identical SAM for any
    mesh shape, including the single-device DREAM pipeline."""
    genomes, index, batch, truth = db_and_reads
    opts = MapperOptions(error_rate=0.03, secondary_matches="tag")
    ref = dream_map_sam(index, batch, opts)
    for nd in (1, 2, 4, 8):
        mapper = MeshDreamMapper(index, opts, n_devices=nd)
        sam = mesh_dream_sam(mapper, batch)
        assert sam == ref, f"mesh({nd} devices) SAM differs"


def test_mesh_routing_is_selective(db_and_reads):
    """Capacity routing must realize the IBF saving: with 4 bins of random
    sequence, the per-bin routed sets are ~n/B, not n (the dense
    cross-product the round-1 mesh used)."""
    genomes, index, batch, truth = db_and_reads
    opts = MapperOptions(error_rate=0.03)
    mapper = MeshDreamMapper(index, opts, n_devices=8)
    assert mapper.use_filter
    # auto r_cap is sized from the routing rate, far below n_loc for B=4
    from dream_yara_tpu.parallel.dist_mapper import pack_batch_blob
    _, half_loc = pack_batch_blob(batch.seqs[:batch.n_reads], batch.lengths,
                                  mapper.data_ax, batch.max_len)
    assert mapper._r_cap(half_loc) < half_loc or half_loc <= 64


def test_mesh_route_overflow_fallback(db_and_reads):
    """Undersized routing capacity must never drop reads: force r_cap=1 and
    require byte-identical SAM. Route overflow drains through extra mesh
    passes (routing-override input, config-5 skew tolerance); anything past
    the drain budget re-maps on the host."""
    genomes, index, batch, truth = db_and_reads
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts)
    mapper = MeshDreamMapper(index, opts, n_devices=8, r_cap=1)
    from dream_yara_tpu.utils.timer import StageTimers
    timers = StageTimers()
    sam = mesh_dream_sam(mapper, batch, timers=timers)
    assert sam == ref
    drained = mapper.fallback_diag.get("drain_passes", 0)
    assert drained > 0 or any("fallback" in k for k in timers.totals), \
        "r_cap=1 should have drained route overflow or host-fallen-back"
    assert mapper.fallback_diag["route_ovf"] > 0


def test_mesh_skewed_routing_drain_and_autotune():
    """Config-5 shape: a metagenomic database where one bin dominates the
    routing (90% of reads). The shared slot pool absorbs skew up to its
    capacity; beyond it, overflow must drain through extra mesh passes (not
    host re-maps), stay byte-identical to the single-device pipeline, and
    auto-grow the pool for subsequent batches."""
    rng = np.random.default_rng(41)
    B = 16
    genomes = [random_text(rng, 3000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    filt = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3,
                                         k=19)
    for b, g in enumerate(genomes):
        filt.add_kmers(g, b)
    index = DreamIndex(stores, fms, filt, "bloom")
    n_reads = 1024   # hot device routed ~0.9*1024 > default pool (256)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        names, reads = [], []
        for i in range(n_reads):
            b = 0 if i % 10 < 9 else int(r.integers(1, B))   # 90% -> bin 0
            p = int(r.integers(0, 2900))
            rd = mutate(rng, genomes[b][p : p + 100].copy(), n_sub=1)
            names.append(f"s{seed}r{i}")
            reads.append(rd)
        return ReadBatch.from_reads(names, reads)

    opts = MapperOptions(error_rate=0.03)
    mapper = MeshDreamMapper(index, opts, n_devices=8)
    b1 = make_batch(1)
    sam1 = mesh_dream_sam(mapper, b1)
    assert sam1 == dream_map_sam(index, b1, opts)
    diag = mapper.fallback_diag
    assert diag["route_ovf"] > 0 and diag["drain_passes"] > 0, diag
    assert getattr(mapper, "_tuned_r_cap", 0) > 0, \
        "persistent overflow should auto-grow the slot pool"
    # second batch runs at the grown pool and needs fewer drain passes
    d0 = diag["drain_passes"]
    b2 = make_batch(2)
    sam2 = mesh_dream_sam(mapper, b2, header=True)
    assert sam2 == dream_map_sam(index, b2, opts)
    assert diag["drain_passes"] - d0 < d0


def test_mesh_seed_overflow_fallback():
    """Hyper-repetitive bins overflow the per-seed hit capacity; the mesh
    path must surface it and converge to the single-device output."""
    rng = np.random.default_rng(77)
    B = 2
    unit = random_text(rng, 40)
    tandem = np.tile(unit, 60)  # 60 copies -> every seed overflows cap=8
    plain = random_text(rng, 2400)
    genomes = [tandem, plain]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    index = DreamIndex(stores, fms, None, "none")
    reads = [np.tile(unit, 3)[:80].copy(), plain[100:180].copy()]
    batch = ReadBatch.from_reads(["rep", "plain"], reads)
    for sens in ("full", "high", "low"):
        opts = MapperOptions(error_rate=0.03, sensitivity=sens)
        ref = dream_map_sam(index, batch, opts)
        mapper = MeshDreamMapper(index, opts, n_devices=8)
        sam = mesh_dream_sam(mapper, batch)
        assert sam == ref, f"sensitivity={sens}"
        if sens == "full":
            # the tandem read's ~40 distinct anchors exceed the verify-lane
            # budget (compact_cap ~ 2/row): the spill fallback MUST fire —
            # this is the coverage for MapStepOut.n_spilled handling
            assert mapper.fallback_diag["spill_bins"] > 0, \
                mapper.fallback_diag


def test_mesh_lean_device_set_identical():
    """lean=True drops the bwt/occ uploads (the flat step never reads
    them); output must stay byte-identical, including the sampled-SA
    fused-row locate path."""
    rng = np.random.default_rng(31)
    B = 4
    genomes = [random_text(rng, 4000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text, sample_rate=8) for st in stores]
    filt = InterleavedBloomFilter.create(B, size_bits=1 << 22)
    for b, g in enumerate(genomes):
        filt.add_kmers(g, b)
    index = DreamIndex(stores, fms, filt, "bloom")
    batch, _ = _planted(rng, genomes, n_per_bin=4)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts)
    mapper = MeshDreamMapper(index, opts, n_devices=8, lean=True)
    assert mapper.fmset.bwt_blocks.shape[1] == 1  # placeholder only
    assert mesh_dream_sam(mapper, batch) == ref


def test_mesh_kmer_direct_identical():
    """kmer_direct prefilter through the mesh pipeline: identity-addressed
    device classify (regression: fmix-hashed kdx rows routed nothing)."""
    from dream_yara_tpu.index.kdx import DirectKmerFilter

    rng = np.random.default_rng(23)
    B = 4
    genomes = [random_text(rng, 4000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    kdx = DirectKmerFilter.create(B, k=12)
    for b, g in enumerate(genomes):
        kdx.add_kmers(g, b)
    index = DreamIndex(stores, fms, kdx, "kmer_direct")
    batch, _ = _planted(rng, genomes, n_per_bin=4)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts)
    mapper = MeshDreamMapper(index, opts, n_devices=8)
    assert mapper.use_filter and mapper.direct
    assert mesh_dream_sam(mapper, batch) == ref
    n_mapped = sum(1 for l in ref.splitlines()
                   if l and not l.startswith(b"@")
                   and int(l.split(b"\t")[1]) & 4 == 0)
    assert n_mapped == batch.n_reads


def test_mesh_sampled_sa_identical():
    """sample_rate > 1 bins through the flat mesh step (fused-row LF-walk
    locate) must match the single-device pipeline byte-for-byte."""
    rng = np.random.default_rng(13)
    B = 4
    genomes = [random_text(rng, 4000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text, sample_rate=4) for st in stores]
    index = DreamIndex(stores, fms, None, "none")
    batch, _ = _planted(rng, genomes, n_per_bin=4)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts)
    mapper = MeshDreamMapper(index, opts, n_devices=8)
    assert mesh_dream_sam(mapper, batch) == ref


def test_mesh_sampled_sa_loc_cap_spill_identical(monkeypatch):
    """A locate-compaction pool too small for the hit load (DY_CAP2L) must
    spill through the per-seed overflow -> exhaustive host re-map path and
    still produce byte-identical SAM (flat_step compacts valid lanes before
    the sampled-SA LF walk; dropped lanes may NOT be silently lost)."""
    rng = np.random.default_rng(14)
    B = 2
    # tandem repeats -> wide SA intervals -> many lanes per seed
    unit = random_text(rng, 60)
    genomes = [np.concatenate([unit] * 40 + [random_text(rng, 2000)]),
               random_text(rng, 4000)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text, sample_rate=4) for st in stores]
    index = DreamIndex(stores, fms, None, "none")
    batch, _ = _planted(rng, genomes, n_per_bin=6)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts)
    monkeypatch.setenv("DY_CAP2L", "0.02")   # loc_cap ~ a handful of lanes
    mapper = MeshDreamMapper(index, opts, n_devices=4)
    assert mesh_dream_sam(mapper, batch) == ref


def test_mesh_lean_mass_spill_identical(monkeypatch):
    """Regression: the LEAN device set (config-3 default) + mass locate
    spill. The seed-overflow fallback re-maps through the single-chip
    BinMapper on a lean DeviceFMSet slice whose raw bwt/occ are
    placeholders — the sampled locate walk must therefore use the fused
    rank rows; the raw-rank walk silently lost every hit whose SA row was
    not directly marked (~(1-1/rate) of them)."""
    rng = np.random.default_rng(15)
    B = 2
    unit = random_text(rng, 60)
    genomes = [np.concatenate([unit] * 40 + [random_text(rng, 2000)]),
               random_text(rng, 4000)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text, sample_rate=4) for st in stores]
    index = DreamIndex(stores, fms, None, "none")
    batch, _ = _planted(rng, genomes, n_per_bin=6)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts)
    monkeypatch.setenv("DY_CAP2L", "0.02")
    mapper = MeshDreamMapper(index, opts, n_devices=4, lean=True)
    sam = mesh_dream_sam(mapper, batch)
    assert mapper.fallback_diag["seed_ovf"] > 0   # the spill path engaged
    assert sam == ref


def test_mesh_pe_identical(db_and_reads):
    """PE mode (pairing + rescue) through the mesh matches single-device."""
    genomes, index, batch_se, truth = db_and_reads
    rng = np.random.default_rng(5)
    m1, m2 = [], []
    for b, g in enumerate(genomes):
        for i in range(3):
            p = int(rng.integers(0, len(g) - 400))
            r1 = mutate(rng, g[p : p + 100].copy(), n_sub=1)
            r2 = revcomp(mutate(rng, g[p + 200 : p + 300].copy(), n_sub=1))
            if b == 0 and i == 0:
                r2 = random_text(rng, 100)  # unmapped mate -> rescue path
            m1.append(r1)
            m2.append(r2)
    names = [f"p{i}" for i in range(len(m1))]
    batch = ReadBatch.from_reads(names * 2, m1 + m2, paired=True)
    opts = MapperOptions(error_rate=0.03, library_length=300,
                         library_deviation=60)
    ref = dream_map_sam(index, batch, opts)
    mapper = MeshDreamMapper(index, opts, n_devices=8)
    sam = mesh_dream_sam(mapper, batch)
    assert sam == ref


def test_mesh_no_filter_dense(db_and_reads):
    """filter_type none -> every read maps against every bin (baseline
    correctness mode), still identical to single-device."""
    genomes, index, batch, truth = db_and_reads
    index_none = DreamIndex(index.stores, index.fms, None, "none")
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index_none, batch, opts)
    mapper = MeshDreamMapper(index_none, opts, n_devices=8)
    assert mesh_dream_sam(mapper, batch) == ref


def test_mesh_stream_matches_per_batch(db_and_reads):
    """mesh_dream_stream (device/host-overlapped) yields the same SAM bytes
    as per-batch mesh_dream_sam calls, headers and stats included."""
    from dream_yara_tpu.parallel.dream_mesh import mesh_dream_stream

    genomes, index, batch, truth = db_and_reads
    rng = np.random.default_rng(77)
    b2, _ = _planted(rng, genomes, n_per_bin=4)
    opts = MapperOptions(error_rate=0.03, secondary_matches="tag")
    mapper = MeshDreamMapper(index, opts, n_devices=4)
    stats_ref: dict = {}
    ref = [mesh_dream_sam(mapper, batch, header=True, stats=stats_ref),
           mesh_dream_sam(mapper, b2, header=False, stats=stats_ref)]
    stats_st: dict = {}
    got = list(mesh_dream_stream(mapper, [batch, b2], stats=stats_st))
    assert got == ref
    assert stats_st == stats_ref


@pytest.fixture(scope="module")
def cassette_db():
    """4 bins sharing a 400bp cassette: reads from the cassette are
    co-optimal in every bin, exercising cross-bin XA/secondary merge
    ordering, strata reporting, and the MAPQ co-optimal path."""
    rng = np.random.default_rng(97)
    cassette = random_text(rng, 400)
    genomes = []
    for b in range(4):
        g = random_text(rng, 6000)
        g[1000 + 37 * b : 1400 + 37 * b] = cassette
        genomes.append(g)
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(4)]
    fms = [FMIndex.build(st.text) for st in stores]
    filt = InterleavedBloomFilter.create(4, size_bits=1 << 22, n_hashes=3,
                                         k=19)
    for b, g in enumerate(genomes):
        filt.add_kmers(g, b)
    index = DreamIndex(stores, fms, filt, "bloom")
    names, reads = [], []
    # cassette reads (co-optimal in all 4 bins) at 0 and 1 errors
    for i in range(6):
        p = 1000 + 30 * i
        r = genomes[0][p : p + 100].copy()
        if i % 2:
            r = mutate(rng, r, n_sub=1)
        if i % 3 == 0:
            r = revcomp(r)
        names.append(f"cas{i}")
        reads.append(r)
    # unique reads, 0-2 errors (sub-optimal strata candidates)
    for b, g in enumerate(genomes):
        for i in range(3):
            p = int(rng.integers(2200, len(g) - 100))
            r = mutate(rng, g[p : p + 100].copy(), n_sub=i)
            names.append(f"u{b}_{i}")
            reads.append(r)
    # planted sub-optimal sites: genome 2 holds 1-mismatch copies of
    # genome-0 segments, so exact reads of those segments have a 0-error
    # best site and a 1-error sub-optimal site (visible only at -s >= 1)
    for i in range(4):
        p = 1600 + 120 * i
        seg = genomes[0][p : p + 100].copy()
        sub = seg.copy()
        sub[50] = (sub[50] + 1) % 4
        genomes[2][1600 + 120 * i : 1700 + 120 * i] = sub
        names.append(f"sub{i}")
        reads.append(seg)
    # rebuild bin 2's store/index/filter column over the edited genome
    stores[2] = SeqStore.from_seqs(["g2"], [genomes[2]])
    fms[2] = FMIndex.build(stores[2].text)
    filt.clear_bins([2])
    filt.add_kmers(genomes[2], 2)
    index = DreamIndex(stores, fms, filt, "bloom")
    return index, ReadBatch.from_reads(names, reads)


@pytest.mark.parametrize("sm", ["tag", "record", "omit"])
@pytest.mark.parametrize("s", [0, 1])
def test_mesh_option_matrix_identical(cassette_db, sm, s):
    """VERDICT r2 item 4: -s > 0 and every -sm mode must be byte-identical
    across the single-device and mesh paths (previously only defaults were
    cross-path tested). On divergence, samdiff localizes the field."""
    index, batch = cassette_db
    opts = MapperOptions(error_rate=0.03, strata_count=s,
                         secondary_matches=sm)
    ref = dream_map_sam(index, batch, opts)
    # the option must actually change the output (non-vacuous coverage)
    body = [l for l in ref.splitlines() if l and not l.startswith(b"@")]
    n_sec = sum(1 for l in body if int(l.split(b"\t")[1]) & 0x100)
    has_xa = any(b"XA:Z:" in l for l in body)
    if sm == "record":
        assert n_sec > 0, "cassette reads must produce secondary records"
    elif sm == "tag":
        assert has_xa and n_sec == 0
    else:
        assert not has_xa and n_sec == 0
    for nd in (2, 8):
        mapper = MeshDreamMapper(index, opts, n_devices=nd)
        sam = mesh_dream_sam(mapper, batch)
        if sam != ref:
            from dream_yara_tpu.io.samdiff import diff_sam

            d = diff_sam(sam, ref)
            raise AssertionError(
                f"mesh({nd}) differs (sm={sm}, s={s}):\n"
                + d.report("mesh", "single"))


def test_strata_count_widens_reporting(cassette_db):
    """-s 1 must report strictly more (or equal) sites than -s 0 and
    include sub-optimal matches one error above the best stratum."""
    index, batch = cassette_db
    sam0 = dream_map_sam(index, batch,
                         MapperOptions(error_rate=0.03, strata_count=0,
                                       secondary_matches="record"))
    sam1 = dream_map_sam(index, batch,
                         MapperOptions(error_rate=0.03, strata_count=1,
                                       secondary_matches="record"))
    def mapped_sites(sam):
        return [l.decode().split("\t")[:4] for l in sam.splitlines()
                if l and not l.startswith(b"@")
                and l.split(b"\t")[2] != b"*"]

    n0, n1 = len(mapped_sites(sam0)), len(mapped_sites(sam1))
    assert n1 > n0, (n0, n1)
    # the widened records include the planted 1-error copies in bin 2 (g2)
    sub1 = [s for s in mapped_sites(sam1) if s[0].startswith("sub")
            and s[2] == "g2"]
    assert len(sub1) >= 4, sub1


def test_mesh_minimizer_calibrated_identical(db_and_reads):
    """Minimizer filter + calibrated slack table on the mesh path: SAM
    byte-identical to the single-device pipeline (same table, same
    thresholds on both paths)."""
    genomes, index, batch, truth = db_and_reads
    B = len(genomes)
    filt = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3,
                                         k=19, window=27)
    for b, g in enumerate(genomes):
        filt.add_kmers(g, b)
    filt.calibrate(e_max=4, trials=200, read_lens=(100,))
    index_m = DreamIndex(index.stores, index.fms, filt, "bloom")
    opts = MapperOptions(error_rate=0.03, secondary_matches="tag")
    ref = dream_map_sam(index_m, batch, opts)
    mapper = MeshDreamMapper(index_m, opts, n_devices=8)
    got = mesh_dream_sam(mapper, batch)
    assert got == ref
    starts = index_m.contigs.bin_starts
    m = mapper.map_batch(batch)
    found = set(zip(m.read_id.tolist(), m.strand.tolist(), m.begin.tolist()))
    for rid, (b, p, strand) in enumerate(truth):
        assert (rid, strand, int(starts[b]) + p) in found, f"read {rid}"


def test_cap_autotune_identical(monkeypatch):
    """Locate/verify cap auto-tuning: after the first batch the mesh step
    rebuilds with caps shrunk to observed demand (margin + quantum), and
    later batches stay byte-identical to the single-device pipeline."""
    monkeypatch.delenv("DY_CAP2L", raising=False)
    monkeypatch.delenv("DY_CAP2V", raising=False)
    rng = np.random.default_rng(91)
    B = 4
    genomes = [random_text(rng, 4000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text, sample_rate=4) for st in stores]
    index = DreamIndex(stores, fms, None, "none")
    opts = MapperOptions(error_rate=0.03)
    mapper = MeshDreamMapper(index, opts, n_devices=8, lean=True)
    assert mapper._caps() == (4.0, 1.25)          # defaults pre-observation
    b1, _ = _planted(rng, genomes, n_per_bin=6)
    b2, _ = _planted(rng, genomes, n_per_bin=6)
    assert mesh_dream_sam(mapper, b1) == dream_map_sam(index, b1, opts)
    cap2l, cap2v = mapper._caps()
    assert cap2l <= 4.0 and cap2v <= 1.25
    assert mapper._seen_loc_f is not None and mapper._seen_loc_f > 0
    # tuned caps respect margin * observed demand
    assert cap2l >= mapper._seen_loc_f * mapper._MARGIN_L - mapper._Q
    assert mesh_dream_sam(mapper, b2) == dream_map_sam(index, b2, opts)
    # a fixed env knob pins the cap (tuning disabled for that knob)
    monkeypatch.setenv("DY_CAP2L", "3.5")
    assert mapper._caps()[0] == 3.5
