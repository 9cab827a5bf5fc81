"""Native C++ components vs NumPy oracles."""

import numpy as np
import pytest

from dream_yara_tpu.index.suffix_array import sa_numpy
from dream_yara_tpu.native import sais
from tests.conftest import random_text

pytestmark = pytest.mark.skipif(not sais.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("n", [0, 1, 2, 17, 500, 20000])
def test_sais_matches_numpy(rng, n):
    text = random_text(rng, n)
    assert np.array_equal(sais.suffix_array(text), sa_numpy(text))


def test_sais_with_sentinels_and_repeats(rng):
    text = random_text(rng, 5000)
    text[::41] = 5
    assert np.array_equal(sais.suffix_array(text), sa_numpy(text))
    uni = np.zeros(3000, dtype=np.int8)
    assert np.array_equal(sais.suffix_array(uni), sa_numpy(uni))
    per = np.tile(np.array([3, 1, 2], dtype=np.int8), 2000)
    assert np.array_equal(sais.suffix_array(per), sa_numpy(per))


def test_sais_byte255_fallback(rng):
    """Texts containing byte 255 can't use the +1-shifted uint8 fast path
    (dy_sais_u8_into returns -1); the binding must fall back to the general
    int32 engine and still be correct."""
    text = rng.integers(0, 256, 4000).astype(np.uint8)
    text[::17] = 255
    assert np.array_equal(sais.suffix_array(text), sa_numpy(text))


def test_sais_tmp_dir_external_memory(rng, tmp_path):
    """--tmp-dir mode: SA built into an unlinked OS-paged memmap must be
    identical to the in-RAM build, and leave no files behind."""
    text = random_text(rng, 20000)
    got = sais.suffix_array(text, tmp_dir=str(tmp_path))
    assert np.array_equal(got, sais.suffix_array(text))
    assert list(tmp_path.iterdir()) == []  # unlinked immediately


def test_sais_arbitrary_bytes(rng):
    """Full byte alphabet (no 255): exercises K=maxc+2 bucket sizing."""
    text = rng.integers(0, 255, 6000).astype(np.uint8)
    assert np.array_equal(sais.suffix_array(text), sa_numpy(text))


def test_build_dispatches_to_native(rng):
    from dream_yara_tpu.index.suffix_array import build_suffix_array
    text = random_text(rng, 1000)
    assert np.array_equal(build_suffix_array(text), sa_numpy(text))


def test_native_cigars_match_numpy(rng):
    """C++ CIGAR engine must be byte-identical to the NumPy engine."""
    from dream_yara_tpu.native import align as nat
    from dream_yara_tpu.pipeline.cigar import _cigars_block
    from tests.conftest import mutate

    if not nat.available():
        pytest.skip("align lib unavailable")
    text = random_text(rng, 4000)
    E = 5
    rows_l, lens_l, begs, ends_l, dists = [], [], [], [], []
    reads = np.full((60, 90), 4, dtype=np.int8)
    from dream_yara_tpu.ops.verify import banded_verify
    import jax.numpy as jnp
    anchors = []
    for i in range(60):
        p = int(rng.integers(0, 3800))
        r = mutate(rng, text[p : p + 80].copy(),
                   n_sub=int(rng.integers(0, 3)),
                   n_ins=int(rng.integers(0, 2)),
                   n_del=int(rng.integers(0, 2)))
        reads[i, : len(r)] = r
        lens_l.append(len(r))
        anchors.append(p)
    dist, beg, end = banded_verify(
        jnp.asarray(text), jnp.asarray(anchors, dtype=jnp.int32),
        jnp.asarray(reads), jnp.arange(60, dtype=jnp.int32),
        jnp.asarray(lens_l, dtype=jnp.int32), max_err=E)
    ok = np.asarray(dist) <= E
    rows_a = np.arange(60, dtype=np.int32)[ok]
    lens_a = np.array(lens_l, dtype=np.int32)[ok]
    begs_a = np.asarray(beg)[ok].astype(np.int64)
    ends_a = np.asarray(end)[ok].astype(np.int64)
    dists_a = np.asarray(dist)[ok].astype(np.int32)
    assert ok.sum() > 20
    want = _cigars_block(text, reads, rows_a, lens_a, begs_a, ends_a, E)
    got = nat.compute_cigars_native(text, reads, rows_a, lens_a, begs_a,
                                    ends_a, dists_a, E)
    # native uses the known-dist fast path; numpy block engine computes its
    # own — results must agree anyway
    assert got == want


def test_native_sam_formatter_matches_python(rng):
    from dream_yara_tpu.native import samfmt
    if not samfmt.available():
        pytest.skip("samfmt unavailable")
    from dream_yara_tpu.index.fmindex import FMIndex
    from dream_yara_tpu.io.readstore import ReadBatch
    from dream_yara_tpu.io.seqstore import SeqStore
    from dream_yara_tpu.pipeline.mapper import map_single_bin
    from dream_yara_tpu.pipeline.writer import _write_se_python, write_se_records
    from dream_yara_tpu.utils.alphabet import revcomp
    from dream_yara_tpu.utils.options import MapperOptions
    from tests.conftest import mutate

    seg = random_text(rng, 600)
    genome = np.concatenate([random_text(rng, 4000), seg, seg.copy()])
    store = SeqStore.from_seqs(["cA", "cB"], [genome[:2500], genome[2500:]])
    fm = FMIndex.build(store.text)
    reads = []
    for i in range(30):
        p = int(rng.integers(0, 5100))
        r = mutate(rng, store.text[p : p + 90].copy(), n_sub=2)
        if (r >= 4).any():
            r = random_text(rng, 90)
        if i % 2:
            r = revcomp(r)
        reads.append(r)
    reads.append(random_text(rng, 90))  # unmapped junk
    batch = ReadBatch.from_reads([f"r{i}" for i in range(31)], reads)
    opts = MapperOptions(error_rate=0.05, secondary_matches="tag")
    ranked, cigars, contigs = map_single_bin(store, fm, batch, opts)
    for mode in ("tag", "omit", "record"):
        want = _write_se_python(batch, contigs, ranked, cigars, mode)
        got = write_se_records(batch, contigs, ranked, cigars, mode)
        assert got == want, mode
    # read-group: both engines emit identical RG:Z tags (order NM, RG, XA)
    for mode in ("tag", "record"):
        want = _write_se_python(batch, contigs, ranked, cigars, mode,
                                read_group="lib1")
        got = write_se_records(batch, contigs, ranked, cigars, mode,
                               read_group="lib1")
        assert got == want, f"rg/{mode}"
        assert b"\tRG:Z:lib1" in got


def test_native_pe_formatter_matches_python(rng):
    from dream_yara_tpu.native import samfmt
    if not samfmt.available():
        pytest.skip("samfmt unavailable")
    from dream_yara_tpu.index.fmindex import FMIndex
    from dream_yara_tpu.io.readstore import ReadBatch
    from dream_yara_tpu.io.seqstore import SeqStore
    from dream_yara_tpu.pipeline.mapper import map_paired_bin
    from dream_yara_tpu.pipeline.writer import write_pe_records
    import dream_yara_tpu.pipeline.writer as W
    from dream_yara_tpu.utils.alphabet import revcomp
    from dream_yara_tpu.utils.options import MapperOptions
    from tests.conftest import mutate

    genome = random_text(rng, 20000)
    store = SeqStore.from_seqs(["c0", "c1"], [genome[:9000], genome[9000:]])
    fm = FMIndex.build(store.text)
    m1, m2 = [], []
    for i in range(16):
        t = 300
        p = int(rng.integers(0, 8000)) if i % 4 else int(rng.integers(9100, 19000))
        g = store.text
        r1 = mutate(rng, g[p : p + 100].copy(), n_sub=1)
        r2 = revcomp(mutate(rng, g[p + t - 100 : p + t].copy(), n_sub=1))
        if i == 5:
            r2 = random_text(rng, 100)   # unmapped mate
        if i == 6:
            r1 = random_text(rng, 100)
            r2 = random_text(rng, 100)   # fully unmapped pair
        m1.append(r1); m2.append(r2)
    batch = ReadBatch.from_reads([f"p{i}" for i in range(16)] * 2, m1 + m2,
                                 paired=True)
    opts = MapperOptions(error_rate=0.05, library_length=300,
                         library_deviation=60)
    ranked, cigars, contigs, pi = map_paired_bin(store, fm, batch, opts)
    for mode in ("tag", "omit", "record"):
        want = W.write_pe_records.__wrapped__(batch, contigs, ranked, cigars, pi, mode) \
            if hasattr(W.write_pe_records, "__wrapped__") else None
        # call the python path by monkeypatching availability
        import dream_yara_tpu.native.samfmt as sf
        orig = sf.available
        sf.available = lambda: False
        try:
            want = write_pe_records(batch, contigs, ranked, cigars, pi, mode)
        finally:
            sf.available = orig
        got = write_pe_records(batch, contigs, ranked, cigars, pi, mode)
        assert got == want, mode
    # read-group parity on the PE engines (covers mate-unmapped rows too)
    import dream_yara_tpu.native.samfmt as sf
    orig = sf.available
    sf.available = lambda: False
    try:
        want = write_pe_records(batch, contigs, ranked, cigars, pi, "tag",
                                read_group="run7")
    finally:
        sf.available = orig
    got = write_pe_records(batch, contigs, ranked, cigars, pi, "tag",
                           read_group="run7")
    assert got == want
    assert b"\tRG:Z:run7" in got


def test_native_formatter_long_contig_names(rng):
    """Regression: RNAME/RNEXT bytes must be counted in the output-buffer
    bound — a >95-char contig name used to overrun the heap buffer."""
    from dream_yara_tpu.native import samfmt
    if not samfmt.available():
        pytest.skip("samfmt unavailable")
    from dream_yara_tpu.index.fmindex import FMIndex
    from dream_yara_tpu.io.readstore import ReadBatch
    from dream_yara_tpu.io.seqstore import SeqStore
    from dream_yara_tpu.pipeline.mapper import map_single_bin
    from dream_yara_tpu.pipeline.writer import _write_se_python, write_se_records
    from dream_yara_tpu.utils.options import MapperOptions

    genome = random_text(rng, 3000)
    longname = "contig_" + "x" * 700
    store = SeqStore.from_seqs([longname], [genome])
    fm = FMIndex.build(store.text)
    reads = [store.text[p : p + 80].copy()
             for p in rng.integers(0, 2900, size=8)]
    batch = ReadBatch.from_reads([f"r{i}" for i in range(8)], reads)
    ranked, cigars, contigs = map_single_bin(
        store, fm, batch, MapperOptions(error_rate=0.05))
    want = _write_se_python(batch, contigs, ranked, cigars, "tag")
    got = write_se_records(batch, contigs, ranked, cigars, "tag")
    assert got == want
    assert longname.encode() in got


def test_packedstrs_roundtrip_and_gather():
    from dream_yara_tpu.utils.packedstrs import PackedStrs

    items = ["100M", "", "50M2I48M", "3S97M", ""]
    ps = PackedStrs.from_list(items)
    assert list(ps) == items
    assert ps[2] == "50M2I48M" and ps[-1] == ""
    assert ps == items  # list-equality protocol used by writer golden tests

    # gather with reordering, duplicates, and keep-masking
    idx = np.array([3, 0, 0, 2, 1])
    keep = np.array([True, False, True, True, True])
    buf, off = ps.gather(idx, keep)
    got = [buf[off[i]:off[i + 1]].tobytes().decode() for i in range(len(idx))]
    assert got == ["3S97M", "", "100M", "50M2I48M", ""]

    # negative (unmapped-sentinel) indices are safe when masked out
    buf, off = ps.gather(np.array([-1, 1]), np.array([False, False]))
    assert off.tolist() == [0, 0, 0] and buf.size == 0

    # all-empty gather
    buf, off = PackedStrs.from_list(["", ""]).gather(np.array([0, 1]))
    assert buf.size == 0 and off.tolist() == [0, 0, 0]


def test_native_readpack_matches_numpy(rng):
    """The C++ 2-bit packer is bit-identical to the numpy oracle for all
    word boundary cases: N/junk codes, short reads, pad rows, L not a
    multiple of 16 or 32."""
    import dream_yara_tpu.native.readpack as nrp
    import dream_yara_tpu.ops.readpack as rp

    if not nrp.available():
        pytest.skip("native readpack unavailable")
    for (k, half, L) in [(7, 8, 33), (100, 100, 150), (250, 256, 101),
                         (5, 9, 64), (3, 3, 16), (1, 4, 31)]:
        seqs = rng.integers(0, 6, (k, L)).astype(np.int8)  # incl. N=4, junk
        lengths = rng.integers(L // 2, L + 1, k).astype(np.int64)
        orig = nrp.available
        nrp.available = lambda: False          # force the numpy oracle
        try:
            p0, n0 = rp.pack_reads_fwd(seqs, half, L)
            b0 = rp.pack_blob_with_lengths(seqs, lengths, half, L)
        finally:
            nrp.available = orig
        p1, n1 = rp.pack_reads_fwd(seqs, half, L)
        b1 = rp.pack_blob_with_lengths(seqs, lengths, half, L)
        assert np.array_equal(p0, p1), (k, half, L)
        assert np.array_equal(n0, n1), (k, half, L)
        assert np.array_equal(b0, b1), (k, half, L)
