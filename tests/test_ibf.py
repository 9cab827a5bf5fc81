import numpy as np
import pytest

from dream_yara_tpu.index.hashing import kmer_windows
from dream_yara_tpu.index.ibf import InterleavedBloomFilter
from dream_yara_tpu.index.kdx import DirectKmerFilter
from tests.conftest import random_text


def test_kmer_windows(rng):
    codes = random_text(rng, 50)
    lo, hi, valid = kmer_windows(codes, 19)
    assert len(lo) == 32
    assert valid.all()
    # manual check of window 0 packing
    expect_lo = sum(int(codes[t]) << (2 * t) for t in range(16)) & 0xFFFFFFFF
    expect_hi = sum(int(codes[t]) << (2 * (t - 16)) for t in range(16, 19))
    assert lo[0] == expect_lo and hi[0] == expect_hi
    codes[25] = 4  # N invalidates windows covering position 25
    _, _, valid = kmer_windows(codes, 19)
    assert not valid[7:26].any()
    assert valid[:7].all() and valid[26:].all()


def test_ibf_no_false_negatives(rng):
    bins = 8
    ibf = InterleavedBloomFilter.create(bins, size_bits=1 << 18, n_hashes=3, k=19)
    seqs = [random_text(rng, 500) for _ in range(bins)]
    for b, s in enumerate(seqs):
        ibf.add_kmers(s, b)
    for b, s in enumerate(seqs):
        # every k-mer of bin b's sequence must be found in bin b
        counts = ibf.bin_counts(s)
        assert counts[b] == 500 - 19 + 1
        # a read drawn from bin b passes the threshold for bin b
        read = s[100:200]
        t = ibf.threshold(100, 19, errors=3)
        assert b in ibf.which_bins(read, t)


def test_ibf_rejects_unrelated(rng):
    ibf = InterleavedBloomFilter.create(4, size_bits=1 << 20, n_hashes=3, k=19)
    ibf.add_kmers(random_text(rng, 1000), 0)
    alien = random_text(rng, 100)
    t = ibf.threshold(100, 19, errors=3)
    # with a roomy filter, an unrelated read should miss (statistically certain)
    assert len(ibf.which_bins(alien, t)) == 0


def test_ibf_clear_and_update(rng):
    bins = 4
    ibf = InterleavedBloomFilter.create(bins, size_bits=1 << 18, n_hashes=2, k=15)
    seqs = [random_text(rng, 300) for _ in range(bins)]
    for b, s in enumerate(seqs):
        ibf.add_kmers(s, b)
    before_other = ibf.bin_counts(seqs[2]).copy()
    ibf.clear_bins([1])
    assert ibf.bin_counts(seqs[1])[1] == 0
    # other bins' columns untouched (column 1 may legitimately change)
    keep = [0, 2, 3]
    assert np.array_equal(ibf.bin_counts(seqs[2])[keep], before_other[keep])
    new_seq = random_text(rng, 300)
    ibf.add_kmers(new_seq, 1)
    assert ibf.bin_counts(new_seq)[1] == 300 - 15 + 1


def test_ibf_save_load(rng, tmp_path):
    ibf = InterleavedBloomFilter.create(4, size_bits=1 << 16, n_hashes=2, k=13)
    ibf.add_kmers(random_text(rng, 200), 3)
    ibf.save(tmp_path / "f")
    ibf2 = InterleavedBloomFilter.load(tmp_path / "f")
    assert ibf2.k == 13 and ibf2.bins == 4
    assert np.array_equal(ibf2.words, ibf.words)


def test_kdx_exact(rng):
    kdx = DirectKmerFilter.create(4, k=10)
    seqs = [random_text(rng, 200) for _ in range(4)]
    for b, s in enumerate(seqs):
        kdx.add_kmers(s, b)
    for b, s in enumerate(seqs):
        assert kdx.bin_counts(s)[b] == 200 - 10 + 1
    # exactness: a k-mer not inserted is never reported
    probe = random_text(rng, 10)
    present = any(
        bytes(probe) in bytes(s[i : i + 10])
        for s in seqs for i in range(0, 191))
    counts = kdx.bin_counts(probe)
    if not present:
        assert counts.sum() == 0


def test_threshold_lemma():
    assert InterleavedBloomFilter.threshold(100, 19, 3) == 100 - 19 + 1 - 57
    assert InterleavedBloomFilter.threshold(20, 19, 3) == 1  # floored


# --- minimizer mode (reference build_filter winnowing [U,M]) --------------

def test_minimizer_selection_density_and_determinism(rng):
    from dream_yara_tpu.index.hashing import kmer_windows, minimizer_select

    codes = random_text(rng, 5000)
    k, w = 19, 27
    lo, hi, valid = kmer_windows(codes, k)
    sel = minimizer_select(lo, hi, valid, w, k)
    # winnowing density ~ 2/(w-k+2): expect a 2.5-6x reduction
    assert valid.sum() / 6 < sel.sum() < valid.sum() / 2.5
    sel2 = minimizer_select(lo, hi, valid, w, k)
    assert np.array_equal(sel, sel2)
    # every w-window contains at least one selected k-mer
    W0 = w - k + 1
    for j in range(0, len(sel) - W0 + 1, 97):
        assert sel[j : j + W0].any()


def test_minimizer_ibf_routes_mutated_reads(rng):
    from dream_yara_tpu.index.ibf import InterleavedBloomFilter

    B = 4
    k, w = 19, 27
    genomes = [random_text(rng, 6000) for _ in range(B)]
    ibf = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3,
                                        k=k, window=w)
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    hits = 0
    trials = 0
    for b, g in enumerate(genomes):
        for i in range(20):
            p = int(rng.integers(0, 5900))
            r = g[p : p + 100].copy()
            for _ in range(3):  # e = 3 substitutions
                j = int(rng.integers(0, 100))
                r[j] = (r[j] + int(rng.integers(1, 4))) % 4
            t = ibf.minimizer_threshold(ibf.n_minimizers(r), k, w, 3)
            routed = ibf.which_bins(r, t)
            trials += 1
            hits += int(b in routed)
            # selectivity: random other bins shouldn't all pass
            assert len(routed) <= B
    assert hits == trials, f"minimizer routing missed {trials - hits}/{trials}"


def test_minimizer_device_matches_host(rng):
    import jax.numpy as jnp

    from dream_yara_tpu.index.hashing import kmer_windows, minimizer_select
    from dream_yara_tpu.index.ibf import InterleavedBloomFilter
    from dream_yara_tpu.ops.ibf_query import ibf_bin_counts

    B = 3
    k, w = 19, 25
    genomes = [random_text(rng, 3000) for _ in range(B)]
    ibf = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3,
                                        k=k, window=w)
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    reads = np.full((5, 120), 4, dtype=np.int8)
    lens = np.zeros(5, dtype=np.int32)
    for i in range(4):
        reads[i, :120] = genomes[i % B][100 + i * 7 : 220 + i * 7]
        lens[i] = 120
    reads[4, :50] = random_text(rng, 50, n_rate=0.05)  # short + Ns
    lens[4] = 50
    got, n_sel = ibf_bin_counts(jnp.asarray(ibf.words), jnp.asarray(reads),
                                jnp.asarray(lens), k, ibf.n_hashes, window=w,
                                canonical=bool(ibf.canonical),
                                blocked=bool(ibf.blocked))
    got, n_sel = np.asarray(got), np.asarray(n_sel)
    for i in range(5):
        want = ibf.bin_counts(reads[i, : lens[i]])
        assert np.array_equal(got[i, :B], want), i
        assert n_sel[i] == ibf.n_minimizers(reads[i, : lens[i]]), i


def test_minimizer_filter_save_load_roundtrip(rng, tmp_path):
    from dream_yara_tpu.index.ibf import InterleavedBloomFilter

    ibf = InterleavedBloomFilter.create(4, size_bits=1 << 20, n_hashes=2,
                                        k=15, window=21)
    ibf.add_kmers(random_text(rng, 500), 2)
    ibf.save(tmp_path / "f")
    back = InterleavedBloomFilter.load(tmp_path / "f")
    assert back.window == 21 and back.k == 15
    assert np.array_equal(back.words, ibf.words)


def test_blocked_rows_distinct_in_block(rng):
    """ibf_blocked_rows: all n_hashes probes of a k-mer land in ONE block
    and are pairwise distinct (odd stride mod power-of-two S)."""
    from dream_yara_tpu.index.hashing import BLOCK_WORDS, ibf_blocked_rows

    for wd, n_rows in [(1, 1 << 16), (2, 1 << 16), (8, 1 << 12)]:
        S = BLOCK_WORDS // wd
        lo = rng.integers(0, 1 << 32, 5000, dtype=np.uint32)
        hi = rng.integers(0, 8, 5000, dtype=np.uint32)
        rows = ibf_blocked_rows(lo, hi, 3, n_rows, wd)
        assert rows.min() >= 0 and rows.max() < n_rows
        blk = rows // S
        assert (blk == blk[:, :1]).all()          # same block per k-mer
        assert (np.sort(rows, axis=1)[:, 1:]
                != np.sort(rows, axis=1)[:, :-1]).all()  # distinct probes


def test_kdx_device_matches_host(rng):
    """Direct-addressing filter on DEVICE: rows are the raw packed k-mer
    (identity), not fmix-hashed — regression for the classify path that
    hashed kdx rows and returned all-zero counts (every read unrouted)."""
    import jax.numpy as jnp

    from dream_yara_tpu.ops.ibf_query import ibf_bin_counts

    kdx = DirectKmerFilter.create(3, k=10)
    seqs = [random_text(rng, 800) for _ in range(3)]
    for b, s in enumerate(seqs):
        kdx.add_kmers(s, b)
    reads = np.stack([s[100:200] for s in seqs]).astype(np.int8)
    lens = np.full(3, 100, np.int32)
    got = np.asarray(ibf_bin_counts(
        jnp.asarray(kdx.words), jnp.asarray(reads), jnp.asarray(lens),
        kdx.k, kdx.n_hashes, direct=True)[0])
    for i in range(3):
        want = kdx.bin_counts(reads[i])
        assert np.array_equal(got[i, :3], want), i
        assert got[i, i] == 100 - 10 + 1


@pytest.mark.parametrize("bins", [3, 64])  # Wd=2 (S=64) and Wd=2; 64->Wd=2
def test_blocked_device_matches_host(rng, bins):
    """Blocked-layout filters: device counts == host oracle, and the
    no-false-negative routing property holds (probes are the same
    base+j*stride sub-rows on both sides)."""
    import jax.numpy as jnp

    from dream_yara_tpu.ops.ibf_query import ibf_bin_counts

    k = 19
    ibf = InterleavedBloomFilter.create(bins, size_bits=1 << 22, n_hashes=3,
                                        k=k)
    assert ibf.blocked == 1
    seqs = [random_text(rng, 1500) for _ in range(bins)]
    for b, s in enumerate(seqs):
        ibf.add_kmers(s, b)
    reads = np.full((6, 120), 4, np.int8)
    lens = np.full(6, 120, np.int32)
    for i in range(6):
        src = seqs[i % bins]
        reads[i, :] = src[i * 30 : i * 30 + 120]
    reads[5, 60] = 4  # an N in the middle
    got, n_sel = ibf_bin_counts(jnp.asarray(ibf.words), jnp.asarray(reads),
                                jnp.asarray(lens), k, ibf.n_hashes,
                                canonical=bool(ibf.canonical), blocked=True)
    got = np.asarray(got)
    for i in range(6):
        want = ibf.bin_counts(reads[i, : lens[i]])
        assert np.array_equal(got[i, :bins], want), i
    # routing: every read passes its source bin's threshold
    t = ibf.threshold(120, k, errors=3)
    for i in range(5):
        assert got[i, i % bins] >= t


def test_blocked_vs_classic_same_routing(rng):
    """Classic and blocked layouts must route planted reads identically
    (FP sets may differ; true-positive routing may not)."""
    B, k = 8, 19
    fa = InterleavedBloomFilter.create(B, size_bits=1 << 22, k=k,
                                       blocked=False)
    fb = InterleavedBloomFilter.create(B, size_bits=1 << 22, k=k,
                                       blocked=True)
    assert fa.blocked == 0 and fb.blocked == 1
    seqs = [random_text(rng, 2000) for _ in range(B)]
    for b, s in enumerate(seqs):
        fa.add_kmers(s, b)
        fb.add_kmers(s, b)
    t = fa.threshold(100, k, errors=3)
    for b, s in enumerate(seqs):
        read = s[300:400]
        assert b in fa.which_bins(read, t)
        assert b in fb.which_bins(read, t)


def test_blocked_filter_save_load_update(rng, tmp_path):
    ibf = InterleavedBloomFilter.create(4, size_bits=1 << 20, k=15)
    seqs = [random_text(rng, 400) for _ in range(4)]
    for b, s in enumerate(seqs):
        ibf.add_kmers(s, b)
    ibf.save(tmp_path / "f")
    back = InterleavedBloomFilter.load(tmp_path / "f")
    assert back.blocked == ibf.blocked == 1
    assert np.array_equal(back.words, ibf.words)
    # dynamic update on a blocked filter: clear + reinsert stays consistent
    new_g = random_text(rng, 400)
    back.clear_bins([2])
    back.add_kmers(new_g, 2)
    assert back.bin_counts(seqs[2])[2] < 400 - 15 + 1  # old k-mers gone (FP noise ok)
    assert back.bin_counts(new_g)[2] == 400 - 15 + 1


def test_canonical_filter_strand_symmetric(rng):
    """Canonical filters answer BOTH read orientations from forward windows:
    bin_counts(read) == bin_counts(revcomp(read)), and the no-false-negative
    routing property holds for rc reads with the plain k-mer lemma."""
    import jax.numpy as jnp

    from dream_yara_tpu.index.hashing import canonical_windows, kmer_windows
    from dream_yara_tpu.ops.ibf_query import kmer_windows_dev
    from dream_yara_tpu.utils.alphabet import revcomp

    B, k = 3, 19
    genomes = [random_text(rng, 4000) for _ in range(B)]
    ibf = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3, k=k)
    assert ibf.canonical == 1
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    for b in range(B):
        read = genomes[b][200:300].copy()
        thr = ibf.threshold(100, k, errors=0)
        assert b in ibf.which_bins(read, thr)
        assert b in ibf.which_bins(revcomp(read), thr)
        assert np.array_equal(ibf.bin_counts(read),
                              ibf.bin_counts(revcomp(read)))
    # canonical value really is strand-invariant + device matches host
    seq = random_text(rng, 60)
    lo_f, hi_f, _ = canonical_windows(seq, k)
    lo_r, hi_r, _ = canonical_windows(revcomp(seq), k)
    assert np.array_equal(lo_f, lo_r[::-1]) and np.array_equal(hi_f, hi_r[::-1])
    dlo, dhi, _ = kmer_windows_dev(jnp.asarray(seq[None, :]),
                                   jnp.asarray([60], jnp.int32), k,
                                   canonical=True)
    assert np.array_equal(np.asarray(dlo)[0], lo_f)
    assert np.array_equal(np.asarray(dhi)[0], hi_f)


def test_blocked_n_bins_slice_matches_full(rng):
    """n_bins-restricted blocked counting (skip the padded always-zero
    filter words) returns the same per-bin counts as full-width counting
    — the product classify path passes n_bins=B (ops/ibf_query)."""
    import jax.numpy as jnp

    from dream_yara_tpu.ops.ibf_query import ibf_bin_counts

    k, bins = 19, 5  # bins padded to 64 -> 2 words/row, word 1 always zero
    ibf = InterleavedBloomFilter.create(bins, size_bits=1 << 22, n_hashes=3,
                                        k=k)
    assert ibf.blocked == 1 and ibf.words.shape[1] == 2
    seqs = [random_text(rng, 1200) for _ in range(bins)]
    for b, s in enumerate(seqs):
        ibf.add_kmers(s, b)
    reads = np.stack([np.asarray(seqs[i % bins][10:130]) for i in range(4)])
    lens = np.full(4, 120, np.int32)
    args = (jnp.asarray(ibf.words), jnp.asarray(reads.astype(np.int8)),
            jnp.asarray(lens), k, ibf.n_hashes)
    kw = dict(canonical=bool(ibf.canonical), blocked=True)
    full, n_full = ibf_bin_counts(*args, **kw)
    sliced, n_sliced = ibf_bin_counts(*args, **kw, n_bins=bins)
    assert sliced.shape[1] == 32 and full.shape[1] == 64
    assert np.array_equal(np.asarray(full)[:, :bins],
                          np.asarray(sliced)[:, :bins])
    assert np.array_equal(np.asarray(n_full), np.asarray(n_sliced))
    assert not np.asarray(full)[:, 32:].any()
