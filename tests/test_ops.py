"""Device op kernels vs host oracles (SURVEY.md §4 property tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.index.ibf import InterleavedBloomFilter
from dream_yara_tpu.ops import (
    DeviceFM, backward_search, banded_verify, gather_hits, ibf_bin_counts, rank,
)
from tests.conftest import mutate, random_text


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(7)
    text = random_text(rng, 2000)
    text[-1] = 5
    text[700] = 5  # internal sentinel (contig boundary)
    fm = FMIndex.build(text)
    dev = DeviceFM.from_host(fm, text)
    return rng, text, fm, dev


def test_rank_matches_host(fixture):
    rng, text, fm, dev = fixture
    c = rng.integers(0, 6, 200).astype(np.int32)
    i = rng.integers(0, fm.n + 1, 200).astype(np.int32)
    got = np.asarray(rank(dev.bwt_blocks, dev.occ, jnp.asarray(c), jnp.asarray(i)))
    want = np.array([fm.rank(int(cc), int(ii)) for cc, ii in zip(c, i)])
    assert np.array_equal(got, want)


def test_backward_search_matches_host(fixture):
    rng, text, fm, dev = fixture
    L = 16
    seeds = np.stack([
        *(text[p : p + L] for p in rng.integers(0, 1900, 30)),   # planted
        *(random_text(rng, L) for _ in range(30)),                # random
    ]).astype(np.int8)
    lo, hi = backward_search(dev.bwt_blocks, dev.occ, dev.counts, dev.n,
                             jnp.asarray(seeds))
    for s in range(len(seeds)):
        wlo, whi = fm.backward_search(seeds[s])
        assert (int(lo[s]), int(hi[s])) == (wlo, whi)


def test_backward_search_valid_mask(fixture):
    _, _, fm, dev = fixture
    seeds = np.zeros((4, 8), dtype=np.int8)
    valid = np.array([True, False, True, False])
    lo, hi = backward_search(dev.bwt_blocks, dev.occ, dev.counts, dev.n,
                             jnp.asarray(seeds), jnp.asarray(valid))
    assert int(hi[1] - lo[1]) == 0 and int(hi[3] - lo[3]) == 0


def test_gather_hits(fixture):
    rng, text, fm, dev = fixture
    seeds = np.stack([text[p : p + 12] for p in rng.integers(0, 1900, 20)]).astype(np.int8)
    lo, hi = backward_search(dev.bwt_blocks, dev.occ, dev.counts, dev.n,
                             jnp.asarray(seeds))
    pos, mask, over = gather_hits(dev.sa, lo, hi, capacity=8)
    for s in range(20):
        want = sorted(fm.locate(r) for r in range(int(lo[s]), int(hi[s])))
        got = sorted(np.asarray(pos[s])[np.asarray(mask[s])])
        if int(over[s]) == 0:
            assert got == want
        else:
            assert len(got) == 8 and set(got) <= set(want)


# --- banded verification vs full-DP numpy oracle ---

def semiglobal_oracle(read, window):
    """Unbanded semi-global edit distance: read global, window local."""
    m, n = len(read), len(window)
    D = np.zeros((m + 1, n + 1), dtype=np.int64)
    D[:, 0] = np.arange(m + 1)
    for j in range(1, m + 1):
        for x in range(1, n + 1):
            sub = 1
            if read[j - 1] == window[x - 1] and read[j - 1] < 4 and window[x - 1] < 4:
                sub = 0
            D[j, x] = min(D[j - 1, x - 1] + sub, D[j - 1, x] + 1, D[j, x - 1] + 1)
    return int(D[m].min())


@pytest.mark.parametrize("edits", [(0, 0, 0), (3, 0, 0), (1, 1, 0), (0, 0, 2), (2, 1, 1)])
def test_banded_verify_planted(fixture, edits):
    rng, text, fm, dev = fixture
    E = 5
    n_sub, n_ins, n_del = edits
    anchors, rows_, lens, reads_list = [], [], [], []
    for _ in range(16):
        p = int(rng.integers(0, 1800))
        read = mutate(rng, text[p : p + 80].copy(), n_sub, n_ins, n_del)
        anchors.append(p)
        reads_list.append(read)
        lens.append(len(read))
    L = max(lens)
    reads = np.full((len(reads_list), L), 4, dtype=np.int8)
    for i, r in enumerate(reads_list):
        reads[i, : len(r)] = r
    dist, beg, end = banded_verify(
        jnp.asarray(text), jnp.asarray(anchors, dtype=jnp.int32),
        jnp.asarray(reads), jnp.arange(len(reads_list), dtype=jnp.int32),
        jnp.asarray(lens, dtype=jnp.int32), max_err=E)
    for i in range(len(reads_list)):
        a, m = anchors[i], lens[i]
        window = text[max(0, a - E) : a + m + E]
        want = semiglobal_oracle(reads_list[i], window)
        if want <= E:
            assert int(dist[i]) == want, f"cand {i}: {int(dist[i])} != {want}"
            # begin/end must reproduce the distance on the exact slice
            span = text[int(beg[i]) : int(end[i])]
            got = full_global(reads_list[i], span)
            assert got == want
        else:
            assert int(dist[i]) > E


def full_global(read, span):
    m, n = len(read), len(span)
    D = np.zeros((m + 1, n + 1), dtype=np.int64)
    D[:, 0] = np.arange(m + 1)
    D[0, :] = np.arange(n + 1)
    for j in range(1, m + 1):
        for x in range(1, n + 1):
            sub = 0 if (read[j-1] == span[x-1] and read[j-1] < 4 and span[x-1] < 4) else 1
            D[j, x] = min(D[j-1, x-1] + sub, D[j-1, x] + 1, D[j, x-1] + 1)
    return int(D[m, n])


def test_banded_verify_rejects_garbage(fixture):
    rng, text, fm, dev = fixture
    E = 4
    reads = random_text(rng, 100)[None, :]
    dist, _, _ = banded_verify(
        jnp.asarray(text), jnp.asarray([500], dtype=jnp.int32),
        jnp.asarray(reads), jnp.asarray([0], dtype=jnp.int32),
        jnp.asarray([100], dtype=jnp.int32), max_err=E)
    assert int(dist[0]) > E


def test_banded_verify_window_edges(fixture):
    """Anchors at text start/end must not crash or underflow."""
    rng, text, fm, dev = fixture
    E = 3
    read0 = text[0:50].copy()
    read1 = text[len(text) - 51 : len(text) - 1].copy()  # avoid final sentinel
    reads = np.stack([read0, read1])
    dist, beg, end = banded_verify(
        jnp.asarray(text),
        jnp.asarray([0, len(text) - 51], dtype=jnp.int32),
        jnp.asarray(reads), jnp.arange(2, dtype=jnp.int32),
        jnp.asarray([50, 50], dtype=jnp.int32), max_err=E)
    assert int(dist[0]) == 0 and int(beg[0]) == 0 and int(end[0]) == 50
    assert int(dist[1]) == 0 and int(beg[1]) == len(text) - 51


# --- device IBF vs host IBF ---

def test_ibf_device_matches_host(rng):
    bins = 5
    ibf = InterleavedBloomFilter.create(bins, size_bits=1 << 20, n_hashes=3, k=19)
    seqs = [random_text(rng, 400) for _ in range(bins)]
    for b, s in enumerate(seqs):
        ibf.add_kmers(s, b)
    reads = np.full((6, 100), 4, dtype=np.int8)
    lens = []
    for i in range(5):
        reads[i, :100] = seqs[i][50:150]
        lens.append(100)
    reads[5, :60] = random_text(rng, 60)  # shorter read with N padding
    lens.append(60)
    got, n_sel = ibf_bin_counts(
        jnp.asarray(ibf.words), jnp.asarray(reads),
        jnp.asarray(lens, dtype=jnp.int32), ibf.k, ibf.n_hashes,
        canonical=bool(ibf.canonical), blocked=bool(ibf.blocked))
    got = np.asarray(got)
    for i in range(6):
        want = ibf.bin_counts(reads[i, : lens[i]])
        assert np.array_equal(got[i, :bins], want), i


def test_locate_sampled_device(fixture):
    from dream_yara_tpu.ops.locate import locate_sampled_packed

    rng, text, fm, dev = fixture
    fms = fm.subsample_sa(8)
    # EVERY row, exhaustively: walks that cross the internal sentinel at
    # text[700] used to mislocate (LF through a repeated sentinel is not
    # order-consistent; subsample_sa now marks sentinel-BWT rows)
    rows = jnp.arange(fm.n, dtype=jnp.int32)
    got = np.asarray(locate_sampled_packed(
        dev.bwt_blocks, dev.occ, dev.counts,
        jnp.asarray(fms.sa), jnp.asarray(fms.sa_mark_bits),
        jnp.asarray(fms.sa_rank_ck), rows, sample_rate=8))
    assert np.array_equal(got, fm.sa)
    # host oracle agrees row-by-row (exercises _mark/_mark_rank bit paths)
    for r in rng.integers(0, fm.n, 40):
        assert fms.locate(int(r)) == int(fm.sa[r])


def test_rank_fused_matches_plain(fixture):
    from dream_yara_tpu.ops.rank import build_fused_rank_rows, rank_fused

    rng, text, fm, dev = fixture
    fused = jnp.asarray(build_fused_rank_rows(fm.bwt_blocks, fm.occ))
    c = rng.integers(0, 6, 500).astype(np.int32)
    i = rng.integers(0, fm.n + 1, 500).astype(np.int32)
    got = np.asarray(rank_fused(fused, jnp.asarray(c), jnp.asarray(i)))
    want = np.asarray(rank(dev.bwt_blocks, dev.occ, jnp.asarray(c), jnp.asarray(i)))
    assert np.array_equal(got, want)


def test_pack_unpack_reads_roundtrip(rng):
    from dream_yara_tpu.io.readstore import ReadBatch
    from dream_yara_tpu.pipeline.map_step import pack_reads_fwd, unpack_reads

    L = 73
    half = 16
    reads = []
    for i in range(12):  # 12 real reads + 4 rows of padding
        l = int(rng.integers(20, L + 1))
        r = random_text(rng, l, n_rate=0.1 if i % 3 == 0 else 0)
        reads.append(r)
    batch = ReadBatch.from_reads([f"r{i}" for i in range(12)], reads, pad_to=L)
    fwd = np.full((12, L), 4, np.int8)
    fwd[:, :] = batch.seqs[:12]
    packed, nmask = pack_reads_fwd(fwd, half, L)
    lens = np.zeros(half, np.int32)
    lens[:12] = batch.lengths
    out = np.asarray(unpack_reads(jnp.asarray(packed), jnp.asarray(nmask),
                                  jnp.asarray(lens), L))
    # fwd rows match, rc rows match ReadBatch's precomputed rc rows
    assert np.array_equal(out[:12], batch.seqs[:12])
    assert np.array_equal(out[half : half + 12], batch.seqs[12:24])
    # padding rows are all N
    assert (out[12:half] == 4).all() and (out[half + 12 :] == 4).all()
