import numpy as np
import pytest

from dream_yara_tpu.index.fmindex import FMIndex
from tests.conftest import random_text


def naive_count(text, pat):
    t = bytes(np.asarray(text, np.uint8))
    p = bytes(np.asarray(pat, np.uint8))
    n, m = len(t), len(p)
    return [i for i in range(n - m + 1) if t[i : i + m] == p]


@pytest.fixture
def fm_and_text(rng):
    text = random_text(rng, 1000)
    text[-1] = 5  # terminator
    return FMIndex.build(text), text


def test_rank_against_naive(fm_and_text, rng):
    fm, text = fm_and_text
    n = fm.n
    bwt = np.where(fm.sa > 0, text[fm.sa - 1], text[n - 1])
    for _ in range(50):
        c = int(rng.integers(0, 6))
        i = int(rng.integers(0, n + 1))
        assert fm.rank(c, i) == int((bwt[:i] == c).sum())


def test_backward_search_counts(fm_and_text, rng):
    fm, text = fm_and_text
    for m in [1, 3, 8, 20]:
        for _ in range(20):
            pat = random_text(rng, m)
            lo, hi = fm.backward_search(pat)
            occs = naive_count(text, pat)
            assert hi - lo == len(occs)
            if occs:
                found = sorted(fm.locate(r) for r in range(lo, hi))
                assert found == occs


def test_backward_search_present_substring(fm_and_text, rng):
    fm, text = fm_and_text
    for _ in range(20):
        start = int(rng.integers(0, len(text) - 30))
        pat = text[start : start + 25]
        lo, hi = fm.backward_search(pat)
        assert hi > lo
        assert start in [fm.locate(r) for r in range(lo, hi)]


def test_sampled_sa_locate(fm_and_text, rng):
    fm, text = fm_and_text
    fms = fm.subsample_sa(8)
    assert len(fms.sa) < len(text)
    for row in rng.integers(0, fm.n, 100):
        assert fms.locate(int(row)) == int(fm.sa[row])


def test_prefix_table_rebuild_on_sampled_index():
    """Rebuilding the q-mer table on a SUBSAMPLED index must match the
    full-SA key-scan table. The SA-order scan reads `self.sa`, which holds
    only 1/rate of the suffixes after subsample_sa — the old rebuild
    silently emitted a corrupt table whenever DeviceFMSet stacked bins
    whose size-dependent default q differed (the common-min-q rebuild),
    which made the mesh seed search miss real hits on the rebuilt bins."""
    rng = np.random.default_rng(77)
    unit = rng.integers(0, 4, 60).astype(np.int8)
    text = np.concatenate([np.tile(unit, 30),
                           rng.integers(0, 4, 1500).astype(np.int8),
                           np.full(1, 5, np.int8)])
    for q in (4, 5, 6):
        fresh = FMIndex.build(text, prefix_q=q)
        sub = FMIndex.build(text, sample_rate=4)
        sub.build_prefix_table(text, q)
        assert np.array_equal(fresh.pfx_lo, sub.pfx_lo)
        assert np.array_equal(fresh.pfx_hi, sub.pfx_hi)


def test_save_load(fm_and_text, tmp_path):
    fm, _ = fm_and_text
    fm.save(tmp_path / "fm")
    fm2 = FMIndex.load(tmp_path / "fm")
    assert fm2.n == fm.n
    assert np.array_equal(fm2.sa, fm.sa)
    assert np.array_equal(fm2.occ, fm.occ)
    fms = fm.subsample_sa(4)
    fms.save(tmp_path / "fms")
    fms2 = FMIndex.load(tmp_path / "fms")
    assert fms2.sample_rate == 4
    assert fms2.locate(10) == fm.sa[10]


def test_load_legacy_dense_sampled_artifact(fm_and_text, tmp_path, rng):
    """Round-1 artifacts stored dense uint8 marks + int32 prefix counts;
    load() must pack them into the bitmap+checkpoint layout."""
    fm, _ = fm_and_text
    fms = fm.subsample_sa(8)
    marked = np.zeros(fm.n, np.uint8)
    sa_rank = np.zeros(fm.n + 1, np.int32)
    for row in range(fm.n):
        marked[row] = (fm.sa[row] % 8 == 0)
    np.cumsum(marked, out=sa_rank[1:])
    np.savez(tmp_path / "legacy.npz", n=fm.n, bwt_blocks=fm.bwt_blocks,
             occ=fm.occ, counts=fm.counts, sa=fms.sa, sample_rate=8,
             sa_marked=marked, sa_rank=sa_rank)
    back = FMIndex.load(tmp_path / "legacy.npz")
    assert np.array_equal(back.sa_mark_bits, fms.sa_mark_bits)
    assert np.array_equal(back.sa_rank_ck, fms.sa_rank_ck)
    for row in rng.integers(0, fm.n, 25):
        assert back.locate(int(row)) == int(fm.sa[row])


def test_block_divisible_text_length(rng):
    """Regression: rank(c, n) on a text whose length is an exact multiple
    of the 128-char block indexed one BWT block past the end (hit at the
    1 Gbp scale check — 10^9 % 128 == 0)."""
    text = random_text(rng, 1280)  # 10 * BLOCK exactly
    text[-1] = 5                   # sentinel-terminated, like SeqStore texts
    fm = FMIndex.build(text)
    for c in range(4):
        want = int((text == c).sum())
        assert fm.rank(c, fm.n) == want
    p = 700
    lo, hi = fm.backward_search(text[p : p + 30])
    assert hi > lo
    assert p in {fm.locate(r) for r in range(lo, hi)}
    fms = fm.subsample_sa(8)
    lo, hi = fms.backward_search(text[p : p + 30])
    assert p in {fms.locate(r) for r in range(lo, hi)}
