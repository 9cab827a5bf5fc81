"""Bidirectional FM-index + search-scheme seed search (index/bifm.py,
ops/bidir_search.py).

Oracles: naive substring counting, FMIndex.backward_search, and the dense
enumeration backend (ops/approx_search.seed_search_edits) whose own oracle
tests live in test_approx_search.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dream_yara_tpu.index.bifm import BiFMIndex, build_reverse_fused
from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.ops.bidir_search import (bidir_seed_search, extend_left,
                                             extend_right)
from dream_yara_tpu.ops.rank import build_fused_rank_rows
from tests.conftest import random_text


def naive_count(text, p):
    L = len(p)
    return sum(1 for i in range(len(text) - L + 1)
               if np.array_equal(text[i : i + L], p))


@pytest.fixture(scope="module")
def bi_small():
    rng = np.random.default_rng(11)
    seqs = [rng.integers(0, 4, 700, dtype=np.int8),
            rng.integers(0, 5, 300, dtype=np.int8)]   # second contig has Ns
    st = SeqStore.from_seqs(["a", "b"], seqs)
    return st, BiFMIndex.build(st.text, sample_rate=1)


def test_host_extension_invariants(bi_small):
    st, bi = bi_small
    rng = np.random.default_rng(1)
    for _ in range(60):
        L = int(rng.integers(1, 12))
        p = rng.integers(0, 5, L).astype(np.int8)
        nc = naive_count(st.text, p)
        stL = bi.search(p, "left")
        stR = bi.search(p, "right")
        assert max(0, stL[1] - stL[0]) == nc
        assert max(0, stR[1] - stR[0]) == nc
        if nc:
            lo, hi = bi.fm.backward_search(p)
            assert (stL[0], stL[1]) == (lo, hi)
            assert (stR[0], stR[1]) == (lo, hi)
            assert stR[3] - stR[2] == nc          # synchronized widths


def test_host_mixed_direction(bi_small):
    st, bi = bi_small
    rng = np.random.default_rng(2)
    for _ in range(40):
        L = int(rng.integers(2, 12))
        p = rng.integers(0, 4, L).astype(np.int8)
        mid = int(rng.integers(1, L))
        s = bi.start()
        for c in p[mid:]:
            s = bi.extend_right(s, int(c))
        for c in p[:mid][::-1]:
            s = bi.extend_left(s, int(c))
        assert max(0, s[1] - s[0]) == naive_count(st.text, p)


def test_batched_extension_matches_host(bi_small):
    st, bi = bi_small
    fm = bi.fm
    fused = jnp.asarray(build_fused_rank_rows(fm.bwt_blocks, fm.occ))
    counts = jnp.asarray(fm.counts)
    rfused = jnp.asarray(bi.rfused)
    rng = np.random.default_rng(3)
    # batch of random single-char extensions from random valid states
    states, chars = [], []
    for _ in range(64):
        L = int(rng.integers(0, 6))
        p = rng.integers(0, 4, L).astype(np.int8)
        states.append(bi.search(p, "left") if L else bi.start())
        chars.append(int(rng.integers(0, 5)))
    arr = np.array(states, dtype=np.int32)
    c = np.array(chars, dtype=np.int32)
    outL = extend_left(fused, counts, *[jnp.asarray(arr[:, i])
                                        for i in range(4)], jnp.asarray(c))
    outR = extend_right(rfused, counts, *[jnp.asarray(arr[:, i])
                                          for i in range(4)], jnp.asarray(c))
    for q in range(len(states)):
        expL = bi.extend_left(tuple(arr[q]), int(c[q]))
        expR = bi.extend_right(tuple(arr[q]), int(c[q]))
        gotL = tuple(int(np.asarray(o)[q]) for o in outL)
        gotR = tuple(int(np.asarray(o)[q]) for o in outR)
        # empty intervals may differ in representation; compare via width
        if expL[1] - expL[0] > 0 or gotL[1] - gotL[0] > 0:
            assert gotL == expL
        if expR[1] - expR[0] > 0 or gotR[1] - gotR[0] > 0:
            assert gotR == expR


@pytest.mark.parametrize("budget", [1, 2])
def test_scheme_search_equals_enumeration(budget):
    from dream_yara_tpu.ops.approx_search import seed_search_edits

    rng = np.random.default_rng(7)
    core = rng.integers(0, 4, 250, dtype=np.int8)
    seq = np.concatenate([core, core,
                          rng.integers(0, 4, 400, dtype=np.int8),
                          core[:120]])
    st = SeqStore.from_seqs(["a"], [seq])
    bi = BiFMIndex.build(st.text, sample_rate=1)
    fm = bi.fm
    fused = jnp.asarray(build_fused_rank_rows(fm.bwt_blocks, fm.occ))
    counts = jnp.asarray(fm.counts)
    rfused = jnp.asarray(bi.rfused)

    m, S, L = 12, 16, 24
    reads = np.zeros((S, L), dtype=np.int8)
    rows = np.arange(S, dtype=np.int32)
    starts = np.full(S, 3, dtype=np.int32)
    slens = np.full(S, 15, dtype=np.int32)     # window = last 12 of [3, 18)
    for i in range(S):
        p0 = int(rng.integers(0, len(seq) - L))
        reads[i] = st.text[p0 : p0 + L]
        for _ in range(int(rng.integers(0, budget + 1))):
            q = int(rng.integers(6, 18))
            reads[i, q] = (reads[i, q] + rng.integers(1, 4)) % 4
    reads[0, 10] = 4                            # an N inside one window

    args = (jnp.asarray(reads), jnp.asarray(rows), jnp.asarray(starts),
            jnp.asarray(slens))
    lo1, hi1, v1, ws1 = seed_search_edits(
        jnp.asarray(fm.bwt_blocks), jnp.asarray(fm.occ), counts, fm.n,
        *args, m, budget=budget, indels=False, fused=fused)
    lo2, hi2, v2, ws2 = bidir_seed_search(
        fused, counts, rfused, counts, fm.n, *args, m, budget=budget)
    assert np.array_equal(np.asarray(ws1), np.asarray(ws2))

    def positions(lo, hi, valid):
        lo, hi, valid = map(np.asarray, (lo, hi, valid))
        return [
            {int(fm.sa[r])
             for j in range(lo.shape[1]) if valid[s, j]
             for r in range(lo[s, j], hi[s, j])}
            for s in range(S)
        ]

    assert positions(lo1, hi1, v1) == positions(lo2, hi2, v2)


def test_scheme_search_short_windows_invalid():
    """Seeds with windows shorter than m come out invalid (the caller's
    backend gate guarantees they never reach this path in production)."""
    rng = np.random.default_rng(9)
    st = SeqStore.from_seqs(["a"], [rng.integers(0, 4, 500, np.int8)])
    bi = BiFMIndex.build(st.text, sample_rate=1)
    fused = jnp.asarray(build_fused_rank_rows(bi.fm.bwt_blocks, bi.fm.occ))
    counts = jnp.asarray(bi.fm.counts)
    reads = jnp.asarray(st.text[:24][None, :].astype(np.int8))
    lo, hi, valid, _ = bidir_seed_search(
        fused, counts, jnp.asarray(bi.rfused), counts, bi.fm.n, reads,
        jnp.asarray([0], np.int32), jnp.asarray([0], np.int32),
        jnp.asarray([8], np.int32), 12, budget=1)
    assert not np.asarray(valid).any()


def test_sidecar_save_load(tmp_path, bi_small):
    st, bi = bi_small
    p = tmp_path / "x.fm.npz"
    bi.save(p)
    assert (tmp_path / "x.rfm.npz").exists()
    bi2 = BiFMIndex.load(p)
    assert np.array_equal(bi2.rfused, bi.rfused)
    assert np.array_equal(bi2.rcounts, bi.rcounts)
    # reverse C table equals the forward one (same symbol multiset)
    assert np.array_equal(bi.rcounts, bi.fm.counts)


def test_reverse_fused_requires_sentinel():
    with pytest.raises(ValueError):
        build_reverse_fused(np.zeros(8, np.int8))


def test_backend_end_to_end_identical(monkeypatch):
    """BinMapper with the bidir backend produces the same matches as the
    enumeration backend on a repetitive genome that exercises both
    repetitive strata."""
    from dream_yara_tpu.io.readstore import ReadBatch
    from dream_yara_tpu.pipeline import map_single_bin
    from dream_yara_tpu.utils.options import MapperOptions

    rng = np.random.default_rng(5)
    seg = random_text(rng, 280)
    genome = np.concatenate([seg] * 24 + [random_text(rng, 1500)])
    store = SeqStore.from_seqs(["rep"], [genome])
    fm = FMIndex.build(store.text)
    rfused, _ = build_reverse_fused(store.text)

    reads, names = [], []
    for i in range(6):
        r = seg[40 + i : 140 + i].copy()
        r[30] = (r[30] + 1) % 4
        if i % 2:
            r[70] = (r[70] + 2) % 4
        reads.append(r)
        names.append(f"r{i}")
    batch = ReadBatch.from_reads(names, reads)
    opts = MapperOptions(error_rate=0.03, sensitivity="full", indels=False)

    # the gate must actually resolve to bidir for this workload
    from dream_yara_tpu.pipeline.mapper import BinMapper
    from dream_yara_tpu.pipeline.seeding import rate_to_ppm
    bm = BinMapper(store, fm, opts, rfused=rfused)
    assert bm._seed_backend(np.arange(4, dtype=np.int32),
                            batch.lengths.astype(np.int32),
                            rate_to_ppm(opts.error_rate), 2, False,
                            BinMapper.REP2_T) == "bidir"

    monkeypatch.setenv("DY_SEED_BACKEND", "enum")
    r_enum, c_enum, _ = map_single_bin(store, fm, batch, opts, rfused=rfused)
    monkeypatch.setenv("DY_SEED_BACKEND", "bidir")
    r_bid, c_bid, _ = map_single_bin(store, fm, batch, opts, rfused=rfused)

    for a, b in ((r_enum, r_bid),):
        assert np.array_equal(np.asarray(a.best), np.asarray(b.best))
        assert np.array_equal(np.asarray(a.c1), np.asarray(b.c1))
        ma, mb = a.matches, b.matches
        ka = sorted(zip(np.asarray(ma.read_id).tolist(),
                        np.asarray(ma.strand).tolist(),
                        np.asarray(ma.begin).tolist(),
                        np.asarray(ma.dist).tolist()))
        kb = sorted(zip(np.asarray(mb.read_id).tolist(),
                        np.asarray(mb.strand).tolist(),
                        np.asarray(mb.begin).tolist(),
                        np.asarray(mb.dist).tolist()))
        assert ka == kb


def test_indexer_bidir_cli(tmp_path):
    """indexer --bidir writes sidecars; a plain single-bin rebuild of a
    bidir DB keeps them in sync; a non-bidir rebuild removes staleness."""
    from dream_yara_tpu.cli.indexer import main as indexer_main
    from dream_yara_tpu.io.fasta import write_fasta
    from dream_yara_tpu.pipeline.dis_mapper import DreamIndex, bin_file

    rng = np.random.default_rng(13)
    fa = []
    for b in range(2):
        f = tmp_path / f"bin{b}.fna"
        write_fasta(f, [f"c{b}"], [random_text(rng, 400)])
        fa.append(str(f))
    db = tmp_path / "db"
    indexer_main(fa + ["-o", str(db), "--bidir"])
    for b in range(2):
        assert bin_file(db, b, "rfm").exists()

    idx = DreamIndex.load(db, filter_type="none")
    assert set(idx.rfused) == {0, 1}
    # sidecar content is the real reverse rows of that bin
    exp, _ = build_reverse_fused(idx.stores[0].text)
    assert np.array_equal(idx.rfused[0], exp)

    # single-bin rebuild WITHOUT --bidir inherits and refreshes the sidecar
    f2 = tmp_path / "new0.fna"
    write_fasta(f2, ["c0n"], [random_text(rng, 380)])
    indexer_main([str(f2), "-o", str(db), "--bin-id", "0"])
    idx2 = DreamIndex.load(db, filter_type="none")
    exp2, _ = build_reverse_fused(idx2.stores[0].text)
    assert np.array_equal(idx2.rfused[0], exp2)

    # a stale sidecar (wrong shape for its bin) is ignored, not loaded
    np.savez(bin_file(db, 1, "rfm"),
             rfused=np.zeros((3, 24), np.int32),
             rcounts=np.zeros(7, np.int32))
    idx3 = DreamIndex.load(db, filter_type="none")
    assert 1 not in idx3.rfused and 0 in idx3.rfused
