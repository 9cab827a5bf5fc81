"""Classifier / repetitive re-seed path (sensitivity high vs full)."""

import numpy as np

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.pipeline import map_single_bin
from dream_yara_tpu.utils.options import MapperOptions
from tests.conftest import random_text


def tandem_case(rng, copies=20, seg_len=300):
    seg = random_text(rng, seg_len)
    genome = np.concatenate([seg] * copies + [random_text(rng, 2000)])
    store = SeqStore.from_seqs(["rep"], [genome])
    fm = FMIndex.build(store.text)
    read = seg[50:150].copy()
    read[50] = (read[50] + 1) % 4  # one substitution
    batch = ReadBatch.from_reads(["r0"], [read])
    return store, fm, batch, copies


def test_full_sensitivity_finds_all_copies(rng):
    store, fm, batch, copies = tandem_case(rng)
    opts = MapperOptions(error_rate=0.03, sensitivity="full")
    ranked, cigars, contigs = map_single_bin(store, fm, batch, opts)
    # all copies carry the dist-1 match (same stratum)
    assert int(ranked.c1[0]) == copies
    assert int(ranked.best[0]) == 1


def test_high_sensitivity_maps_repetitive_read(rng):
    store, fm, batch, copies = tandem_case(rng)
    opts = MapperOptions(error_rate=0.03, sensitivity="high")
    ranked, cigars, contigs = map_single_bin(store, fm, batch, opts)
    # capped, but the read maps in the best stratum with >= 1 match
    assert int(ranked.c1[0]) >= 1
    assert int(ranked.best[0]) == 1
    m = ranked.matches
    # every reported match is a true dist-1 placement at a copy boundary
    for i in range(len(m)):
        assert (int(m.begin[i]) - 50) % 300 == 0


def test_high_equals_full_on_nonrepetitive(rng):
    """On non-repetitive data the classifier path never fires."""
    genome = random_text(rng, 5000)
    store = SeqStore.from_seqs(["g"], [genome])
    fm = FMIndex.build(store.text)
    reads = [genome[i * 400 : i * 400 + 100].copy() for i in range(8)]
    batch = ReadBatch.from_reads([f"r{i}" for i in range(8)], reads)
    r_full, _, _ = map_single_bin(store, fm, batch,
                                  MapperOptions(error_rate=0.03, sensitivity="full"))
    r_high, _, _ = map_single_bin(store, fm, batch,
                                  MapperOptions(error_rate=0.03, sensitivity="high"))
    assert np.array_equal(r_full.c1, r_high.c1)
    assert np.array_equal(r_full.matches.begin, r_high.matches.begin)


def test_low_sensitivity_skips_repetitive_pass(rng):
    """-y low: capacity-capped only; still maps, fastest mode."""
    store, fm, batch, copies = tandem_case(rng)
    opts = MapperOptions(error_rate=0.03, sensitivity="low")
    ranked, cigars, contigs = map_single_bin(store, fm, batch, opts)
    assert int(ranked.best[0]) == 1          # the dist-1 placements are found
    assert 1 <= int(ranked.c1[0]) <= copies  # capped subset is acceptable
