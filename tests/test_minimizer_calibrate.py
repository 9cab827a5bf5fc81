"""Empirical minimizer-slack calibrator sanity (tools/calibrate_...py).

Round-5 prep: the calibrated slack must be sound (0 at e=0, bounded by the
k-mer lemma at w==k) and strictly tighter than the retired 2D heuristic at
the config shapes where the heuristic collapsed (BASELINE.md row 2)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from calibrate_minimizer_threshold import slack_samples  # noqa: E402

from dream_yara_tpu.index.ibf import InterleavedBloomFilter  # noqa: E402


def test_zero_errors_zero_slack(rng):
    s = slack_samples(rng, L=80, k=19, w=26, e=0, trials=50)
    assert s.max() == 0


def test_w_equals_k_obeys_kmer_lemma(rng):
    # w == k selects every k-mer; e substitutions destroy at most e*k of
    # them (the deterministic k-mer lemma), so observed slack never exceeds
    k, e = 11, 2
    s = slack_samples(rng, L=60, k=k, w=k, e=e, trials=50)
    assert s.max() <= e * k


def test_calibrated_tighter_than_heuristic(rng):
    # the retired config-2 shape: 150bp reads, e=5 — the 2D heuristic's
    # slack (50) exceeds the typical minimizer count (~29), collapsing the
    # threshold to the floor; the measured tail must come in far below it
    L, k, w, e = 150, 19, 26, 5
    s = slack_samples(rng, L=L, k=k, w=w, e=e, trials=60)
    m = L - k + 1
    heur_slack = m - InterleavedBloomFilter.minimizer_threshold(m, k, w, e)
    p = int(np.quantile(s, 0.999, method="higher"))
    assert p < heur_slack
    assert p <= 30  # measured ~24; leave tunnel-free determinism margin
