"""Empirical (k,w)-correct minimizer routing thresholds (round-5 prep).

The shipped minimizer threshold (index/ibf.py minimizer_threshold) is the
2D-slack heuristic: t = n_minis - e*2D, D = ceil(k/(w-k+1)) + 2. It collapsed
at config-2's e=5 on 150 bp reads (t hits the floor, classify admits every
bin, the mode was retired with numbers — BASELINE.md row 2). The correct
production approach (cf. Raptor's probabilistic thresholds) derives the
slack from the DISTRIBUTION of how many selected minimizers e substitution
errors actually destroy, not a worst-case back-of-envelope.

This tool Monte-Carlos that distribution with the repo's own winnowing
(index/hashing.canonical_windows + minimizer_select — the device classifier
reproduces this selection bit-for-bit), so the calibrated slack is exact
for the implementation as built:

  for each trial: random fragment of length L -> its selected canonical
  minimizer set G (what build-filter inserted); plant e substitutions ->
  the read's selected minimizers R and their count n_minis; shared =
  |{r in R : r in G}|; slack_needed = n_minis - shared.

The per-error-budget threshold is then t(e) = n_minis - q-quantile(slack),
where q controls the false-negative rate a deployment accepts (1e-3 default
— a missed route costs one mate-rescue sweep, not a lost read). Emits one
JSON line per e with the calibrated slack vs the 2D heuristic's.

Usage: python tools/calibrate_minimizer_threshold.py [L=100] [k=19] [w=26]
           [e_max=5] [trials=3000]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from dream_yara_tpu.index.hashing import (canonical_windows,  # noqa: E402
                                          minimizer_select)
from dream_yara_tpu.index.ibf import InterleavedBloomFilter  # noqa: E402


def selected_keys(codes: np.ndarray, k: int, w: int):
    """Canonical minimizer keys of one sequence + the selected count."""
    lo, hi, valid = canonical_windows(codes, k)
    mask = minimizer_select(lo, hi, valid, w, k)
    return set(zip(lo[mask].tolist(), hi[mask].tolist())), int(mask.sum())


def slack_samples(rng, L: int, k: int, w: int, e: int, trials: int):
    """Distribution of n_minis - shared over random fragments + e errors."""
    out = np.empty(trials, dtype=np.int64)
    for t in range(trials):
        frag = rng.integers(0, 4, L).astype(np.int8)
        g_keys, _ = selected_keys(frag, k, w)
        read = frag.copy()
        for p in rng.choice(L, size=e, replace=False):
            read[p] = (read[p] + int(rng.integers(1, 4))) % 4
        r_keys_set, n_minis = selected_keys(read, k, w)
        shared = sum(1 for key in r_keys_set if key in g_keys)
        # selection can pick the same canonical k-mer from two windows;
        # count at set granularity on both sides (matches the classifier's
        # per-row counting only approximately ABOVE, exactly at n<=1 dups —
        # conservative: duplicate read minimizers that survive are counted
        # once here but twice by the device counter, so real counts >= ours)
        out[t] = max(0, n_minis - shared - (n_minis - len(r_keys_set)))
    return out


def main():
    argv = sys.argv[1:]
    L = int(argv[0]) if len(argv) > 0 else 100
    k = int(argv[1]) if len(argv) > 1 else 19
    w = int(argv[2]) if len(argv) > 2 else 26
    e_max = int(argv[3]) if len(argv) > 3 else 5
    trials = int(argv[4]) if len(argv) > 4 else 3000
    q = 1e-3
    rng = np.random.default_rng(0)
    for e in range(e_max + 1):
        s = slack_samples(rng, L, k, w, e, trials)
        cal = int(np.quantile(s, 1.0 - q, method="higher"))
        worst = int(s.max())
        n_ref = L - w + 1 + 1  # typical n_minis scale, for context only
        heur = (L - k + 1) - InterleavedBloomFilter.minimizer_threshold(
            L - k + 1, k, w, e)  # heuristic slack at n_minis = m
        print(json.dumps({
            "L": L, "k": k, "w": w, "e": e, "trials": trials,
            "slack_p999": cal, "slack_max_observed": worst,
            "slack_heuristic_2D": heur, "n_minis_typ": n_ref,
        }))


if __name__ == "__main__":
    main()
