"""Empirical (k,w)-correct minimizer routing thresholds — CLI wrapper.

The calibration itself lives in dream_yara_tpu/index/minimizer_calib.py
(device counting semantics: slack is charged per selected window OCCURRENCE,
matching the classifier's counter — the round-4 set-granularity version
under-estimated slack for destroyed duplicated keys). build_filter runs it
at build time and stores the table in the filter artifact; this tool prints
the same numbers for inspection, next to the retired 2D heuristic's.

Usage: python tools/calibrate_minimizer_threshold.py [L=100] [k=19] [w=26]
           [e_max=5] [trials=3000]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from dream_yara_tpu.index.ibf import InterleavedBloomFilter  # noqa: E402
from dream_yara_tpu.index.minimizer_calib import (  # noqa: E402
    device_slack_samples)


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
        s = device_slack_samples(rng, L, k, w, e, trials)
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
