"""Offline-indexing scale check (SURVEY.md §2.4 / §3.2): build a 1 Gbp
synthetic bin in-image, record wall time and peak RSS.

Run: python tools/bench_index_1g.py [mbp]   (default 1000)
"""

from __future__ import annotations

import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n = mbp * 1_000_000
    from dream_yara_tpu.index.fmindex import FMIndex

    rng = np.random.default_rng(1)
    text = rng.integers(0, 4, n, dtype=np.int8)  # int8 draw: no 8n temp
    text[-1] = 5  # sentinel-terminated (SeqStore convention)
    t0 = time.time()
    fm = FMIndex.build(text, sample_rate=8)
    dt = time.time() - t0
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    print(f"[index-1g] {mbp} Mbp: {dt:.1f}s "
          f"({n / dt / 1e6:.1f} Mbp/s), peak RSS {peak:.1f} GiB, "
          f"prefix_q={fm.prefix_q}, sampled SA rate 8")
    # spot-check correctness at scale
    ok = 0
    for _ in range(20):
        p = int(rng.integers(0, n - 50))
        lo, hi = fm.backward_search(text[p : p + 40])
        pos = {fm.locate(r) for r in range(lo, hi)}
        ok += int(p in pos)
    assert ok == 20, f"only {ok}/20 spot checks passed"
    print("[index-1g] 20/20 search+locate spot checks passed")


if __name__ == "__main__":
    main()
