"""A/B: dense enumeration vs bidirectional search-scheme seed search.

Times ops/approx_search.seed_search_edits against
ops/bidir_search.bidir_seed_search on the SAME repetitive-stratum workload
shapes the mapper uses (REP1_T=32 budget 1, REP2_T=16 budget 2), on
whatever backend is active (run plain for the TPU tunnel, DY_PLATFORM=cpu
for a smoke run).

python tools/proto_bidir_cost.py [S=2048] [reps=5]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dream_yara_tpu.index.bifm import BiFMIndex  # noqa: E402
from dream_yara_tpu.io.seqstore import SeqStore  # noqa: E402
from dream_yara_tpu.ops.approx_search import seed_search_edits  # noqa: E402
from dream_yara_tpu.ops.bidir_search import bidir_seed_search  # noqa: E402
from dream_yara_tpu.ops.rank import build_fused_rank_rows  # noqa: E402


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rng = np.random.default_rng(0)

    core = rng.integers(0, 4, 2000, dtype=np.int8)
    seq = np.concatenate([core] * 40 +
                         [rng.integers(0, 4, 4_000_000, dtype=np.int8)])
    st = SeqStore.from_seqs(["g"], [seq])
    t0 = time.time()
    bi = BiFMIndex.build(st.text, sample_rate=1)
    print(f"[ab] bidir index built: {bi.fm.n/1e6:.1f} Mbp in "
          f"{time.time()-t0:.0f}s", file=sys.stderr)
    fm = bi.fm
    fused = jnp.asarray(build_fused_rank_rows(fm.bwt_blocks, fm.occ))
    counts = jnp.asarray(fm.counts)
    rfused = jnp.asarray(bi.rfused)
    bwt = jnp.asarray(fm.bwt_blocks)
    occ = jnp.asarray(fm.occ)

    L = 100
    reads = np.zeros((S, L), dtype=np.int8)
    for i in range(S):
        p0 = int(rng.integers(0, len(core) * 39))
        reads[i] = st.text[p0 : p0 + L]
        reads[i, 30] = (reads[i, 30] + 1) % 4
        reads[i, 71] = (reads[i, 71] + 2) % 4
    readsj = jnp.asarray(reads)
    rows = jnp.arange(S, dtype=jnp.int32)

    for budget, m, slen in ((1, 32, 50), (2, 16, 34)):
        starts = jnp.zeros(S, jnp.int32)
        slens = jnp.full((S,), slen, jnp.int32)

        f_enum = jax.jit(lambda r: seed_search_edits(
            bwt, occ, counts, fm.n, r, rows, starts, slens, m,
            budget=budget, indels=False, fused=fused))
        f_bid = jax.jit(lambda r: bidir_seed_search(
            fused, counts, rfused, counts, fm.n, r, rows, starts, slens, m,
            budget=budget))

        out = {}
        for name, f in (("enum", f_enum), ("bidir", f_bid)):
            r = f(readsj)
            jax.block_until_ready(r)
            ts = []
            for _ in range(reps):
                t0 = time.time()
                jax.block_until_ready(f(readsj))
                ts.append(time.time() - t0)
            lanes = int(np.asarray(r[0]).shape[1])
            nhit = int(np.asarray(r[2]).sum())
            out[name] = (float(np.median(ts)), lanes, nhit)
            print(f"[ab] budget={budget} m={m} {name:5s}: "
                  f"{out[name][0]*1e3:8.1f} ms  lanes={lanes:5d} "
                  f"valid_intervals={nhit}", file=sys.stderr)
        sp = out["enum"][0] / out["bidir"][0]
        print(f"[ab] budget={budget}: bidir is {sp:.2f}x vs enum "
              f"({S} seeds)", file=sys.stderr)


if __name__ == "__main__":
    main()
