"""Config-2-style smoke on the available chip: 8 bins, PE reads, IBF routing.

Validates the full DREAM path (classify -> per-bin map -> merge -> pair ->
rescue -> SAM) end-to-end on real hardware at moderate scale, checking planted
ground truth. Not a benchmark (see bench.py), but prints throughput.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(n_pairs=10_000, bins=8, bin_len=1_500_000, read_len=100):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass

    from dream_yara_tpu.index.fmindex import FMIndex
    from dream_yara_tpu.index.ibf import InterleavedBloomFilter
    from dream_yara_tpu.io.readstore import ReadBatch
    from dream_yara_tpu.io.seqstore import SeqStore
    from dream_yara_tpu.pipeline.dis_mapper import DreamIndex, dream_map_sam
    from dream_yara_tpu.utils.alphabet import revcomp
    from dream_yara_tpu.utils.options import MapperOptions

    rng = np.random.default_rng(77)
    t0 = time.time()
    genomes = [rng.integers(0, 4, bin_len).astype(np.int8) for _ in range(bins)]
    stores = [SeqStore.from_seqs([f"chr{b}"], [genomes[b]]) for b in range(bins)]
    fms = [FMIndex.build(st.text) for st in stores]
    ibf = InterleavedBloomFilter.create(bins, size_bits=1 << 27, n_hashes=3, k=19)
    for b, g in enumerate(genomes):
        ibf.add_kmers(g, b)
    index = DreamIndex(stores, fms, ibf, "bloom")
    print(f"[smoke] index built: {time.time() - t0:.1f}s", file=sys.stderr)

    ll, ld = 350, 80
    m1, m2, truth = [], [], []
    for i in range(n_pairs):
        b = i % bins
        t = int(rng.integers(ll - ld + 10, ll + ld - 10))
        p = int(rng.integers(0, bin_len - t - 1))
        r1 = genomes[b][p : p + read_len].copy()
        r2 = revcomp(genomes[b][p + t - read_len : p + t].copy())
        for r in (r1, r2):
            for _ in range(int(rng.integers(0, 3))):
                j = int(rng.integers(0, read_len))
                r[j] = (r[j] + int(rng.integers(1, 4))) % 4
        m1.append(r1)
        m2.append(r2)
        truth.append((b, p, t))
    names = [f"p{i}" for i in range(n_pairs)] * 2
    batch = ReadBatch.from_reads(names, m1 + m2, paired=True)

    opts = MapperOptions(error_rate=0.03, library_length=ll,
                         library_deviation=ld)
    t0 = time.time()
    sam = dream_map_sam(index, batch, opts)
    dt = time.time() - t0
    recs = [l.split(b"\t") for l in sam.splitlines() if not l.startswith(b"@")]
    assert len(recs) == 2 * n_pairs, len(recs)

    by = {}
    for r in recs:
        by.setdefault(r[0], []).append(r)
    proper = mapped = correct = 0
    for i, (b, p, t) in enumerate(truth):
        rr = by[f"p{i}".encode()]
        f1 = next(r for r in rr if int(r[1]) & 0x40)
        if not int(f1[1]) & 0x4:
            mapped += 1
            if f1[2] == f"chr{b}".encode() and int(f1[3]) == p + 1:
                correct += 1
        if int(f1[1]) & 0x2:
            proper += 1
    print(f"[smoke] {2*n_pairs} reads in {dt:.1f}s "
          f"({2*n_pairs/dt:.0f} reads/s incl per-shape compiles)", file=sys.stderr)
    print(f"[smoke] mate1 mapped {mapped}/{n_pairs}, correct-pos {correct}, "
          f"proper pairs {proper}", file=sys.stderr)
    assert mapped >= 0.99 * n_pairs
    assert correct >= 0.98 * mapped
    assert proper >= 0.97 * n_pairs
    print("[smoke] CONFIG-2 SMOKE PASS")


if __name__ == "__main__":
    main()
