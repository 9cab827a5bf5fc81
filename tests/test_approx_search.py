"""Edit-layout seed search vs brute-force / scalar-DP oracles."""

import numpy as np

import jax.numpy as jnp

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.ops.device_index import DeviceFM
from tests.conftest import random_text


# --- generalized edit-layout search (findSeeds<1|2> analog) ---------------

def _edit_at_most(seed, text, pos, budget):
    """Scalar oracle: some text substring starting at pos is within edit
    distance <= budget of seed."""
    m = len(seed)
    best = budget + 1
    for l in range(max(0, m - budget), m + budget + 1):
        w = text[pos : pos + l]
        if len(w) < l:
            continue
        D = np.zeros((m + 1, l + 1), dtype=np.int32)
        D[:, 0] = np.arange(m + 1)
        D[0, :] = np.arange(l + 1)
        for i in range(1, m + 1):
            for j in range(1, l + 1):
                sub = 0 if (seed[i - 1] == w[j - 1] and seed[i - 1] < 4
                            and w[j - 1] < 4) else 1
                D[i, j] = min(D[i - 1, j - 1] + sub, D[i - 1, j] + 1,
                              D[i, j - 1] + 1)
        best = min(best, D[m, l])
    return best <= budget


def _layout_positions(dev, fm, reads, budget, indels):
    from dream_yara_tpu.ops.approx_search import seed_search_edits

    S, L = reads.shape
    rows = np.arange(S, dtype=np.int32)
    starts = np.zeros(S, dtype=np.int32)
    slens = np.full(S, L, dtype=np.int32)
    lo, hi, val, w_start = seed_search_edits(
        dev.bwt_blocks, dev.occ, dev.counts, dev.n,
        jnp.asarray(reads), jnp.asarray(rows), jnp.asarray(starts),
        jnp.asarray(slens), L, budget=budget, indels=indels)
    lo, hi, val = np.asarray(lo), np.asarray(hi), np.asarray(val)
    found = [set() for _ in range(S)]
    for s in range(S):
        for w in np.flatnonzero(val[s]):
            for r in range(lo[s, w], hi[s, w]):
                found[s].add(int(fm.sa[r]))
    return found


def test_layouts_2sub_complete_vs_bruteforce(rng):
    """Budget-2 layout search finds EVERY Hamming<=2 occurrence."""
    text = random_text(rng, 1500)
    text[-1] = 5
    fm = FMIndex.build(text)
    dev = DeviceFM.from_host(fm, text)
    L = 14
    S = 8
    reads = np.zeros((S, L), dtype=np.int8)
    for i in range(S):
        p = int(rng.integers(0, 1400))
        r = text[p : p + L].copy()
        for _ in range(2):
            j = int(rng.integers(0, L))
            r[j] = (r[j] + int(rng.integers(1, 4))) % 4
        reads[i] = r
    found = _layout_positions(dev, fm, reads, budget=2, indels=False)
    t = np.asarray(text)
    for i in range(S):
        want = {p for p in range(len(t) - L + 1)
                if ((t[p : p + L] != reads[i]) | (t[p : p + L] >= 4)
                    | (reads[i] >= 4)).sum() <= 2}
        assert want <= found[i], f"seed {i}: missed {want - found[i]}"


def test_layouts_1indel_finds_planted(rng):
    text = random_text(rng, 3000)
    text[-1] = 5
    fm = FMIndex.build(text)
    dev = DeviceFM.from_host(fm, text)
    L = 24
    S = 10
    reads = np.zeros((S, L), dtype=np.int8)
    truth = []
    for i in range(S):
        p = int(rng.integers(0, 2900))
        w = list(text[p : p + L + 1])
        if i % 2:
            del w[int(rng.integers(1, L - 1))]     # deletion in read
        else:
            w.insert(int(rng.integers(1, L - 1)),  # insertion in read
                     int(rng.integers(0, 4)))
        reads[i] = np.array(w[:L], dtype=np.int8)
        truth.append(p)
    found = _layout_positions(dev, fm, reads, budget=1, indels=True)
    for i, p in enumerate(truth):
        assert p in found[i], f"seed {i}: planted 1-indel occurrence missed"


def test_layouts_sound_vs_edit_oracle(rng):
    """Every reported position is genuinely within the edit budget."""
    text = random_text(rng, 800)
    text[-1] = 5
    fm = FMIndex.build(text)
    dev = DeviceFM.from_host(fm, text)
    L = 12
    S = 6
    reads = np.zeros((S, L), dtype=np.int8)
    for i in range(S):
        p = int(rng.integers(0, 700))
        r = text[p : p + L].copy()
        r[int(rng.integers(0, L))] = (r[0] + 1) % 4
        reads[i] = r
    t = np.asarray(text)
    for budget, indels in [(1, False), (2, False), (1, True), (2, True)]:
        found = _layout_positions(dev, fm, reads, budget, indels)
        for i in range(S):
            for p in found[i]:
                assert _edit_at_most(reads[i], t, p, budget), \
                    (i, p, budget, indels)
