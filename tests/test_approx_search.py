"""Hamming<=1 seed search vs brute-force oracle."""

import numpy as np

import jax.numpy as jnp

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.ops.approx_search import seed_search_1sub
from dream_yara_tpu.ops.device_index import DeviceFM
from tests.conftest import random_text


def brute_occurrences_ham1(text, seed):
    """All (pos) where text[pos:pos+len] is within Hamming distance 1 of seed."""
    t = np.asarray(text)
    L = len(seed)
    out = []
    for p in range(len(t) - L + 1):
        w = t[p : p + L]
        mism = ((w != seed) | (w >= 4) | (seed >= 4)).sum()
        if mism <= 1:
            out.append(p)
    return sorted(out)


def test_1sub_search_complete(rng):
    text = random_text(rng, 3000)
    text[-1] = 5
    fm = FMIndex.build(text)
    dev = DeviceFM.from_host(fm, text)

    L = 20
    n_seeds = 12
    reads = np.zeros((n_seeds, L), dtype=np.int8)
    for i in range(n_seeds):
        p = int(rng.integers(0, 2900))
        reads[i] = text[p : p + L]
    rows = np.arange(n_seeds, dtype=np.int32)
    starts = np.zeros(n_seeds, dtype=np.int32)
    slens = np.full(n_seeds, L, dtype=np.int32)

    t_lo, t_hi, b_lo, b_hi, b_valid = seed_search_1sub(
        dev.bwt_blocks, dev.occ, dev.counts, dev.n,
        jnp.asarray(reads), jnp.asarray(rows), jnp.asarray(starts),
        jnp.asarray(slens), max_slen=L)

    sa = fm.sa
    for s in range(n_seeds):
        got = set()
        for r in range(int(t_lo[s]), int(t_hi[s])):
            got.add(int(sa[r]))
        for b in range(L * 3):
            if bool(b_valid[s, b]):
                for r in range(int(b_lo[s, b]), int(b_hi[s, b])):
                    got.add(int(sa[r]))
        want = set(brute_occurrences_ham1(text, reads[s]))
        assert got == want, f"seed {s}: missing {want - got}, extra {got - want}"


def test_1sub_invalid_seed(rng):
    text = random_text(rng, 500)
    fm = FMIndex.build(text)
    dev = DeviceFM.from_host(fm, text)
    reads = np.zeros((2, 10), dtype=np.int8)
    reads[1, 3] = 4  # N in seed: branches at that position invalid
    t_lo, t_hi, b_lo, b_hi, b_valid = seed_search_1sub(
        dev.bwt_blocks, dev.occ, dev.counts, dev.n,
        jnp.asarray(reads), jnp.asarray(np.array([0, 1], np.int32)),
        jnp.asarray(np.zeros(2, np.int32)),
        jnp.asarray(np.array([10, 0], np.int32)), max_slen=10)
    # seed 1 has slen 0 -> everything empty/invalid
    assert int(t_hi[1] - t_lo[1]) == 0
    assert not bool(np.asarray(b_valid)[1].any())
