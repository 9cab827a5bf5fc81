"""Device IBF query — HOT LOOP 1 (SURVEY.md §3.1 whichBins).

Reference analog: src/d_bloom_filter.h whichBins [U]: per k-mer, AND the
n_hashes rows, accumulate per-bin counters, threshold by the k-mer lemma.
TPU-first: all reads x k-mers x hashes evaluated at once — hash arithmetic is
uint32 VPU math (identical bit-for-bit to index/hashing.py, tested), row
fetches are batched gathers of whole uint32 rows, bit unpack + count is a
broadcast shift-and-mask summed over the k-mer axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..index.hashing import HASH_SEEDS, MIX_MULT


def _fmix32(h):
    h ^= h >> 16
    h = h * jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h = h * jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def kmer_windows_dev(reads: jnp.ndarray, lengths: jnp.ndarray, k: int):
    """Packed k-mer windows of each read row. reads: (R, L) int8.

    Returns (lo, hi, valid): (R, L-k+1) each; valid masks windows containing
    N/pad or beyond the read length.
    """
    R, L = reads.shape
    m = L - k + 1
    codes = reads.astype(jnp.uint32)
    lo = jnp.zeros((R, m), dtype=jnp.uint32)
    hi = jnp.zeros((R, m), dtype=jnp.uint32)
    for t in range(min(k, 16)):
        lo = lo | ((codes[:, t : m + t] & 3) << (2 * t))
    for t in range(16, k):
        hi = hi | ((codes[:, t : m + t] & 3) << (2 * (t - 16)))
    bad = (reads >= 4).astype(jnp.int32)
    cbad = jnp.cumsum(bad, axis=1)
    cbad = jnp.concatenate([jnp.zeros((R, 1), jnp.int32), cbad], axis=1)
    no_n = (cbad[:, k:] - cbad[:, :-k]) == 0
    pos_ok = (jnp.arange(m, dtype=jnp.int32)[None, :] + k) <= lengths[:, None]
    return lo, hi, no_n & pos_ok


def ibf_bin_counts(filter_words: jnp.ndarray, reads: jnp.ndarray,
                   lengths: jnp.ndarray, k: int, n_hashes: int) -> jnp.ndarray:
    """Per-bin k-mer hit counts for each read row.

    filter_words: (n_rows, Wd) uint32; reads: (R, L) int8; returns
    (R, Wd*32) int32 counts over padded bins.
    """
    n_rows = filter_words.shape[0]
    lo, hi, valid = kmer_windows_dev(reads, lengths, k)        # (R, m)
    mix = lo ^ (hi * jnp.uint32(MIX_MULT))
    seeds = jnp.asarray(HASH_SEEDS[:n_hashes])
    v = _fmix32(mix[:, :, None] ^ seeds[None, None, :])        # (R, m, h)
    rows = (v & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32) % jnp.int32(n_rows)
    gathered = jnp.take(filter_words, rows, axis=0)            # (R, m, h, Wd)
    anded = gathered[:, :, 0]
    for j in range(1, n_hashes):
        anded = anded & gathered[:, :, j]                      # (R, m, Wd)
    anded = jnp.where(valid[:, :, None], anded, jnp.uint32(0))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((anded[:, :, :, None] >> shifts) & 1).astype(jnp.int8)  # (R, m, Wd, 32)
    counts = bits.sum(axis=1, dtype=jnp.int32)                 # (R, Wd, 32)
    return counts.reshape(reads.shape[0], -1)


def ibf_candidates(filter_words, reads, lengths, k, n_hashes, thresholds):
    """Candidate (read, bin) mask: counts >= per-read threshold.

    thresholds: (R,) int32 (k-mer lemma, computed per read length by caller).
    Returns bool (R, bins_padded).
    """
    counts = ibf_bin_counts(filter_words, reads, lengths, k, n_hashes)
    return counts >= thresholds[:, None]


import functools

import jax


@functools.partial(jax.jit,
                   static_argnames=("half", "L", "k", "n_hashes", "rate_ppm"))
def ibf_classify_packed(filter_words, blob, *, half: int, L: int,
                        k: int, n_hashes: int, rate_ppm: int):
    """Whole-batch classification from packed uploads: unpack fwd+rc rows on
    device, count k-mers per bin, threshold by the k-mer lemma, OR the two
    orientations, and bit-pack the (reads, bins) candidate mask so the
    device->host fetch is one small array (SURVEY.md §3.1 HOT LOOP 1 with
    tunnel-aware I/O)."""
    from .readpack import unpack_blob, unpack_reads

    packed, nmask, lengths = unpack_blob(blob, half, L)
    reads = unpack_reads(packed, nmask, lengths, L)          # (R2, L)
    lengths2 = jnp.concatenate([lengths, lengths])
    counts = ibf_bin_counts(filter_words, reads, lengths2, k, n_hashes)
    e = (lengths2 * jnp.int32(rate_ppm)) // 10_000
    thr = jnp.maximum((lengths2 - k + 1) - k * e, 1)
    mask = counts >= thr[:, None]
    cand = mask[:half] | mask[half:]                          # (half, Bp)
    w = cand.shape[1] // 32
    bits = cand.reshape(half, w, 32).astype(jnp.uint32)
    words = (bits << jnp.arange(32, dtype=jnp.uint32)[None, None, :]).sum(
        axis=2, dtype=jnp.uint32)
    return words                                              # (half, Bp/32)
