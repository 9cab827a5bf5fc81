"""FM-index over one bin's concatenated contig text.

Analog of reference SeqAn FMIndex with YaraFMConfig (SURVEY.md §2.4 [U]):
2-bit-packed rank dictionary + sampled SA in the reference. TPU-first layout
here (designed for batched gathers, the device-side hot loop in
ops/backward_search.py):

  * BWT stored as dense int8 *blocks* of BLOCK=128 chars: shape
    (n_blocks, 128). A rank query gathers exactly one row (128 B) — the
    natural TPU lane width and within one HBM transaction.
  * Occ checkpoints every BLOCK chars: int32 (n_blocks+1, SIGMA).
    rank_c(i) = occ[i>>7, c] + popcount(bwt_block[i>>7][0 : i&127] == c).
  * C table: int32 (SIGMA+1,) cumulative symbol counts of the text.
  * SA: int32. sample_rate=1 stores the full SA (locate = one gather —
    speed-of-light; the default while a bin fits HBM). sample_rate=s>1 stores
    SA values at text positions divisible by s plus a marked-row bitmap;
    locate walks <=s-1 LF steps (fixed-trip-count on device).

The FM text alphabet is SIGMA=6 (A,C,G,T,N,$): N is a literal 6th symbol (a
seed containing N only matches text N; verification later re-scores N as
mismatching everything, see docs/OUTPUT_CONTRACT.md), and $ (SENTINEL)
separates contigs so matches cannot span contig boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils.alphabet import SIGMA
from .suffix_array import build_suffix_array

BLOCK = 128
BWT_PAD = 7  # padding code in the last BWT block; != any real symbol


@dataclass
class FMIndex:
    n: int                     # text length
    bwt_blocks: np.ndarray     # (n_blocks, BLOCK) int8, padded with BWT_PAD
    occ: np.ndarray            # (n_blocks + 1, SIGMA) int32 checkpoint counts
    counts: np.ndarray         # (SIGMA + 1,) int32 cumulative C table
    sa: np.ndarray             # full SA (sample_rate=1) or sampled values
    sample_rate: int = 1
    sa_marked: np.ndarray | None = None  # (n,) uint8 bitmap-ish mark per SA row (sampled mode)
    sa_rank: np.ndarray | None = None    # (n_blocks+1,) int32 prefix counts of marks (sampled mode)
    # q-mer prefix lookup (classic FM speedup): interval of every ACGT q-mer,
    # i.e. the state after q backward-search steps — one table gather replaces
    # q rank-query iterations on the device.
    prefix_q: int = 0
    pfx_lo: np.ndarray | None = None     # (4^q,) int32
    pfx_hi: np.ndarray | None = None     # (4^q,) int32

    @classmethod
    def build(cls, text: np.ndarray, sample_rate: int = 1,
              sa: np.ndarray | None = None) -> "FMIndex":
        text = np.asarray(text, dtype=np.int8)
        n = len(text)
        if n >= (1 << 31):
            raise ValueError(
                f"bin of {n} bp exceeds the int32 index ceiling (2^31-1 "
                f"~ 2.1 Gbp per bin): split it into smaller bins — the "
                f"DREAM design point — e.g. per chromosome for GRCh38")
        if sa is None:
            sa = build_suffix_array(text)
        sa = np.asarray(sa, dtype=np.int32)

        # chunked BWT + occ build: the obvious one-liners materialize
        # O(n)-scale temporaries (sa-1 int32, a (n_blocks, 128, SIGMA)
        # one-hot) that dominate peak RSS at Gbp scale — chunking bounds
        # the transient working set to ~0.5 GB regardless of n
        n_blocks = (n + BLOCK - 1) // BLOCK
        padded = np.full(n_blocks * BLOCK, BWT_PAD, dtype=np.int8)
        CH = 1 << 26
        for c0 in range(0, n, CH):
            sc = sa[c0 : c0 + CH]
            padded[c0 : c0 + len(sc)] = np.where(sc > 0, text[sc - 1],
                                                 text[n - 1])
        bwt_blocks = padded.reshape(n_blocks, BLOCK)

        # occ[b, c] = count of c in bwt[0 : b*BLOCK]
        codes = np.arange(SIGMA, dtype=np.int8)
        per_block = np.empty((n_blocks, SIGMA), dtype=np.int32)
        BCH = 1 << 19
        for b0 in range(0, n_blocks, BCH):
            blk = bwt_blocks[b0 : b0 + BCH]
            per_block[b0 : b0 + len(blk)] = (blk[:, :, None] == codes).sum(
                axis=1, dtype=np.int32)
        occ = np.zeros((n_blocks + 1, SIGMA), dtype=np.int32)
        np.cumsum(per_block, axis=0, out=occ[1:])

        sym_counts = np.bincount(text.astype(np.int64), minlength=SIGMA)
        counts = np.zeros(SIGMA + 1, dtype=np.int32)
        np.cumsum(sym_counts, out=counts[1:])

        fm = cls(n=n, bwt_blocks=bwt_blocks, occ=occ, counts=counts,
                 sa=sa, sample_rate=1)
        fm.build_prefix_table(text)
        if sample_rate > 1:
            fm = fm.subsample_sa(sample_rate)
        return fm

    def build_prefix_table(self, text: np.ndarray, q: int | None = None):
        """Intervals of all ACGT q-mers, derived in O(n) from the sorted SA.

        Suffix keys = base-6 value of the first q chars (pad-A past the text
        end; every short suffix contains the terminal sentinel digit inside
        its window, so padding never collides with a pure-ACGT key). Keys are
        non-decreasing in SA order, so each q-mer's interval is a
        searchsorted pair. q defaults to ~log4(n) (table ~ text size),
        capped at 11 so keys fit int32 (6^11 < 2^31) — GRCh38-scale bins
        would otherwise burn ~3x the text size in int64 temporaries. Keys
        are built in SA chunks to bound peak memory at ~5 bytes/char.
        """
        n = self.n
        if q is None:
            q = max(2, min(11, int(np.log(max(n, 16)) / np.log(4))))
        q = min(q, 11)
        tpad = np.concatenate([np.asarray(text, np.int8),
                               np.zeros(q, np.int8)])   # int8: codes fit
        idx = np.arange(4 ** q, dtype=np.int64)
        key6 = np.zeros(4 ** q, dtype=np.int32)
        for t in range(q):
            key6 = key6 * np.int32(6) + ((idx >> (2 * (q - 1 - t))) & 3).astype(np.int32)
        # keys are non-decreasing in SA order, so the global searchsorted
        # index of each q-mer is the SUM of per-chunk searchsorted indices —
        # the full (n,) int32 key array (4 GB at 1 Gbp) never materializes
        lo = np.zeros(4 ** q, dtype=np.int64)
        hi = np.zeros(4 ** q, dtype=np.int64)
        CHUNK = 1 << 24
        for c0 in range(0, n, CHUNK):
            sa_c = self.sa[c0 : c0 + CHUNK].astype(np.int64)
            kc = np.zeros(len(sa_c), dtype=np.int32)
            for t in range(q):
                kc = kc * np.int32(6) + tpad[sa_c + t]
            lo += np.searchsorted(kc, key6, side="left")
            hi += np.searchsorted(kc, key6, side="right")
        self.prefix_q = q
        self.pfx_lo = lo.astype(np.int32)
        self.pfx_hi = hi.astype(np.int32)

    def subsample_sa(self, rate: int) -> "FMIndex":
        """Keep SA values at text positions % rate == 0; see ops/locate.py."""
        marked = np.empty(self.n, dtype=bool)
        CH = 1 << 26   # bound the % temp (int32, 4 GB at 1 Gbp unchunked)
        for c0 in range(0, self.n, CH):
            marked[c0 : c0 + CH] = (self.sa[c0 : c0 + CH] % rate == 0)
        sa_rank = np.zeros(self.n + 1, dtype=np.int32)
        np.cumsum(marked, out=sa_rank[1:])
        return FMIndex(
            n=self.n, bwt_blocks=self.bwt_blocks, occ=self.occ,
            counts=self.counts, sa=self.sa[marked], sample_rate=rate,
            sa_marked=marked.astype(np.uint8), sa_rank=sa_rank,
            prefix_q=self.prefix_q, pfx_lo=self.pfx_lo, pfx_hi=self.pfx_hi,
        )

    # --- host-side reference rank/search (oracle for device kernels) ---

    def rank(self, c: int, i: int) -> int:
        """Occurrences of c in bwt[0:i)."""
        b, r = divmod(i, BLOCK)
        if r == 0:
            # i == n on a 128-divisible text lands b == n_blocks: the occ
            # checkpoint row exists but there is no BWT block to scan
            return int(self.occ[b, c])
        return int(self.occ[b, c]) + int((self.bwt_blocks[b, :r] == c).sum())

    def backward_step(self, c: int, lo: int, hi: int) -> tuple[int, int]:
        return (int(self.counts[c]) + self.rank(c, lo),
                int(self.counts[c]) + self.rank(c, hi))

    def backward_search(self, pattern: np.ndarray) -> tuple[int, int]:
        """SA interval [lo, hi) of exact occurrences of pattern (searched back-to-front)."""
        lo, hi = 0, self.n
        for c in np.asarray(pattern, dtype=np.int8)[::-1]:
            lo, hi = self.backward_step(int(c), lo, hi)
            if lo >= hi:
                return lo, lo
        return lo, hi

    def locate(self, row: int) -> int:
        """Text position of SA row (host oracle; device version in ops/locate.py)."""
        if self.sample_rate == 1:
            return int(self.sa[row])
        steps = 0
        while not self.sa_marked[row]:
            c = None
            b, r = divmod(row, BLOCK)
            c = int(self.bwt_blocks[b, r])
            row = int(self.counts[c]) + self.rank(c, row)
            steps += 1
        return int(self.sa[self.sa_rank[row]]) + steps

    # --- serialization (per-bin artifact, SURVEY.md §5.4) ---

    def save(self, path):
        extra = {}
        if self.sample_rate > 1:
            extra.update(sa_marked=self.sa_marked, sa_rank=self.sa_rank)
        if self.prefix_q:
            extra.update(prefix_q=self.prefix_q, pfx_lo=self.pfx_lo,
                         pfx_hi=self.pfx_hi)
        np.savez(
            path, n=self.n, bwt_blocks=self.bwt_blocks, occ=self.occ,
            counts=self.counts, sa=self.sa, sample_rate=self.sample_rate,
            **extra)

    @classmethod
    def load(cls, path) -> "FMIndex":
        path = str(path)
        if not path.endswith(".npz"):
            path += ".npz"
        z = np.load(path)
        rate = int(z["sample_rate"])
        has_pfx = "prefix_q" in z.files
        return cls(n=int(z["n"]), bwt_blocks=z["bwt_blocks"], occ=z["occ"],
                   counts=z["counts"], sa=z["sa"], sample_rate=rate,
                   sa_marked=z["sa_marked"] if rate > 1 else None,
                   sa_rank=z["sa_rank"] if rate > 1 else None,
                   prefix_q=int(z["prefix_q"]) if has_pfx else 0,
                   pfx_lo=z["pfx_lo"] if has_pfx else None,
                   pfx_hi=z["pfx_hi"] if has_pfx else None)
