"""SA locate for sampled suffix arrays (device side).

Reference analog: SeqAn sampled-SA locate via LF-mapping walk (YaraFMConfig
sparse SA, SURVEY.md §2.4 [U]). With sample rate s, SA values are stored only
for text positions divisible by s; locate(row) walks LF until it lands on a
marked row (<= s-1 steps, fixed trip count on device, branchless masking).

Trade-off (SURVEY.md §5.7): full SA (rate 1) costs 4 bytes/base of HBM but
locates in ONE gather; rate s cuts memory ~s x at (s-1) extra rank queries
per hit. Rate 1 is the default while a bin fits; big-genome bins (GRCh38/64)
switch to rate 8-16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..index.fmindex import BLOCK
from .rank import rank

_LOG2_BLOCK = 7


def locate_sampled_packed(bwt_blocks, occ, counts, sa_samples, mark_bits,
                          rank_ck, rows: jnp.ndarray, sample_rate: int,
                          valid=None) -> jnp.ndarray:
    """Packed-bitmap edition for the device hot path (DeviceFM layout):
    mark bitmap as (n/32,) uint32 words + mark-rank checkpoints every 128 rows
    (~n/6 bytes total vs the 5n-byte host-oracle arrays).
    """
    Q = rows.shape[0]
    steps0 = jnp.zeros(Q, dtype=jnp.int32)
    if valid is not None:
        rows = jnp.where(valid, rows, 0)

    def is_marked(r):
        w = jnp.take(mark_bits, r >> 5)
        return ((w >> (r & 31).astype(jnp.uint32)) & 1) > 0

    def body(_t, carry):
        rows, steps = carry
        marked = is_marked(rows)
        b = rows >> _LOG2_BLOCK
        r = rows & (BLOCK - 1)
        blk = jnp.take(bwt_blocks, b, axis=0)                    # (Q, 128)
        c = jnp.take_along_axis(blk, r[:, None], axis=1)[:, 0].astype(jnp.int32)
        lf = jnp.take(counts, c) + rank(bwt_blocks, occ, c, rows)
        rows = jnp.where(marked, rows, lf)
        steps = jnp.where(marked, steps, steps + 1)
        return rows, steps

    rows, steps = jax.lax.fori_loop(0, sample_rate - 1, body, (rows, steps0))

    # mark-rank(row) = checkpoint + popcount of mark bits in [row & ~127, row)
    ck = jnp.take(rank_ck, rows >> 7)
    wrow = jnp.take(
        mark_bits.reshape(-1, 4), rows >> 7, axis=0)             # (Q, 4) words
    bit_in_blk = rows & 127
    widx = jnp.arange(4, dtype=jnp.int32)[None, :]
    full = jnp.minimum(jnp.maximum(bit_in_blk[:, None] - widx * 32, 0), 32)
    full_c = jnp.clip(full, 0, 31).astype(jnp.uint32)
    masked = jnp.where(full >= 32, wrow,
                       wrow & ((jnp.uint32(1) << full_c) - jnp.uint32(1)))
    masked = jnp.where(full <= 0, jnp.uint32(0), masked)
    pc = _popcount32(masked).sum(axis=1)
    base = jnp.take(sa_samples, ck + pc)
    return base + steps


def locate_sampled_fused(row_fetch, counts_fetch, mark_words_fetch, ck_fetch,
                         sample_fetch, rows: jnp.ndarray, sample_rate: int,
                         valid=None) -> jnp.ndarray:
    """Hook-based sampled locate for the flat multi-bin step.

    Each LF step costs ONE fused-row fetch: the fused rank row (ops/rank.py
    build_fused_rank_rows) carries both the occ checkpoint AND the 128
    nibble-packed BWT chars, so the stepped row's own char decodes from the
    same fetched row instead of a separate bwt_blocks gather.

    All fetchers take PER-QUERY indices; callers bake per-query bin offsets
    into the closures (pipeline/flat_step.py):
      row_fetch(b) -> (Q, 24) fused rows;   counts_fetch(c) -> (Q,) C[bin, c]
      mark_words_fetch(g) -> (Q, 4) mark-bit words of 128-row group g
      ck_fetch(g) -> (Q,) mark-rank checkpoints;  sample_fetch(i) -> (Q,) SA
    """
    from .rank import rank_fused_rows

    Q = rows.shape[0]
    steps0 = jnp.zeros(Q, dtype=jnp.int32)
    if valid is not None:
        rows = jnp.where(valid, rows, 0)

    def is_marked(r):
        w = mark_words_fetch(r >> 7)                             # (Q, 4)
        word = jnp.take_along_axis(w, ((r >> 5) & 3)[:, None],
                                   axis=1)[:, 0]
        return ((word >> (r & 31).astype(jnp.uint32)) & 1) > 0

    def body(_t, carry):
        rows, steps = carry
        marked = is_marked(rows)
        b = rows >> _LOG2_BLOCK
        r = rows & (BLOCK - 1)
        row = row_fetch(b)                                       # (Q, 24)
        words = row[:, 6:22].astype(jnp.uint32)
        word = jnp.take_along_axis(words, (r >> 3)[:, None], axis=1)[:, 0]
        c = ((word >> ((r & 7).astype(jnp.uint32) * 4)) & 7).astype(jnp.int32)
        lf = counts_fetch(c) + rank_fused_rows(row, c, r)
        rows = jnp.where(marked, rows, lf)
        steps = jnp.where(marked, steps, steps + 1)
        return rows, steps

    rows, steps = jax.lax.fori_loop(0, sample_rate - 1, body, (rows, steps0))

    ck = ck_fetch(rows >> 7)
    wrow = mark_words_fetch(rows >> 7)                           # (Q, 4)
    bit_in_blk = rows & 127
    widx = jnp.arange(4, dtype=jnp.int32)[None, :]
    full = jnp.minimum(jnp.maximum(bit_in_blk[:, None] - widx * 32, 0), 32)
    full_c = jnp.clip(full, 0, 31).astype(jnp.uint32)
    masked = jnp.where(full >= 32, wrow,
                       wrow & ((jnp.uint32(1) << full_c) - jnp.uint32(1)))
    masked = jnp.where(full <= 0, jnp.uint32(0), masked)
    pc = _popcount32(masked).sum(axis=1)
    base = sample_fetch(ck + pc)
    return base + steps


def _popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
