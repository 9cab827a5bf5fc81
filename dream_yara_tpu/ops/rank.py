"""Batched FM rank queries — the innermost device op of seed search.

Reference analog: SeqAn rank-dictionary getRank inside backward search
(HOT LOOP 2 in SURVEY.md §3.1). TPU-first design: a rank query is ONE row
gather from the (n_blocks, 128) int8 BWT block matrix plus one row gather from
the occ checkpoint table, then a 128-lane compare-and-count on the VPU — no
data-dependent branching, fully batched over queries.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..index.fmindex import BLOCK

_LOG2_BLOCK = 7
assert BLOCK == 1 << _LOG2_BLOCK


def rank(bwt_blocks: jnp.ndarray, occ: jnp.ndarray,
         c: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    """occurrences of symbol c[q] in bwt[0 : i[q]) for each query q.

    bwt_blocks: (n_blocks, 128) int8; occ: (n_blocks+1, SIGMA) int32;
    c, i: (Q,) int32. Returns (Q,) int32.
    """
    b = i >> _LOG2_BLOCK
    r = i & (BLOCK - 1)
    rows = jnp.take(bwt_blocks, b, axis=0)              # (Q, 128)
    base = jnp.take(occ, b, axis=0)                     # (Q, SIGMA)
    base = jnp.take_along_axis(base, c[:, None], axis=1)[:, 0]
    pos = jnp.arange(BLOCK, dtype=jnp.int32)
    within = ((rows == c[:, None].astype(jnp.int8)) &
              (pos[None, :] < r[:, None])).sum(axis=1, dtype=jnp.int32)
    return base + within


def lf_step(bwt_blocks, occ, counts, c, i):
    """LF mapping: row of the suffix preceded by c: counts[c] + rank(c, i)."""
    return jnp.take(counts, c) + rank(bwt_blocks, occ, c, i)
