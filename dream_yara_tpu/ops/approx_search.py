"""Approximate (Hamming<=1) seed search — the repetitive-read path.

Reference analog: src/mapper_filter.h findSeeds<1|2> via SeqAn multiple
backtracking, driven by the read classifier (src/mapper_classifier.h [U]):
reads whose exact seeds hit too many locations are re-seeded with FEWER,
LONGER seeds searched with up to one substitution — pigeonhole still covers
the error budget (s' = ceil((E+1)/2) seeds, some seed has <= floor(E/s') <= 1
error) while long seeds collapse the hit explosion on repeats.

TPU-first backtracking: recursion is flattened into a trunk pass that RECORDS
the per-step interval history, plus a dense branch matrix (seed x position x
3 alternate chars) advanced in lockstep — no data-dependent control flow.
Substitution-only branches keep the diagonal, so anchors need no shift
(sensitivity note: indel-containing repetitive alignments may be missed in
'high'/'low' sensitivity; 'full' bypasses this path — docs/OUTPUT_CONTRACT.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rank import rank


def seed_search_1sub(bwt_blocks, occ, counts, n, reads, rows, starts, slens,
                     max_slen: int):
    """Intervals of all Hamming<=1 variants of each seed.

    Returns (trunk_lo, trunk_hi): (S,) exact intervals, and
    (br_lo, br_hi, br_valid): (S, max_slen*3) branch intervals (position-
    major: branch index b = p*3 + ci substitutes position p of the seed).
    """
    S = rows.shape[0]
    L = reads.shape[1]
    flat = reads.reshape(-1)

    # --- trunk pass with interval history -------------------------------
    lo0 = jnp.zeros(S, dtype=jnp.int32)
    hi0 = jnp.where(slens > 0, jnp.full(S, n, dtype=jnp.int32), 0)

    def trunk_step(carry, t):
        lo, hi = carry
        active = t < slens
        idx = starts + slens - 1 - t
        c = jnp.take(flat, rows * L + jnp.clip(idx, 0, L - 1)).astype(jnp.int32)
        bounds = jnp.concatenate([lo, hi])
        ranks = rank(bwt_blocks, occ, jnp.tile(c, 2), bounds)
        cc = jnp.take(counts, c)
        upd = active & (lo < hi)
        nlo = jnp.where(upd, cc + ranks[:S], lo)
        nhi = jnp.where(upd, cc + ranks[S:], hi)
        return (nlo, nhi), (nlo, nhi)

    (t_lo, t_hi), (H_lo, H_hi) = jax.lax.scan(
        trunk_step, (lo0, hi0), jnp.arange(max_slen, dtype=jnp.int32))
    # history after consuming t+1 chars is H[t]; after 0 chars it's (lo0, hi0)
    H_lo = jnp.concatenate([lo0[None], H_lo])          # (max_slen+1, S)
    H_hi = jnp.concatenate([hi0[None], H_hi])

    # --- branches: substitute position p with each c' != seed[p] --------
    NB = max_slen * 3
    p_of = jnp.repeat(jnp.arange(max_slen, dtype=jnp.int32), 3)      # (NB,)
    ci_of = jnp.tile(jnp.arange(3, dtype=jnp.int32), max_slen)

    rows_b = jnp.broadcast_to(rows[:, None], (S, NB))
    p_b = jnp.broadcast_to(p_of[None, :], (S, NB))
    orig = jnp.take(
        flat, rows_b * L + jnp.clip(starts[:, None] + p_b, 0, L - 1))
    orig32 = orig.astype(jnp.int32)
    sub_c = (orig32 + 1 + ci_of[None, :]) % 4
    valid_b = (p_b < slens[:, None]) & (orig32 < 4)

    # start interval: trunk after consuming the suffix right of p —
    # gather H[t_pre, s] for each (s, b)
    t_pre = jnp.clip(slens[:, None] - 1 - p_b, 0, max_slen)          # (S, NB)
    flatH_lo = H_lo.reshape(-1)
    flatH_hi = H_hi.reshape(-1)
    sidx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, NB))
    hidx = t_pre * S + sidx
    blo = jnp.take(flatH_lo, hidx)
    bhi = jnp.take(flatH_hi, hidx)

    # one step with the substituted char
    Bl = blo.reshape(-1)
    Bh = bhi.reshape(-1)
    Bc = sub_c.reshape(-1)
    bounds = jnp.concatenate([Bl, Bh])
    ranks = rank(bwt_blocks, occ, jnp.tile(Bc, 2), bounds)
    cc = jnp.take(counts, Bc)
    alive = valid_b.reshape(-1) & (Bl < Bh)
    Bl = jnp.where(alive, cc + ranks[: S * NB], 0)
    Bh = jnp.where(alive, cc + ranks[S * NB :], 0)

    # continue exact for the remaining prefix [0, p)
    rem = jnp.clip(p_b, 0, max_slen).reshape(-1)                     # steps left
    rows_f = rows_b.reshape(-1)
    start_f = jnp.broadcast_to(starts[:, None], (S, NB)).reshape(-1)
    p_f = p_b.reshape(-1)

    def br_step(t, carry):
        lo, hi = carry
        active = t < rem
        idx = start_f + p_f - 1 - t
        c = jnp.take(flat, rows_f * L + jnp.clip(idx, 0, L - 1)).astype(jnp.int32)
        bounds = jnp.concatenate([lo, hi])
        ranks = rank(bwt_blocks, occ, jnp.tile(c, 2), bounds)
        cc = jnp.take(counts, c)
        upd = active & (lo < hi)
        return (jnp.where(upd, cc + ranks[: S * NB], lo),
                jnp.where(upd, cc + ranks[S * NB :], hi))

    Bl, Bh = jax.lax.fori_loop(0, max_slen, br_step, (Bl, Bh))
    Bh = jnp.maximum(Bl, Bh)
    return (t_lo, jnp.maximum(t_lo, t_hi),
            Bl.reshape(S, NB), Bh.reshape(S, NB),
            valid_b)
