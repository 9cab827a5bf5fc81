"""Uniform-length seed-char fast path == gather path, value-exact.

The fast path (map_step._uniform_seed_chars + seed_search chars_fe) replaces
per-trip read-matrix char gathers with static slices when every read has the
same length; its SA intervals, anchors and final matches must be bit-identical
to the generic gather path (docs/OUTPUT_CONTRACT.md determinism)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.ops.backward_search import seed_search
from dream_yara_tpu.ops.device_index import DeviceFM
from dream_yara_tpu.pipeline.map_step import (
    _uniform_seed_chars, max_seed_len_static, seed_stop_depth,
    single_bin_map_step)
from dream_yara_tpu.pipeline.seeding import make_seeds, rate_to_ppm
from tests.conftest import mutate, random_text


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(21)
    text = random_text(rng, 6000)
    text[-1] = 5
    fm = FMIndex.build(text)
    dev = DeviceFM.from_host(fm, text)
    return rng, text, fm, dev


def _reads_matrix(rng, text, n, L, rate):
    """Uniform-L fwd+rc read rows with planted errors + padding rows."""
    from dream_yara_tpu.utils.alphabet import revcomp

    starts = rng.integers(0, len(text) - L - 1, n)
    fwd = np.stack([mutate(rng, text[p : p + L], n_sub=int(L * rate))
                    for p in starts])
    # two padding rows per half (simulates chunk padding: length 0)
    pad = np.full((2, L), 4, dtype=np.int8)
    rows = np.concatenate([fwd, pad, np.stack([revcomp(r) for r in fwd]), pad])
    lengths = np.concatenate([np.full(n, L, np.int32), np.zeros(2, np.int32)])
    return rows.astype(np.int8), lengths


def test_seed_search_chars_fe_exact(db):
    rng, text, fm, dev = db
    L, rate = 100, 0.03
    rate_ppm = rate_to_ppm(rate)
    max_err = int(L * rate)
    reads, lengths = _reads_matrix(rng, text, 24, L, rate)
    R2 = reads.shape[0]

    rows, starts, slens = make_seeds(jnp.asarray(lengths), R2, rate_ppm,
                                     max_err)
    t_stop = seed_stop_depth(fm.prefix_q)
    slens_eff = jnp.minimum(slens, t_stop)
    starts_eff = starts + (slens - slens_eff)
    msl = min(max_seed_len_static(L, rate_ppm), t_stop)

    args = (dev.bwt_blocks, dev.occ, dev.counts, dev.n, jnp.asarray(reads),
            rows, starts_eff, slens_eff, msl)
    kw = dict(pfx_lo=dev.pfx_lo, pfx_hi=dev.pfx_hi, prefix_q=fm.prefix_q,
              fused=dev.fused)
    lo_g, hi_g, ms_g = seed_search(*args, **kw)
    chars_fe = _uniform_seed_chars(jnp.asarray(reads), L, rate_ppm, max_err,
                                   t_stop, msl)
    lo_f, hi_f, ms_f = seed_search(*args, **kw, chars_fe=chars_fe)
    assert np.array_equal(np.asarray(lo_g), np.asarray(lo_f))
    assert np.array_equal(np.asarray(hi_g), np.asarray(hi_f))
    assert np.array_equal(np.asarray(ms_g), np.asarray(ms_f))


def test_seed_search_chars_fe_exact_no_table(db):
    """Without a prefix table (prefix_q=0) the single-slice branch runs."""
    rng, text, fm, dev = db
    L, rate = 60, 0.03
    rate_ppm = rate_to_ppm(rate)
    max_err = int(L * rate)
    reads, lengths = _reads_matrix(rng, text, 16, L, rate)
    R2 = reads.shape[0]

    rows, starts, slens = make_seeds(jnp.asarray(lengths), R2, rate_ppm,
                                     max_err)
    t_stop = seed_stop_depth(0)
    slens_eff = jnp.minimum(slens, t_stop)
    starts_eff = starts + (slens - slens_eff)
    msl = min(max_seed_len_static(L, rate_ppm), t_stop)

    args = (dev.bwt_blocks, dev.occ, dev.counts, dev.n, jnp.asarray(reads),
            rows, starts_eff, slens_eff, msl)
    lo_g, hi_g, ms_g = seed_search(*args)
    chars_fe = _uniform_seed_chars(jnp.asarray(reads), L, rate_ppm, max_err,
                                   t_stop, msl)
    lo_f, hi_f, ms_f = seed_search(*args, chars_fe=chars_fe)
    assert np.array_equal(np.asarray(lo_g), np.asarray(lo_f))
    assert np.array_equal(np.asarray(hi_g), np.asarray(hi_f))
    assert np.array_equal(np.asarray(ms_g), np.asarray(ms_f))


def test_map_step_uniform_flag_exact(db):
    """Full map step: uniform_len=True output == uniform_len=False output."""
    rng, text, fm, dev = db
    L, rate = 100, 0.03
    rate_ppm = rate_to_ppm(rate)
    max_err = int(L * rate)
    reads, lengths = _reads_matrix(rng, text, 24, L, rate)

    kw = dict(rate_ppm=rate_ppm, max_errors=max_err, capacity=8,
              max_slen=max_seed_len_static(L, rate_ppm),
              compact_cap=reads.shape[0], prefix_q=fm.prefix_q)
    a = single_bin_map_step(dev, jnp.asarray(reads), jnp.asarray(lengths),
                            uniform_len=False, **kw)
    b = single_bin_map_step(dev, jnp.asarray(reads), jnp.asarray(lengths),
                            uniform_len=True, **kw)
    for f in a._fields:
        assert np.array_equal(np.asarray(getattr(a, f)),
                              np.asarray(getattr(b, f))), f
