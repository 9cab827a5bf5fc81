"""Pallas verify kernel == XLA verify (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from dream_yara_tpu.ops.pallas_verify import banded_verify_pallas
from dream_yara_tpu.ops.verify import banded_verify
from tests.conftest import mutate, random_text


def test_pallas_verify_equals_xla(rng):
    text = random_text(rng, 5000)
    text[-1] = 5
    C = 600
    anchors = rng.integers(0, 4900, C).astype(np.int32)
    reads = np.full((C, 80), 4, np.int8)
    lens = np.zeros(C, np.int32)
    for i in range(C):
        r = mutate(rng, text[anchors[i] : anchors[i] + 70].copy(),
                   n_sub=int(rng.integers(0, 3)),
                   n_ins=int(rng.integers(0, 2)),
                   n_del=int(rng.integers(0, 2)))
        reads[i, : len(r)] = r
        lens[i] = len(r)
    rows = np.arange(C, dtype=np.int32)
    args = (jnp.asarray(text), jnp.asarray(anchors), jnp.asarray(reads),
            jnp.asarray(rows), jnp.asarray(lens))
    a = banded_verify(*args, max_err=4)
    b = banded_verify_pallas(*args, max_err=4, interpret=True)
    for x, y, name in zip(a, b, ["dist", "beg", "end"]):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name


def test_pallas_hooked_verify_equals_xla_multibin(rng):
    """The flat-step (multi-bin) edition: both verifiers consume the SAME
    stacked per-bin text-block hook (bin_lane * ntb + brow addressing, OOB
    rows -> mismatch code) and must agree lane-for-lane."""
    from dream_yara_tpu.ops.pallas_verify import banded_verify_pallas_hooked

    B = 3
    texts = [random_text(rng, 2000 + 128 * b) for b in range(B)]
    n_text = max(len(t) for t in texts)
    pad128 = (-n_text) % 128
    tb = np.full((B, n_text + pad128), 7, np.int8)
    for b, t in enumerate(texts):
        tb[b, : len(t)] = t
        tb[b, len(t):] = 7
    ntb = (n_text + pad128) // 128
    tb_flat = jnp.asarray(tb.reshape(B * ntb, 128))

    C = 500
    bin_lane = rng.integers(0, B, C).astype(np.int32)
    anchors = np.zeros(C, np.int32)
    reads = np.full((C, 90), 4, np.int8)
    lens = np.zeros(C, np.int32)
    for i in range(C):
        t = texts[bin_lane[i]]
        anchors[i] = int(rng.integers(0, len(t) - 90))
        r = mutate(rng, t[anchors[i] : anchors[i] + 80].copy(),
                   n_sub=int(rng.integers(0, 3)),
                   n_ins=int(rng.integers(0, 2)),
                   n_del=int(rng.integers(0, 2)))
        reads[i, : len(r)] = r
        lens[i] = len(r)
    # some lanes anchored at text edges (negative / past-end brows)
    anchors[:5] = [0, 1, len(texts[0]) - 10, 3, 2]
    bin_lane[:5] = [0, 1, 0, 2, 1]
    bl = jnp.asarray(bin_lane)

    def tb_fetch(brow):
        bad = (brow < 0) | (brow >= ntb)
        r = jnp.take(tb_flat, jnp.clip(bl * ntb + brow, 0,
                                       tb_flat.shape[0] - 1), axis=0)
        return jnp.where(bad[:, None], jnp.int8(7), r)

    rows = jnp.arange(C, dtype=jnp.int32)
    a = banded_verify(None, jnp.asarray(anchors), jnp.asarray(reads), rows,
                      jnp.asarray(lens), max_err=4, tblock_fetch=tb_fetch)
    b = banded_verify_pallas_hooked(
        jnp.asarray(anchors), jnp.asarray(reads), rows, jnp.asarray(lens),
        max_err=4, tblock_fetch=tb_fetch, interpret=True)
    for x, y, name in zip(a, b, ["dist", "beg", "end"]):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name
