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
