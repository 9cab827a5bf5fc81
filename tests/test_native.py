"""Native C++ components vs NumPy oracles."""

import numpy as np
import pytest

from dream_yara_tpu.index.suffix_array import sa_numpy
from dream_yara_tpu.native import sais
from tests.conftest import random_text

pytestmark = pytest.mark.skipif(not sais.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("n", [0, 1, 2, 17, 500, 20000])
def test_sais_matches_numpy(rng, n):
    text = random_text(rng, n)
    assert np.array_equal(sais.suffix_array(text), sa_numpy(text))


def test_sais_with_sentinels_and_repeats(rng):
    text = random_text(rng, 5000)
    text[::41] = 5
    assert np.array_equal(sais.suffix_array(text), sa_numpy(text))
    uni = np.zeros(3000, dtype=np.int8)
    assert np.array_equal(sais.suffix_array(uni), sa_numpy(uni))
    per = np.tile(np.array([3, 1, 2], dtype=np.int8), 2000)
    assert np.array_equal(sais.suffix_array(per), sa_numpy(per))


def test_build_dispatches_to_native(rng):
    from dream_yara_tpu.index.suffix_array import build_suffix_array
    text = random_text(rng, 1000)
    assert np.array_equal(build_suffix_array(text), sa_numpy(text))
