import numpy as np
import pytest

from dream_yara_tpu.index.suffix_array import build_suffix_array, sa_numpy
from tests.conftest import random_text


def naive_sa(text):
    t = bytes(np.asarray(text, dtype=np.uint8))
    return np.array(sorted(range(len(t)), key=lambda i: t[i:]), dtype=np.int32)


@pytest.mark.parametrize("n", [1, 2, 10, 100, 1000])
def test_sa_numpy_matches_naive(rng, n):
    text = random_text(rng, n)
    assert np.array_equal(sa_numpy(text), naive_sa(text))


def test_sa_repetitive(rng):
    text = np.tile(np.array([0, 1, 0, 1, 2], dtype=np.int8), 50)
    assert np.array_equal(sa_numpy(text), naive_sa(text))
    text = np.zeros(500, dtype=np.int8)  # worst case: unary string
    assert np.array_equal(sa_numpy(text), naive_sa(text))


def test_sa_with_sentinels(rng):
    text = random_text(rng, 200)
    text[::37] = 5  # sprinkle sentinels
    assert np.array_equal(sa_numpy(text), naive_sa(text))


def test_sa_empty():
    assert len(sa_numpy(np.zeros(0, dtype=np.int8))) == 0


def test_build_dispatch(rng):
    text = random_text(rng, 300)
    assert np.array_equal(build_suffix_array(text), naive_sa(text))
