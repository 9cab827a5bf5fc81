import numpy as np

from dream_yara_tpu.utils import alphabet as ab


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = ab.encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert ab.decode(codes) == "ACGTNACGTN"


def test_unknown_chars_map_to_n():
    assert list(ab.encode("RYKM-")) == [ab.N] * 5


def test_revcomp():
    codes = ab.encode("ACGTN")
    assert ab.decode(ab.revcomp(codes)) == "NACGT"
    # revcomp is an involution on DNA
    r = np.random.default_rng(1).integers(0, 5, 100).astype(np.int8)
    assert np.array_equal(ab.revcomp(ab.revcomp(r)), r)


def test_pack_unpack_2bit():
    rng = np.random.default_rng(2)
    for n in [0, 1, 15, 16, 17, 100]:
        codes = rng.integers(0, 4, n).astype(np.int8)
        words = ab.pack_2bit(codes)
        assert np.array_equal(ab.unpack_2bit(words, n), codes)
