"""Hand-checked cases for the NumPy oracle DP (the root of the correctness
chain: oracle == reference recurrences, kernels == oracle)."""

import numpy as np

from sequencealigner_tpu import matrices
from sequencealigner_tpu.ops import oracle


def enc(seq, lut):
    return np.array([lut[ord(c)] for c in seq], dtype=np.int32)


def test_nw_identical_sequences():
    m = matrices.get("blosum62")
    s = enc("ARNDARND", m.lut)
    # Perfect self-alignment: sum of diagonal scores.
    expected = sum(int(m.matrix[c, c]) for c in s)
    assert oracle.nw_linear(s, s, m.matrix, -4) == expected


def test_nw_tiny_hand_computed():
    # Alphabet of 2, match=+2 mismatch=-1, gap=-2.
    sub = np.array([[2, -1], [-1, 2]])
    a = np.array([0, 1])  # "AB"
    b = np.array([0, 0, 1])  # "AAB"
    # Best: A-A match(2), gap(-2), B-B match(2) = 2.
    assert oracle.nw_linear(a, b, sub, -2) == 2
    assert oracle.nw_linear(b, a, sub, -2) == 2  # symmetric


def test_nw_empty_vs_gap_cost_borders():
    sub = np.array([[1]])
    a = np.array([0, 0, 0])
    b = np.array([0])
    # Align AAA vs A with gap -3: one match +1, two gaps -6 = -5.
    assert oracle.nw_linear(a, b, sub, -3) == -5


def test_ga_equals_nw_when_open_equals_extend():
    """Gotoh with open == extend must equal NW with that linear penalty (the
    reference offers exactly this switch, src/bio/method/ga.c:70-88)."""
    rng = np.random.default_rng(0)
    m = matrices.get("blosum62")
    for _ in range(10):
        s1 = rng.integers(0, 20, rng.integers(1, 12)).astype(np.int32)
        s2 = rng.integers(0, 20, rng.integers(1, 12)).astype(np.int32)
        g = -int(rng.integers(1, 6))
        assert oracle.ga_affine(s1, s2, m.matrix, g, g) == oracle.nw_linear(
            s1, s2, m.matrix, g
        )


def test_sw_hand_computed():
    sub = np.array([[3, -3], [-3, 3]])
    a = np.array([0, 0, 1, 1, 0])  # AABBA
    b = np.array([1, 0, 0, 1])  # BAAB
    # Local best: "AAB" vs "AAB" = 9.
    assert oracle.sw_affine(a, b, sub, -5, -2) == 9


def test_sw_no_positive_is_zero():
    sub = np.array([[-1]])
    a = np.array([0, 0])
    b = np.array([0, 0, 0])
    assert oracle.sw_affine(a, b, sub, -5, -2) == 0


def test_sw_at_most_self_score():
    rng = np.random.default_rng(1)
    m = matrices.get("blosum62")
    for _ in range(10):
        s1 = rng.integers(0, 20, rng.integers(2, 15)).astype(np.int32)
        s2 = rng.integers(0, 20, rng.integers(2, 15)).astype(np.int32)
        sw = oracle.sw_affine(s1, s2, m.matrix, -11, -1)
        self1 = oracle.sw_affine(s1, s1, m.matrix, -11, -1)
        assert 0 <= sw <= self1


def test_scores_symmetric_all_algos():
    rng = np.random.default_rng(2)
    m = matrices.get("blosum62")
    for _ in range(5):
        s1 = rng.integers(0, 20, rng.integers(1, 10)).astype(np.int32)
        s2 = rng.integers(0, 20, rng.integers(1, 10)).astype(np.int32)
        assert oracle.nw_linear(s1, s2, m.matrix, -4) == oracle.nw_linear(s2, s1, m.matrix, -4)
        assert oracle.ga_affine(s1, s2, m.matrix, -10, -1) == oracle.ga_affine(s2, s1, m.matrix, -10, -1)
        assert oracle.sw_affine(s1, s2, m.matrix, -10, -1) == oracle.sw_affine(s2, s1, m.matrix, -10, -1)
