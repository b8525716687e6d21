"""XLA wavefront DP vs the NumPy oracle: bit-exact over random blocks with
mixed lengths, all three algorithms, protein + nucleotide matrices."""

import zlib

import numpy as np
import pytest

from sequencealigner_tpu import matrices
from sequencealigner_tpu.ops import oracle
from sequencealigner_tpu.ops.xla_dp import PAD, align_block, padded_submatrix

M_ = matrices.get("blosum62")
SUB_P = padded_submatrix(M_.matrix)



def random_block(rng, B, Lc, Lk, nsym=20):
    l1 = rng.integers(1, Lc + 1, B).astype(np.int32)
    l2 = rng.integers(1, Lk + 1, B).astype(np.int32)
    s1 = np.full((B, Lc), PAD, dtype=np.int32)
    s2 = np.full((B, Lk), PAD, dtype=np.int32)
    for b in range(B):
        s1[b, : l1[b]] = rng.integers(0, nsym, l1[b])
        s2[b, : l2[b]] = rng.integers(0, nsym, l2[b])
    return s1, s2, l1, l2


def check_block(algo, gaps, mat="blosum62", B=16, Lc=24, Lk=17, nsym=20, seed=0):
    rng = np.random.default_rng(abs(seed))
    m = matrices.get(mat)
    s1, s2, l1, l2 = random_block(rng, B, Lc, Lk, nsym)
    got = np.asarray(
        align_block(
            s1, s2, l1, l2,
            padded_submatrix(m.matrix),
            np.array(gaps, dtype=np.int32),
            algo=algo, Lc=Lc, Lk=Lk,
        )
    )
    kw = {"gap": gaps[0], "opn": gaps[1], "ext": gaps[2]}
    want = np.array(
        [
            oracle.align_score(algo, s1[b, : l1[b]], s2[b, : l2[b]], m.matrix, **kw)
            for b in range(B)
        ],
        dtype=np.int32,
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("gap", [-1, -4, -10])
def test_nw_matches_oracle(gap):
    check_block("nw", (gap, 0, 0), seed=gap)


@pytest.mark.parametrize("opn,ext", [(-10, -1), (-4, -4), (-2, -1), (-11, -2), (-1, -5)])
def test_ga_matches_oracle(opn, ext):
    check_block("ga", (0, opn, ext), seed=opn * 31 + ext)


@pytest.mark.parametrize("opn,ext", [(-10, -1), (-5, -5), (-3, -1), (-2, -7)])
def test_sw_matches_oracle(opn, ext):
    check_block("sw", (0, opn, ext), seed=opn * 17 + ext)


def test_nucleotide_matrix():
    check_block("nw", (-4, 0, 0), mat="nuc44", nsym=15, seed=7)
    check_block("sw", (0, -8, -2), mat="dnafull", nsym=15, seed=8)


def test_extreme_length_imbalance():
    # l1 = Lc while l2 = 1 and vice versa.
    m = matrices.get("blosum62")
    rng = np.random.default_rng(3)
    Lc, Lk, B = 32, 8, 4
    s1 = np.full((B, Lc), PAD, np.int32)
    s2 = np.full((B, Lk), PAD, np.int32)
    l1 = np.array([Lc, 1, Lc, 1], np.int32)
    l2 = np.array([1, Lk, Lk, 1], np.int32)
    for b in range(B):
        s1[b, : l1[b]] = rng.integers(0, 20, l1[b])
        s2[b, : l2[b]] = rng.integers(0, 20, l2[b])
    for algo, gaps in (("nw", (-3, 0, 0)), ("ga", (0, -10, -1)), ("sw", (0, -10, -1))):
        got = np.asarray(
            align_block(s1, s2, l1, l2, padded_submatrix(m.matrix),
                        np.array(gaps, np.int32), algo=algo, Lc=Lc, Lk=Lk)
        )
        kw = {"gap": gaps[0], "opn": gaps[1], "ext": gaps[2]}
        want = [
            oracle.align_score(algo, s1[b, : l1[b]], s2[b, : l2[b]], m.matrix, **kw)
            for b in range(B)
        ]
        np.testing.assert_array_equal(got, np.array(want, np.int32))


def test_single_cell_tables():
    # 1x1 DP: the smallest possible alignment.
    m = matrices.get("blosum62")
    s1 = np.array([[2] + [PAD] * 7], np.int32)
    s2 = np.array([[2] + [PAD] * 3], np.int32)
    one = np.array([1], np.int32)
    score = int(m.matrix[2, 2])
    for algo, gaps, want in (
        ("nw", (-5, 0, 0), score),
        ("ga", (0, -10, -1), score),
        ("sw", (0, -10, -1), max(score, 0)),
    ):
        got = np.asarray(
            align_block(s1, s2, one, one, padded_submatrix(m.matrix),
                        np.array(gaps, np.int32), algo=algo, Lc=8, Lk=4)
        )
        assert got[0] == want


@pytest.mark.parametrize(
    "algo,gaps", [("nw", (-4, 0, 0)), ("ga", (0, -10, -1)), ("sw", (0, -8, -2))]
)
def test_streamed_matches_materialized(algo, gaps):
    from sequencealigner_tpu.ops.xla_dp import align_block_streamed

    rng = np.random.default_rng(zlib.crc32(algo.encode()) % 2**30)
    B, Lc, Lk = 16, 150, 90  # several CD=64 chunks, mixed lengths
    l1 = rng.integers(1, Lc + 1, B).astype(np.int32)
    l2 = rng.integers(1, Lk + 1, B).astype(np.int32)
    s1 = np.full((B, Lc), PAD, np.int32)
    s2 = np.full((B, Lk), PAD, np.int32)
    for b in range(B):
        s1[b, : l1[b]] = rng.integers(0, 20, l1[b])
        s2[b, : l2[b]] = rng.integers(0, 20, l2[b])
    g = np.array(gaps, np.int32)
    want = np.asarray(
        align_block(s1, s2, l1, l2, SUB_P, g, algo=algo, Lc=Lc, Lk=Lk)
    )
    got = np.asarray(
        align_block_streamed(
            s1, s2, l1, l2, SUB_P, g, algo=algo, Lc=Lc, Lk=Lk, CD=64
        )
    )
    np.testing.assert_array_equal(got, want)
