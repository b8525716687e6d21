"""native/hostops.c vs the NumPy fallbacks: bit-identical behavior."""

import numpy as np
import pytest

from sequencealigner_tpu import matrices
from sequencealigner_tpu.io import native
from sequencealigner_tpu.io.input import SequenceSet
from sequencealigner_tpu.io.output import OutputStore, alignments

M = matrices.get("blosum62")

pytestmark = pytest.mark.skipif(
    native.hostops() is None, reason="no C toolchain for hostops"
)


def _pairs(rng, dim, n):
    j = rng.integers(1, dim, n).astype(np.int64)
    i = (rng.integers(0, 10**9, n) % j).astype(np.int64)
    s = rng.integers(-1000, 1000, n).astype(np.int32)
    # dedupe pairs so scatter order can't matter
    key = j * dim + i
    _, idx = np.unique(key, return_index=True)
    return i[idx], j[idx], s[idx]


def test_fill_pairs_tri_matches_numpy():
    rng = np.random.default_rng(0)
    dim = 67
    i, j, s = _pairs(rng, dim, 400)
    a = np.zeros(alignments(dim), np.int32)
    b = np.zeros(alignments(dim), np.int32)
    assert native.fill_pairs_tri(a, i, j, s)
    b[j * (j - 1) // 2 + i] = s
    np.testing.assert_array_equal(a, b)


def test_fill_pairs_full_matches_numpy():
    rng = np.random.default_rng(1)
    dim = 53
    i, j, s = _pairs(rng, dim, 300)
    a = np.zeros(dim * dim, np.int32)
    b = np.zeros(dim * dim, np.int32)
    assert native.fill_pairs_full(a, dim, i, j, s)
    b[i * dim + j] = s
    b[j * dim + i] = s
    np.testing.assert_array_equal(a, b)


def test_rows_from_tri_matches_python():
    rng = np.random.default_rng(2)
    dim = 41
    store = OutputStore(dim, triangular=True, spill=False)
    store.matrix[:] = rng.integers(-500, 500, alignments(dim)).astype(np.int32)
    got = native.rows_from_tri(store.matrix, dim, 5, 30)
    want = np.stack([store.row(r) for r in range(5, 30)])
    np.testing.assert_array_equal(got, want)
    # full-range reconstruction must be symmetric with zero diagonal
    full = native.rows_from_tri(store.matrix, dim, 0, dim)
    np.testing.assert_array_equal(full, full.T)
    assert (np.diag(full) == 0).all()


def test_pack_rows_matches_python():
    rng = np.random.default_rng(3)
    seqs = [
        rng.choice(np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8),
                   int(rng.integers(1, 30)))
        for _ in range(25)
    ]
    ss = SequenceSet.from_list(seqs, M.lut)
    order = rng.permutation(ss.num).astype(np.int64)
    edge = 32
    got = native.pack_rows(ss.data, ss.offsets, order, edge, ss.lut, 24)
    want = np.full((len(order), edge), 24, np.int8)
    for local, orig in enumerate(order):
        s = ss.data[ss.offsets[orig] : ss.offsets[orig + 1]]
        want[local, : len(s)] = ss.lut[s]
    np.testing.assert_array_equal(got, want)
