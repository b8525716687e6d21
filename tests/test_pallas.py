"""Pallas wavefront kernel vs the NumPy oracle, run in interpret mode on CPU
(the TPU build of the same kernel is validated on hardware; see
.claude/skills/verify)."""

import zlib

import numpy as np
import pytest

from sequencealigner_tpu import matrices
from sequencealigner_tpu.ops import oracle
from sequencealigner_tpu.ops.pallas_dp import (
    PAD_MARK,
    align_superblock,
    build_skewed_scores,
    pick_B,
    pick_CD,
    round_up,
)
from sequencealigner_tpu.ops.xla_dp import PAD, padded_submatrix

M = matrices.get("blosum62")
SUB_P = padded_submatrix(M.matrix)


def random_block(rng, n, Lc, Lk):
    l1 = rng.integers(1, Lc + 1, n).astype(np.int32)
    l2 = rng.integers(1, Lk + 1, n).astype(np.int32)
    s1 = np.full((n, Lc), PAD, np.int32)
    s2 = np.full((n, Lk), PAD, np.int32)
    for b in range(n):
        s1[b, : l1[b]] = rng.integers(0, 20, l1[b])
        s2[b, : l2[b]] = rng.integers(0, 20, l2[b])
    return s1, s2, l1, l2


@pytest.mark.parametrize(
    "algo,gaps", [("nw", (-4, 0, 0)), ("ga", (0, -10, -1)), ("sw", (0, -8, -2))]
)
def test_kernel_matches_oracle(algo, gaps):
    rng = np.random.default_rng(zlib.crc32(algo.encode()))
    B, Lc, Lk = 128, 21, 13
    s1, s2, l1, l2 = random_block(rng, B, Lc, Lk)
    got = np.asarray(
        align_superblock(
            s1, s2, l1, l2, SUB_P, np.array(gaps, np.int32),
            algo=algo, Lc=Lc, Lk=Lk, B=B, interpret=True,
        )
    )
    kw = {"gap": gaps[0], "opn": gaps[1], "ext": gaps[2]}
    for b in range(0, B, 7):
        want = oracle.align_score(
            algo, s1[b, : l1[b]], s2[b, : l2[b]], M.matrix, **kw
        )
        assert got[b] == want, (algo, b, got[b], want)


def test_kernel_multi_superblock_and_chunks():
    # S > 1 superblocks and several diagonal chunks exercise state
    # (re)initialization and chunk-boundary carry.
    rng = np.random.default_rng(5)
    B, Lc, Lk = 128, 70, 40
    s1, s2, l1, l2 = random_block(rng, 3 * B, Lc, Lk)
    got = np.asarray(
        align_superblock(
            s1, s2, l1, l2, SUB_P, np.array([0, -11, -1], np.int32),
            algo="ga", Lc=Lc, Lk=Lk, B=B, interpret=True,
        )
    )
    for b in range(0, 3 * B, 37):
        want = oracle.ga_affine(s1[b, : l1[b]], s2[b, : l2[b]], M.matrix, -11, -1)
        assert got[b] == want, (b, got[b], want)


def test_skewed_score_builder():
    """SK[n, r, d-1] must equal sub[s2[r], s1[d-r-2]] at valid cells (state
    row r holds DP row k = r + 1) and PAD_MARK outside."""
    rng = np.random.default_rng(2)
    n, Lc, Lk = 4, 11, 7
    Kpad, Dpad = round_up(Lk, 32), round_up(Lc + Lk, 16)
    s1, s2, l1, l2 = random_block(rng, n, Lc, Lk)
    sk = np.asarray(
        build_skewed_scores(s1, s2, SUB_P, Lc=Lc, Lk=Lk, Kpad=Kpad, Dpad=Dpad)
    )
    assert sk.shape == (n, Kpad, Dpad)
    for b in range(n):
        for r in range(Kpad):
            for d in range(1, Dpad + 1):
                c0 = d - r - 2
                if r < Lk and 0 <= c0 < Lc:
                    a, bb = s2[b, r], s1[b, c0]
                    want = (
                        PAD_MARK if (a == PAD or bb == PAD) else M.matrix[a, bb]
                    )
                else:
                    want = PAD_MARK
                assert sk[b, r, d - 1] == want, (b, r, d)


def test_geometry_helpers():
    assert round_up(65, 32) == 96
    assert pick_B(32) >= 128
    Kpad, B = 160, 256
    cd = pick_CD(256, Kpad, B)
    assert cd % 16 == 0 and cd * Kpad * B <= (2 << 20)


@pytest.mark.parametrize(
    "algo,gaps", [("nw", (-4, 0, 0)), ("ga", (0, -10, -1)), ("sw", (0, -8, -2))]
)
def test_banded_kernel_matches_oracle(algo, gaps):
    from sequencealigner_tpu.ops.pallas_dp import align_superblock_banded

    rng = np.random.default_rng(zlib.crc32(algo.encode()) % 2**31)
    B, Lc, Lk = 128, 80, 70  # nb = 3 bands, last band partially padded
    s1, s2, l1, l2 = random_block(rng, B, Lc, Lk)
    got = np.asarray(
        align_superblock_banded(
            s1, s2, l1, l2, SUB_P, np.array(gaps, np.int32),
            algo=algo, Lc=Lc, Lk=Lk, B=B, interpret=True,
        )
    )
    kw = {"gap": gaps[0], "opn": gaps[1], "ext": gaps[2]}
    for b in range(0, B, 11):
        want = oracle.align_score(
            algo, s1[b, : l1[b]], s2[b, : l2[b]], M.matrix, **kw
        )
        assert got[b] == want, (algo, b, got[b], want)


def test_banded_multi_superblock():
    from sequencealigner_tpu.ops.pallas_dp import align_superblock_banded

    rng = np.random.default_rng(17)
    B, Lc, Lk = 128, 100, 96
    s1, s2, l1, l2 = random_block(rng, 2 * B, Lc, Lk)
    got = np.asarray(
        align_superblock_banded(
            s1, s2, l1, l2, SUB_P, np.array([0, -11, -1], np.int32),
            algo="ga", Lc=Lc, Lk=Lk, B=B, interpret=True,
        )
    )
    for b in range(0, 2 * B, 29):
        want = oracle.ga_affine(s1[b, : l1[b]], s2[b, : l2[b]], M.matrix, -11, -1)
        assert got[b] == want, (b, got[b], want)
