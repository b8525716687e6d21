import numpy as np
import pytest

from sequencealigner_tpu.scheduler import (
    Schedule,
    block_width,
    bucket_edges,
    linear_to_pair,
    pair_count,
    pair_to_linear,
)


def test_linear_bijection_roundtrip():
    ids = np.arange(pair_count(200), dtype=np.int64)
    i, j = linear_to_pair(ids)
    assert np.all(i < j)
    np.testing.assert_array_equal(pair_to_linear(i, j), ids)


def test_linear_bijection_matches_packed_layout():
    # Pair (i<j) lives at alignments(j)+i, the reference's packed index
    # (util/macros.h:13, output.c:82).
    assert pair_to_linear(np.array([0]), np.array([1]))[0] == 0
    assert pair_to_linear(np.array([2]), np.array([5]))[0] == 5 * 4 // 2 + 2


def test_linear_bijection_large_ids():
    ids = np.array([0, 1, 10**12, 5 * 10**14], dtype=np.int64)
    i, j = linear_to_pair(ids)
    np.testing.assert_array_equal(pair_to_linear(i, j), ids)


def test_bucket_edges():
    assert bucket_edges(10) == [16]
    assert bucket_edges(16) == [16]
    assert bucket_edges(100) == [16, 24, 32, 64, 96, 128]
    assert bucket_edges(8192)[-1] == 8192
    assert bucket_edges(100000)[-1] >= 100000
    # edges are multiples of 8 (the kernel's column granularity); the
    # beyond-table growth additionally keeps them 32-multiples
    for e in bucket_edges(100000):
        assert e % 8 == 0, e
        if e > 8192:
            assert e % 32 == 0, e


def test_block_width_scaling():
    assert block_width(4096, 4096) >= 8
    assert block_width(16, 16) == 4096
    assert block_width(128, 128) == 1024


def _full_cover_check(lengths):
    """Every pair appears exactly once across all combo blocks."""
    lengths = np.asarray(lengths, np.int32)
    n = len(lengths)
    sched = Schedule.build(lengths)
    seen = set()
    for a, b in sched.combos():
        for blk in sched.blocks(a, b, width=16):
            for t in range(len(blk.valid)):
                if not blk.valid[t]:
                    continue
                i, j = int(blk.orig_i[t]), int(blk.orig_j[t])
                assert i < j
                assert (i, j) not in seen
                seen.add((i, j))
                # length bookkeeping: l1/l2 match the original sequences and
                # the longer one is the column dimension
                li, lj = int(lengths[i]), int(lengths[j])
                assert {int(blk.l1[t]), int(blk.l2[t])} == {li, lj}
                assert int(blk.l1[t]) >= int(blk.l2[t])
                assert int(blk.l1[t]) <= blk.Lc and int(blk.l2[t]) <= blk.Lk
                assert blk.Lk <= blk.Lc
    assert len(seen) == pair_count(n)
    assert sched.total_pairs() == pair_count(n)


def test_blocks_cover_pair_space_mixed_lengths():
    rng = np.random.default_rng(0)
    _full_cover_check(rng.integers(1, 200, 67))


def test_blocks_cover_pair_space_uniform():
    _full_cover_check(np.full(25, 13))


def test_blocks_cover_two_sequences():
    _full_cover_check([5, 300])


def test_total_cells():
    lengths = np.array([3, 5, 7], np.int64)
    sched = Schedule.build(lengths)
    assert sched.total_cells() == 3 * 5 + 3 * 7 + 5 * 7
