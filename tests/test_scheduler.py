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


def test_linear_bijection_2pow40_ids():
    # Exactness of the f64 closed-form inversion at extreme pair ids
    # (~1.5M-sequence all-vs-all territory): the sqrt correction must
    # recover exact (i, j) at 2^40-scale ids.
    rng = np.random.default_rng(7)
    ids = np.concatenate([
        rng.integers(0, 1 << 40, 1000).astype(np.int64),
        np.array([0, 1, (1 << 40) - 1, 1 << 40], dtype=np.int64),
    ])
    i, j = linear_to_pair(ids)
    assert np.all(i >= 0) and np.all(i < j)
    np.testing.assert_array_equal(pair_to_linear(i, j), ids)
    # boundary ids around triangle row starts, where sqrt rounding bites
    js = rng.integers(2, 2_000_000, 500).astype(np.int64)
    for off in (0, 1):
        b = js * (js - 1) // 2 + (js - 1) * off  # first/last id of row j
        bi, bj = linear_to_pair(b)
        np.testing.assert_array_equal(pair_to_linear(bi, bj), b)
        np.testing.assert_array_equal(bj, js)


def test_oversized_buckets_split_at_build():
    # A 20M-sequence short-read schedule (metadata only) must not produce
    # any bucket beyond the f32-exact inversion range: oversized buckets are
    # split into same-edge chunks whose pair spaces are plain rectangles.
    from sequencealigner_tpu.scheduler import BUCKET_ROWS_MAX

    n = 20_000_000
    lengths = np.full(n, 100, np.int32)
    sched = Schedule.build(lengths)
    assert all(b.count <= BUCKET_ROWS_MAX for b in sched.buckets)
    assert len(sched.buckets) >= 2  # actually split
    # bucket ranges tile [0, n) without overlap
    assert sched.buckets[0].start == 0
    for x, y in zip(sched.buckets, sched.buckets[1:]):
        assert x.end == y.start
    assert sched.buckets[-1].end == n
    # pair space conserved across combos
    total = sum(sched.combo_pair_count(a, b) for a, b in sched.combos())
    assert total == sched.total_pairs() == n * (n - 1) // 2


def test_split_bucket_blocks_cover_exactly():
    # Same-edge split buckets: every pair appears exactly once across blocks.
    import sequencealigner_tpu.scheduler as sch

    old = sch.BUCKET_ROWS_MAX
    sch.BUCKET_ROWS_MAX = 16
    try:
        lengths = np.full(40, 30, np.int32)
        sched = Schedule.build(lengths)
        assert len(sched.buckets) >= 2
        seen = set()
        for a, b in sched.combos():
            for blk in sched.blocks(a, b, width=8):
                for i, j, v in zip(blk.orig_i, blk.orig_j, blk.valid):
                    if v:
                        assert (i, j) not in seen
                        seen.add((int(i), int(j)))
    finally:
        sch.BUCKET_ROWS_MAX = old
    assert len(seen) == 40 * 39 // 2
