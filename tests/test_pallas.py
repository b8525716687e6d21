"""Pallas column-sweep kernel vs the NumPy oracle, run in interpret mode on
CPU (the TPU build of the same kernel is validated on hardware; see
.claude/skills/verify)."""

import zlib

import numpy as np
import pytest

from sequencealigner_tpu import matrices
from sequencealigner_tpu.ops import oracle
from sequencealigner_tpu.ops.pallas_dp import (
    KB,
    PAD_MARK,
    align_superblock,
    build_stream,
    geometry,
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


GAP_CASES = [
    ("nw", (-4, 0, 0)),
    ("ga", (0, -10, -1)),
    ("sw", (0, -8, -2)),
    # extend WORSE than open: exercises the max(opn, ext) border slope (a
    # border gap may re-open every step) and the y-scan slope max(e, o).
    ("ga", (0, -1, -5)),
    ("sw", (0, -2, -7)),
    ("ga", (0, -3, -3)),
]


@pytest.mark.parametrize("algo,gaps", GAP_CASES)
def test_kernel_matches_oracle(algo, gaps):
    rng = np.random.default_rng(zlib.crc32(algo.encode()))
    B, Lc, Lk = 128, 21, 13  # single band, partially padded
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


@pytest.mark.parametrize("algo,gaps", GAP_CASES)
def test_kernel_multi_band(algo, gaps):
    """Lk = 70 -> 3 bands, last partially padded: exercises the band-crossing
    `prev` column streams (incl. the slot-0 left-border seed) and the
    per-band capture rows."""
    rng = np.random.default_rng(zlib.crc32(algo.encode()) % 2**31)
    B, Lc, Lk = 128, 80, 70
    s1, s2, l1, l2 = random_block(rng, B, Lc, Lk)
    got = np.asarray(
        align_superblock(
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


def test_kernel_multi_superblock_and_chunks():
    # S > 1 superblocks and several column chunks exercise state
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


def test_stream_builder():
    """SK[s, w, k, b] must equal sub[s2[k], s1[w]] at valid cells and
    PAD_MARK at pad rows/columns."""
    rng = np.random.default_rng(2)
    S, B, Lc, Lk = 1, 128, 40, 37
    nb, Kpad, CD, W = geometry(Lc, Lk, B)
    s1, s2, l1, l2 = random_block(rng, S * B, Lc, Lk)
    sk = np.asarray(
        build_stream(s1, s2, SUB_P, S=S, B=B, Lc=Lc, Lk=Lk, Kpad=Kpad, W=W)
    )
    assert sk.shape == (S, W, Kpad, B)
    for k in range(0, Kpad, 3):
        for w in range(0, W, 5):
            for b in (0, 63, 127):
                if k < Lk and w < Lc:
                    a, bb = s2[b, k], s1[b, w]
                    want = (
                        PAD_MARK if (a == PAD or bb == PAD) else M.matrix[a, bb]
                    )
                else:
                    want = PAD_MARK
                assert sk[0, w, k, b] == want, (k, w, b)


def test_kernel_randomized_shapes():
    """Randomized shape/matrix/gap fuzz (fixed seed): guards the kernel's
    geometry/border/capture logic across bucket-edge-unaligned shapes."""
    mats = ["blosum62", "pam250", "nuc44"]
    rng = np.random.default_rng(99)
    for _ in range(4):
        mname = mats[rng.integers(0, len(mats))]
        Mx = matrices.get(mname)
        subp = padded_submatrix(Mx.matrix)
        nlet = 16 if mname == "nuc44" else 20
        algo = ["nw", "ga", "sw"][rng.integers(0, 3)]
        if algo == "nw":
            gaps = (-int(rng.integers(1, 13)), 0, 0)
        else:
            gaps = (0, -int(rng.integers(1, 15)), -int(rng.integers(1, 15)))
        Lc = int(rng.integers(2, 120))
        Lk = int(rng.integers(1, Lc + 1))
        n = 128
        l1 = rng.integers(1, Lc + 1, n).astype(np.int32)
        l2 = rng.integers(1, Lk + 1, n).astype(np.int32)
        s1 = np.full((n, Lc), PAD, np.int32)
        s2 = np.full((n, Lk), PAD, np.int32)
        for b in range(n):
            s1[b, : l1[b]] = rng.integers(0, nlet, l1[b])
            s2[b, : l2[b]] = rng.integers(0, nlet, l2[b])
        got = np.asarray(
            align_superblock(
                s1, s2, l1, l2, subp, np.array(gaps, np.int32),
                algo=algo, Lc=Lc, Lk=Lk, B=128, interpret=True,
            )
        )
        for b in range(0, n, 11):
            want = oracle.align_score(
                algo, s1[b, : l1[b]], s2[b, : l2[b]], Mx.matrix,
                gap=gaps[0], opn=gaps[1], ext=gaps[2],
            )
            assert got[b] == want, (algo, mname, gaps, Lc, Lk, b)


def test_geometry_helpers():
    from sequencealigner_tpu.ops.pallas_dp import band_kb

    assert round_up(65, 32) == 96
    # 96 rows: a 64-band would round Kpad to 128 — stays on 32-bands
    nb, Kpad, CD, W = geometry(100, 96, 128)
    assert band_kb(96) == 32 and nb == 3 and Kpad == 96
    assert W % CD == 0 and CD % 8 == 0 and W >= 100
    # chunk fits the VMEM budget with double buffering
    assert CD * band_kb(96) * 128 <= (2 << 20)
    # 33..64 and 97..128 round the same either way -> 64-bands
    assert band_kb(64) == 64 and band_kb(33) == 64 and band_kb(128) == 64
    nb64, Kpad64, _, _ = geometry(64, 64, 128)
    assert nb64 == 1 and Kpad64 == 64
    # short buckets keep the 32-band (a 64-band would double padded cells)
    nb32, Kpad32, _, _ = geometry(32, 24, 128)
    assert band_kb(24) == 32 and nb32 == 1 and Kpad32 == 32


@pytest.mark.parametrize("algo,gaps", GAP_CASES)
@pytest.mark.parametrize("Lc,Lk", [(21, 13), (80, 70)])
def test_inline_scoring_matches_oracle(algo, gaps, Lc, Lk):
    """In-kernel substitution scoring (inline mode: no HBM score grid, the
    kernel selects from VMEM per-pair profiles — the reference's in-loop LUT
    reads, src/bio/kernels.cu:49-66) is bit-exact vs the oracle, single- and
    multi-band."""
    rng = np.random.default_rng(zlib.crc32(f"{algo}{Lc}".encode()) % 2**31)
    B = 128
    s1, s2, l1, l2 = random_block(rng, B, Lc, Lk)
    got = np.asarray(
        align_superblock(
            s1, s2, l1, l2, SUB_P, np.array(gaps, np.int32),
            algo=algo, Lc=Lc, Lk=Lk, B=B, interpret=True, inline=True,
        )
    )
    kw = {"gap": gaps[0], "opn": gaps[1], "ext": gaps[2]}
    for b in range(0, B, 11):
        want = oracle.align_score(
            algo, s1[b, : l1[b]], s2[b, : l2[b]], M.matrix, **kw
        )
        assert got[b] == want, (algo, b, got[b], want)


def test_packed_words_cross_band_combo():
    """pack_bucket_words lays a bucket's words out ONCE with its own
    geometry; a combo against a different-band partner must unpack them
    identically.  (320, 32) is the regression shape: band_kb(32) = 32 vs
    the 320 bucket's own 64-band packing chose different column-chunk
    windows before geometry()'s CD was made a function of Lc alone —
    silently wrong scores for short-vs-medium protein buckets."""
    import jax.numpy as jnp

    from sequencealigner_tpu.ops import pallas_dp

    rng = np.random.default_rng(3)
    B = 128
    Lc, Lk = 320, 32
    l1 = rng.integers(280, 321, B).astype(np.int32)
    l2 = rng.integers(20, 33, B).astype(np.int32)
    mat_c = np.full((B, Lc), PAD, np.int8)
    mat_k = np.full((B, Lk), PAD, np.int8)
    for r in range(B):
        mat_c[r, : l1[r]] = rng.integers(0, 20, l1[r])
        mat_k[r, : l2[r]] = rng.integers(0, 20, l2[r])
    cform, _ = pallas_dp.pack_bucket_words(mat_c, Lc)  # own edge-320 layout
    _, kform = pallas_dp.pack_bucket_words(mat_k, Lk)  # own edge-32 layout
    out = np.asarray(
        pallas_dp.align_packed(
            jnp.asarray(cform), jnp.asarray(kform),
            jnp.asarray(l1), jnp.asarray(l2), jnp.asarray(SUB_P),
            jnp.asarray(np.array([0, -10, -1], np.int32)),
            algo="ga", Lc=Lc, Lk=Lk, B=B, interpret=True,
        )
    )
    for r in range(0, B, 17):
        want = oracle.align_score(
            "ga", mat_c[r][: l1[r]].astype(np.int32),
            mat_k[r][: l2[r]].astype(np.int32), M.matrix, opn=-10, ext=-1,
        )
        assert out[r] == want, (r, out[r], want)


def test_geometry_cd_is_partner_independent():
    """Every combo a bucket can appear in must share the bucket's own CD/W
    (the c-side packed layout), whatever the partner's band height."""
    from sequencealigner_tpu.scheduler import DEFAULT_EDGES

    edges = [e for e in DEFAULT_EDGES if e <= 4096]
    for ec in edges:
        _, _, cd_own, w_own = geometry(ec, ec, 128)
        for ek in edges:
            if ek > ec:
                continue
            _, _, cd, w = geometry(ec, ek, 128)
            assert (cd, w) == (cd_own, w_own), (ec, ek, cd, cd_own)


# ---------------------------------------------------------------------------
# Outer-product tile mode (align_outer)


def _outer_bucket(rng, count, edge):
    lens = rng.integers(1, edge + 1, count).astype(np.int32)
    mat = np.full((count, edge), PAD, np.int8)
    for i, l in enumerate(lens):
        mat[i, :l] = rng.integers(0, 20, l)
    return mat, lens


@pytest.mark.parametrize("algo,gaps", GAP_CASES)
@pytest.mark.parametrize("Lc,Lk,cc,kc", [(64, 32, 21, 9), (96, 96, 9, 7)])
def test_outer_tiles_match_oracle(algo, gaps, Lc, Lk, cc, kc):
    """align_outer (zero-gather outer-product tiles, in-kernel per-band
    score table) is bit-exact vs the oracle, including the multi-band
    geometry (Lk=96 -> two 32-row bands + per-band table rebuild)."""
    import jax.numpy as jnp

    from sequencealigner_tpu.ops.pallas_dp import (
        LANE, S_TILE, align_outer, pack_bucket_outer,
    )

    rng = np.random.default_rng(hash((algo, Lc, Lk)) % 2**32)
    cmat, clens = _outer_bucket(rng, cc, Lc)
    kmat, klens = _outer_bucket(rng, kc, Lk)
    cw = pack_bucket_outer(cmat, clens, Lc)
    kw = pack_bucket_outer(kmat, klens, Lk)
    descs = [(c0, kt) for kt in range(-(-kc // LANE))
             for c0 in range(0, cc, S_TILE)]
    desc = jnp.asarray(np.array(descs, np.int32).reshape(len(descs), 2))
    out = np.asarray(align_outer(
        desc, jnp.asarray(cw[0]), jnp.asarray(kw[1]), jnp.asarray(kw[2]),
        jnp.asarray(SUB_P), jnp.asarray(np.array(gaps, np.int32)),
        algo=algo, Lc=Lc, Lk=Lk, interpret=True,
    ))
    for t, (c0, kt) in enumerate(descs):
        for s in range(min(S_TILE, cc - c0)):
            ci = c0 + s
            for b in range(min(LANE, kc - kt * LANE)):
                ki = kt * LANE + b
                want = oracle.align_score(
                    algo, cmat[ci, : clens[ci]], kmat[ki, : klens[ki]],
                    M.matrix, gap=gaps[0], opn=gaps[1], ext=gaps[2],
                )
                assert out[t, s, b] == want, (algo, ci, ki)


def test_outer_tile_schedule_covers_pair_space():
    """Schedule.tiles + Schedule.diag_blocks cover every pair exactly once
    (valid slots): cross-bucket rectangles, same-bucket below-diagonal
    rectangles, and the per-window diagonal-remainder stream."""
    from sequencealigner_tpu.scheduler import Schedule

    rng = np.random.default_rng(3)
    lengths = rng.integers(4, 70, 300).astype(np.int32)
    sched = Schedule.build(lengths)
    seen = set()
    for a, b in sched.combos():
        blocks = list(sched.tiles(a, b))
        if a == b:
            blocks += list(sched.diag_blocks(a, width=512, tail_min=128))
        for blk in blocks:
            oi, oj, _ = blk.pairs()
            assert blk.select_valid(
                np.arange(blk.width)
            ).shape == oi.shape
            for i, j in zip(oi, oj):
                assert i < j
                assert (i, j) not in seen
                seen.add((int(i), int(j)))
    n = len(lengths)
    assert len(seen) == n * (n - 1) // 2


def test_diag_blocks_high_valid_fraction():
    """The VERDICT r4 bar: >= 97% of scheduled pair slots are valid at a
    1024-row single-bucket space (the flagship shape) under the tile
    schedule + diagonal remainder (was ~88% with half-masked diagonal
    tiles)."""
    from sequencealigner_tpu.scheduler import Schedule

    lengths = np.full(1024, 64, np.int32)
    sched = Schedule.build(lengths)
    assert len(sched.buckets) == 1
    slots = valid = 0
    for blk in list(sched.tiles(0, 0)) + list(
        sched.diag_blocks(0, width=65536, tail_min=128)
    ):
        slots += blk.width
        valid += blk.n_valid
    assert valid == 1024 * 1023 // 2
    assert valid / slots >= 0.97, (valid, slots)


def test_sw_zero_cell_no_gap_reopen():
    """Pin the SW recurrence's dropped zero-cell gap-reopen term
    (pallas_dp module notes; reference src/bio/method/sw.c:38-58): construct
    pairs where the optimal local alignment starts immediately after a
    clamped-to-zero cell with open << extend, and assert kernel == oracle.
    The adversarial shape: a strong mismatch prefix (clamps H to 0), then a
    gap that would only pay off if it could 'reopen' from the zero cell."""
    from sequencealigner_tpu.ops.pallas_dp import align_superblock

    # Alphabet indices: use identity-heavy BLOSUM62 entries.  s1 = X W W W,
    # s2 = W W W with leading junk; plus randomized variants around the
    # zero boundary.
    rng = np.random.default_rng(11)
    n = 128
    Lc = Lk = 16
    s1 = np.full((n, Lc), PAD, np.int32)
    s2 = np.full((n, Lk), PAD, np.int32)
    l1 = np.zeros(n, np.int32)
    l2 = np.zeros(n, np.int32)
    for b in range(n):
        # prefix of mismatching chars, then a match run separated by an
        # insertion right at the zero boundary
        pre = int(rng.integers(1, 5))
        run = int(rng.integers(2, 6))
        gap_len = int(rng.integers(1, 4))
        a = list(rng.integers(0, 20, pre)) + [17] * run
        c = list(rng.integers(0, 20, pre)) + [0] * gap_len + [17] * run
        l1[b] = min(len(a), Lc)
        l2[b] = min(len(c), Lk)
        s1[b, : l1[b]] = a[: l1[b]]
        s2[b, : l2[b]] = c[: l2[b]]
    gaps = np.array([0, -12, -1], np.int32)  # open >> extend
    out = np.asarray(align_superblock(
        s1, s2, l1, l2, SUB_P, gaps, algo="sw", Lc=Lc, Lk=Lk, B=128,
        interpret=True,
    ))
    for b in range(n):
        want = oracle.align_score(
            "sw", s1[b, : l1[b]], s2[b, : l2[b]], M.matrix,
            opn=-12, ext=-1,
        )
        assert out[b] == want, b
