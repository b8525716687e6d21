"""Pallas TPU wavefront DP kernel.

The performance path replacing the XLA lax.scan DP (ops/xla_dp.py) on real
TPU hardware.  Same mathematical design — pairs-batched anti-diagonal sweep —
engineered for the chip:

- **Analytic border row.**  The DP's k = 0 border (nw.c:13-18, ga.c:26-41,
  sw.c:21-31 of the reference) is a closed-form scalar per diagonal
  (NW: d·gap; GA: open + (d-1)·extend; SW: 0), so the state holds only rows
  k = 1..Lk.  With bucket edges that are multiples of 32, the state row count
  K = Lk is *exactly* tile-aligned — no padded sublanes — and the XLA-side
  score-stream build works on lane-aligned widths.

- **int8 skewed score stream, built without gathers.**  Substitution scores
  are produced by MXU one-hot contractions (exact: scores are small
  integers), then *skewed* so each DP step reads its whole diagonal as one
  contiguous (K, B) slab.  The skew is a single pad + flat-reshape trick
  (shifting row r right by r+1 = viewing a (Kpad, W) buffer as
  (Kpad, W-1)), a pure layout copy — no gather ops.  -128 marks pad/invalid
  cells; pad cells only ever feed pad cells (the DP moves right/down), so
  their magnitude never reaches a valid cell, and the widened column padding
  keeps the flat-reshape wrap reads inside marker columns.

- **Grid-pipelined streaming.**  grid = (superblock, diagonal-chunk); Pallas
  double-buffers the (CD, K, B) int8 score chunks HBM->VMEM while the VPU
  sweeps the previous chunk — the on-chip analogue of the reference's
  two-stream CUDA overlap (/root/reference/src/interface/seqalign_cuda.c:173-284),
  done by the compiler.  Chunk size is capped so both buffers + state fit VMEM.

- **Register-resident wavefront state.**  The diagonal loop carries state as
  fori_loop values (vector registers), not refs; the persistent scratch is
  touched once per grid chunk to hand the carry across chunk boundaries.
  2 sublane rolls per affine step (1 for NW), K = Lk on sublanes, B pairs on
  lanes.

- **Reduction-free capture.**  NW/GA accumulate ``where(k == l2 and
  d == l1 + l2)`` into a (K, B) accumulator — one select per step, a single
  sum at the end; SW keeps a running max (pad cells cannot exceed it, see
  xla_dp module notes).

Scores are bit-exact vs ops/oracle (tests run the kernel in interpret mode;
the TPU build is validated on hardware against the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..matrices import SCORE_MIN
from .xla_dp import PAD

#: int8 marker for pad/invalid cells in the skewed score stream.
PAD_MARK = -128

LANE = 128
#: VMEM budget for one score chunk (two are live due to double buffering).
CHUNK_BYTES = 2 << 20


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pick_B(Kpad: int) -> int:
    """Lane width (pairs per stripe).  Small B keeps the fori_loop carry
    (4-6 state arrays of Kpad x B int32) within vector registers — measured
    ~1.5x faster than B=512 on v5e; one lane tile (128) is the floor."""
    return 256 if Kpad <= 32 else LANE


def pick_CD(D: int, Kpad: int, B: int) -> int:
    """Diagonal chunk: multiple of 16, chunk bytes <= CHUNK_BYTES, and chosen
    so Dpad = nchunks * CD overshoots round_up(D, 16) as little as possible
    (a naive budget cap can force 25% extra padded diagonals)."""
    cap = max(16, CHUNK_BYTES // (Kpad * B) // 16 * 16)
    dmin = round_up(D, 16)
    if cap >= dmin:
        return dmin
    nchunks = -(-dmin // cap)
    return round_up(-(-dmin // nchunks), 16)


def pick_S(B: int, Kpad: int, Dpad: int, target_bytes: int = 256 << 20) -> int:
    """Superblock height: bound the materialized SK stream in HBM."""
    s = target_bytes // (B * Kpad * Dpad)
    return max(1, min(256, int(s)))


def _sub0_grid(s1, s2, sub_p):
    """(N, Lk, Lc) int8 substitution grid sub[s2[k0], s1[c0]] via int8 MXU
    one-hot contractions (exact; ~15% faster than bf16 measured)."""
    i8 = jnp.int8
    subm = jnp.full((PAD + 1, PAD + 1), PAD_MARK, i8)
    subm = subm.at[:24, :24].set(jnp.asarray(sub_p[:24, :24], i8))
    oh1 = jax.nn.one_hot(s1, PAD + 1, dtype=i8)  # (N, Lc, 25)
    oh2 = jax.nn.one_hot(s2, PAD + 1, dtype=i8)  # (N, Lk, 25)
    prof2 = jnp.einsum(
        "nkc,cd->nkd", oh2, subm, preferred_element_type=jnp.int32
    ).astype(i8)  # (N, Lk, 25)
    return jnp.einsum(
        "nkd,ncd->nkc", prof2, oh1, preferred_element_type=jnp.int32
    ).astype(i8)


def build_skewed_scores(s1, s2, sub_p, *, Lc: int, Lk: int, Kpad: int, Dpad: int):
    """(N, Lc) x (N, Lk) index arrays -> (N, Kpad, Dpad) int8 skewed grid:
    out[n, r, d-1] = sub[s2[n, r], s1[n, d-r-2]] at valid cells (state row r
    holds DP row k = r + 1; d is the 1-based diagonal), PAD_MARK elsewhere.

    Single-pad skew via flat reshape: P[r, c] = sub0[r, c-1] (one leading
    marker column), then OUT[r, j] = P[r, j-r] = sub0[r, j-r-1] — row r
    shifted right by r+1.  Width W is chosen so (a) W-1 >= Dpad and
    (b) W - Kpad >= Lc + 1, which makes every flat-reshape wrap read (the
    j < r positions of row r reading row r-1's tail) land in marker columns.
    """
    sub0 = _sub0_grid(s1, s2, sub_p)
    n = s1.shape[0]
    W = max(Dpad + 1, Lc + Kpad + 1)
    P = jnp.pad(
        sub0, ((0, 0), (0, Kpad - Lk), (1, W - Lc - 1)),
        constant_values=PAD_MARK,
    )  # (N, Kpad, W)
    out = P.reshape(n, Kpad * W)[:, : Kpad * (W - 1)].reshape(n, Kpad, W - 1)
    return out[:, :, :Dpad]


def build_skewed_stream(
    s1, s2, sub_p, *, S: int, B: int, Lc: int, Lk: int, Kpad: int, Dpad: int
):
    """Kernel-ready (S, Dpad, Kpad, B) score stream — semantically
    build_skewed_scores reshaped/transposed, but the pair axis is moved to
    lanes BEFORE the pad-skew copy (the transpose then touches the small
    (Lk, Lc) grid, not the (Kpad, Dpad) padded one): measured 1.8x faster."""
    sub0 = _sub0_grid(s1, s2, sub_p)  # (S*B, Lk, Lc)
    t = sub0.reshape(S, B, Lk, Lc).transpose(0, 2, 3, 1)  # (S, Lk, Lc, B)
    W = max(Dpad + 1, Lc + Kpad + 1)
    P = jnp.pad(
        t, ((0, 0), (0, Kpad - Lk), (1, W - Lc - 1), (0, 0)),
        constant_values=PAD_MARK,
    )  # (S, Kpad, W, B)
    out = (
        P.reshape(S, Kpad * W, B)[:, : Kpad * (W - 1), :]
        .reshape(S, Kpad, W - 1, B)
    )
    return out[:, :, :Dpad, :].transpose(0, 2, 1, 3)  # (S, Dpad, Kpad, B)


#: Band height for the banded kernel (int8 sublane tile).
KB = 32


def use_banded(Lk: int) -> bool:
    """Banded sweep pays off once bands amortize their per-step stream
    reads/writes: measured on v5e it is ~2x at Lk=256 and ~2x at Lk=1024,
    but LOSES at Lk=64 (9.3 vs 12.6 true GCUPS with the int8 skew)."""
    return Lk > 2 * KB


#: Per-pair budget for the materialized int8 score stream (HBM); beyond this
#: the engine falls back to the streamed XLA path (ops/xla_dp.py).
SK_BYTES_PER_PAIR_MAX = 24 << 20


def supports(Lc: int, Lk: int) -> bool:
    """Whether the Pallas kernels can run this bucket combo: the skewed score
    stream is materialized per superblock, so per-pair bytes must stay
    bounded.  (The reference's GPU path instead hard-caps length at 1023,
    src/bio/kernels.cuh:10; here long pairs just take the streamed path.)"""
    if use_banded(Lk):
        nb, _, Db = banded_geometry(Lc, Lk, 128)
        per_pair = nb * KB * Db
    else:
        Kpad = round_up(Lk, 32)
        B = pick_B(Kpad)
        Dpad = round_up(Lc + Lk, pick_CD(Lc + Lk, Kpad, B))
        per_pair = Kpad * Dpad
    return per_pair <= SK_BYTES_PER_PAIR_MAX


def banded_geometry(Lc: int, Lk: int, B: int) -> tuple[int, int, int]:
    """(nb, CD, Db) for the banded kernel."""
    nb = -(-Lk // KB)
    Dband = Lc + KB
    CD = pick_CD(Dband, KB, B)
    return nb, CD, round_up(Dband, CD)


def build_banded_scores(
    s1, s2, sub_p, *, Lc: int, Lk: int, nb: int, Db: int
):
    """Per-band skewed int8 score stream: (N, nb, KB, Db) where
    out[n, bi, r, t-1] = sub[s2[n, bi*KB + r], s1[n, t - r - 2]] at valid
    cells (t is the band-local 1-based diagonal; DP row k = bi*KB + r + 1),
    PAD_MARK elsewhere.  Same single-pad flat-reshape skew as
    build_skewed_scores, vectorized over the band dimension."""
    sub0 = _sub0_grid(s1, s2, sub_p)  # (N, Lk, Lc)
    n = s1.shape[0]
    W = max(Db + 1, Lc + KB + 1)
    P = jnp.pad(
        sub0, ((0, 0), (0, nb * KB - Lk), (1, W - Lc - 1)),
        constant_values=PAD_MARK,
    ).reshape(n, nb, KB, W)
    out = (
        P.reshape(n, nb, KB * W)[:, :, : KB * (W - 1)].reshape(n, nb, KB, W - 1)
    )
    return out[:, :, :, :Db]


def build_banded_stream(
    s1, s2, sub_p, *, S: int, B: int, Lc: int, Lk: int, nb: int, Db: int
):
    """Kernel-ready (S, nb, Db, KB, B) banded score stream with the pair axis
    moved to lanes before the pad-skew copy (see build_skewed_stream)."""
    sub0 = _sub0_grid(s1, s2, sub_p)  # (S*B, Lk, Lc)
    t = sub0.reshape(S, B, Lk, Lc).transpose(0, 2, 3, 1)  # (S, Lk, Lc, B)
    W = max(Db + 1, Lc + KB + 1)
    P = jnp.pad(
        t, ((0, 0), (0, nb * KB - Lk), (1, W - Lc - 1), (0, 0)),
        constant_values=PAD_MARK,
    ).reshape(S, nb, KB, W, B)
    out = (
        P.reshape(S, nb, KB * W, B)[:, :, : KB * (W - 1), :]
        .reshape(S, nb, KB, W - 1, B)
    )
    return out[:, :, :, :Db, :].transpose(0, 1, 3, 2, 4)  # (S, nb, Db, KB, B)


def _make_banded_kernel(algo: str, CD: int, Db: int):
    """Banded wavefront: grid = (superblock, band, diagonal-chunk).  Bands of
    KB DP rows sweep only their own Lc + KB diagonals, eliminating most of
    the full sweep's ramp waste (~2x padded cells for square pairs).  Band
    bi+1 consumes band bi's bottom-row H (and Y) values through double-
    buffered column streams written one (1, B) slice per diagonal."""
    sm = np.int32(SCORE_MIN)
    nstate = 4 if algo == "nw" else 6
    nprev = 1 if algo == "nw" else 2  # H (+ Y) bottom-row streams

    def kernel(gaps_ref, sk_ref, l1_ref, l2_ref, out_ref, state, prev):
        # prev: (2 parities, nprev, Db + KB, B); band bi reads parity bi & 1
        # at column t + KB and writes parity (bi + 1) & 1 at column t.
        band = pl.program_id(1)
        c = pl.program_id(2)
        nbands = pl.num_programs(1)
        nchunks = pl.num_programs(2)
        shape = state.shape[1:]  # (KB, B)
        kiota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        k0mask = kiota == 0

        gap = gaps_ref[0, 0]
        opn = gaps_ref[0, 1]
        ext = gaps_ref[0, 2]
        l2 = l2_ref[0]  # (1, B)
        khot = kiota == l2 - 1 - band * KB
        tstar = l1_ref[0] + l2 - band * KB  # band-local capture diagonal

        rp = band % 2  # read parity
        wp_par = (band + 1) % 2

        @pl.when((band == 0) & (c == 0))
        def _prefill():
            # Analytic k = 0 border as band 0's "previous bottom row"
            # (nw.c:13-18 / ga.c:26-41 / sw.c:21-31), and sentinel tails so
            # uninitialized reads can never exceed true scores.
            wshape = prev.shape[2:]  # (Db + KB, B)
            col = jax.lax.broadcasted_iota(jnp.int32, wshape, 0) - KB
            if algo == "nw":
                prev[0, 0] = col * gap
            elif algo == "ga":
                prev[0, 0] = jnp.where(col <= 0, jnp.int32(0), opn + (col - 1) * ext)
            else:
                prev[0, 0] = jnp.zeros(wshape, jnp.int32)
            prev[1, 0] = jnp.full(wshape, sm, jnp.int32)
            if nprev == 2:
                prev[0, 1] = jnp.full(wshape, sm, jnp.int32)
                prev[1, 1] = jnp.full(wshape, sm, jnp.int32)

        @pl.when(c == 0)
        def _init():
            smf = jnp.full(shape, sm, jnp.int32)
            state[0] = smf  # H_0 band rows are all sentinel
            h0row = prev[rp, 0, KB]  # previous bottom row at column 0
            state[1] = jnp.where(k0mask, h0row[None], smf)  # shift(H_0)
            state[2] = smf  # shift(H_{-1})
            state[3 if algo == "nw" else 5] = jnp.zeros(shape, jnp.int32)
            if algo != "nw":
                state[3] = smf  # X_{d-1}
                y0row = prev[rp, 1, KB]
                state[4] = jnp.where(k0mask, y0row[None], smf)

        def shift(v, fill):
            return jnp.where(k0mask, fill, pltpu.roll(v, shift=np.int32(1), axis=0))

        def step(i, carry):
            t = c * CD + i + 1  # band-local diagonal
            sd = sk_ref[0, 0, i].astype(jnp.int32)
            fill_h = prev[rp, 0, pl.ds(t + KB, 1)]  # (1, B): H[k0-1][t]
            if algo == "nw":
                hp, wp, wp2, acc = carry
                h = jnp.maximum(jnp.maximum(wp2 + sd, hp + gap), wp + gap)
                acc = acc + jnp.where(khot & (t == tstar), h, jnp.int32(0))
                prev[wp_par, 0, pl.ds(t, 1)] = h[KB - 1 : KB]
                return (h, shift(h, fill_h), wp, acc)
            hp, wp, wp2, xb, ys, acc = carry
            x = jnp.maximum(hp + opn, xb + ext)
            y = jnp.maximum(wp + opn, ys + ext)
            h = jnp.maximum(jnp.maximum(wp2 + sd, x), y)
            if algo == "sw":
                h = jnp.maximum(h, jnp.int32(0))
                acc = jnp.maximum(acc, h)
            else:
                acc = acc + jnp.where(khot & (t == tstar), h, jnp.int32(0))
            prev[wp_par, 0, pl.ds(t, 1)] = h[KB - 1 : KB]
            prev[wp_par, 1, pl.ds(t, 1)] = y[KB - 1 : KB]
            fill_y = prev[rp, 1, pl.ds(t + KB, 1)]
            return (h, shift(h, fill_h), wp, x, shift(y, fill_y), acc)

        if algo == "nw":
            carry0 = (state[0], state[1], state[2], state[3])
        else:
            carry0 = (state[0], state[1], state[2], state[3], state[4], state[5])
        carry = jax.lax.fori_loop(  # int32 bounds: int64 cannot lower in Mosaic
            jnp.int32(0), jnp.int32(CD), step, carry0
        )
        for idx in range(nstate):
            state[idx] = carry[idx]

        @pl.when(c == nchunks - 1)
        def _finish():
            acc = state[nstate - 1]
            if algo == "sw":
                part = jnp.max(acc, axis=0, keepdims=True)
            else:
                part = jnp.sum(acc, axis=0, keepdims=True, dtype=jnp.int32)

            @pl.when(band == 0)
            def _first():
                out_ref[0] = part

            @pl.when(band > 0)
            def _rest():
                if algo == "sw":
                    out_ref[0] = jnp.maximum(out_ref[0], part)
                else:
                    out_ref[0] = out_ref[0] + part

    return kernel


@functools.partial(
    jax.jit, static_argnames=("algo", "Lc", "Lk", "B", "interpret")
)
def align_superblock_banded(
    s1, s2, l1, l2, sub_p, gaps, *, algo: str, Lc: int, Lk: int, B: int,
    interpret: bool = False
):
    """Banded variant of align_superblock: same contract, ~2x fewer padded
    cells when Lk >> KB.  Use when Lk >= 2*KB."""
    n = s1.shape[0]
    assert n % B == 0, (n, B)
    S = n // B
    nb, CD, Db = banded_geometry(Lc, Lk, B)

    sk = build_banded_stream(
        s1, s2, sub_p, S=S, B=B, Lc=Lc, Lk=Lk, nb=nb, Db=Db
    )  # (S, nb, Db, KB, B)
    l1b = l1.reshape(S, 1, B).astype(jnp.int32)
    l2b = l2.reshape(S, 1, B).astype(jnp.int32)
    gaps2 = gaps.reshape(1, 3).astype(jnp.int32)

    grid = (S, nb, Db // CD)
    nprev = 1 if algo == "nw" else 2
    out = pl.pallas_call(
        _make_banded_kernel(algo, CD, Db),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CD, KB, B), lambda s, b, c: (s, b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s, b, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s, b, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda s, b, c: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 1, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((4 if algo == "nw" else 6, KB, B), jnp.int32),
            # Db + KB + 1 columns: the final diagonal t = Db reads the (dead,
            # never-consumed) fill at column t + KB = Db + KB, which would be
            # one past a (Db + KB)-sized buffer.
            pltpu.VMEM((2, nprev, Db + KB + 1, B), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * S * B * nb * Db * KB, transcendentals=0,
            bytes_accessed=S * nb * Db * KB * B,
        ),
        interpret=interpret,
    )(gaps2, sk, l1b, l2b)
    return out.reshape(n)


def _make_kernel(algo: str, CD: int):
    sm = np.int32(SCORE_MIN)  # concrete literal (a jnp scalar would be traced)
    nstate = 4 if algo == "nw" else 6

    def kernel(gaps_ref, sk_ref, l1_ref, l2_ref, out_ref, state):
        """Wavefront state is carried as fori_loop VALUES (vector registers),
        not refs: a ref-based formulation costs ~10 VMEM load/stores per
        diagonal per vreg, which measures ~7x slower than ALU-bound on v5e.
        The persistent `state` scratch is touched once per grid chunk to hand
        the carry across diagonal-chunk boundaries."""
        c = pl.program_id(1)
        nchunks = pl.num_programs(1)
        shape = state.shape[1:]  # (Kpad, B)
        kiota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        k0mask = kiota == 0

        gap = gaps_ref[0, 0]
        opn = gaps_ref[0, 1]
        ext = gaps_ref[0, 2]
        l2 = l2_ref[0]  # (1, B)
        khot = kiota == l2 - 1  # state row r = l2 - 1 holds DP row k = l2
        dstar = l1_ref[0] + l2  # capture diagonal, (1, B)

        def border(d):
            """Analytic k = 0 DP border value for cell (0, d) — the first-row
            initialisations of nw.c:13-18 / ga.c:26-41 / sw.c:21-31."""
            if algo == "nw":
                return d * gap
            if algo == "ga":
                return opn + (d - 1) * ext
            return jnp.int32(0)  # sw

        def shift(v, fill):
            return jnp.where(k0mask, fill, pltpu.roll(v, shift=np.int32(1), axis=0))

        # Carry layout: hp = H_{d-1} (rows k=1..), wp = shift-with-border of
        # H_{d-1}, wp2 = same for H_{d-2}; affine adds xb = X_{d-1},
        # ys = shifted Y_{d-1}; last slot = capture accumulator.
        # No max(·, sm) clamps are needed: drift below the sentinel is bounded
        # by 128·D per step chain, far above int32 wraparound for any D here.
        @pl.when(c == 0)
        def _init():
            smf = jnp.full(shape, sm, jnp.int32)
            state[0] = smf  # H_0 rows k>=1 are all sentinel
            state[1] = jnp.where(k0mask, jnp.int32(0), smf)  # shift(H_0): border 0
            state[2] = smf  # shift(H_{-1})
            state[3 if algo == "nw" else 5] = jnp.zeros(shape, jnp.int32)
            if algo != "nw":
                state[3] = smf  # X_{d-1}
                state[4] = smf  # shifted Y_{d-1}

        def step(i, carry):
            d = c * CD + i + 1
            sd = sk_ref[0, i].astype(jnp.int32)
            if algo == "nw":
                hp, wp, wp2, acc = carry
                h = jnp.maximum(jnp.maximum(wp2 + sd, hp + gap), wp + gap)
                acc = acc + jnp.where(khot & (d == dstar), h, jnp.int32(0))
                return (h, shift(h, border(d)), wp, acc)
            hp, wp, wp2, xb, ys, acc = carry
            x = jnp.maximum(hp + opn, xb + ext)
            y = jnp.maximum(wp + opn, ys + ext)
            h = jnp.maximum(jnp.maximum(wp2 + sd, x), y)
            if algo == "sw":
                h = jnp.maximum(h, jnp.int32(0))
                acc = jnp.maximum(acc, h)
            else:
                acc = acc + jnp.where(khot & (d == dstar), h, jnp.int32(0))
            return (h, shift(h, border(d)), wp, x, shift(y, sm), acc)

        if algo == "nw":
            carry0 = (state[0], state[1], state[2], state[3])
        else:
            carry0 = (state[0], state[1], state[2], state[3], state[4], state[5])
        carry = jax.lax.fori_loop(  # int32 bounds: int64 cannot lower in Mosaic
            jnp.int32(0), jnp.int32(CD), step, carry0
        )
        for idx in range(nstate):
            state[idx] = carry[idx]

        @pl.when(c == nchunks - 1)
        def _finish():
            acc = state[nstate - 1]
            if algo == "sw":
                out_ref[0] = jnp.max(acc, axis=0, keepdims=True)
            else:
                out_ref[0] = jnp.sum(acc, axis=0, keepdims=True, dtype=jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("algo", "Lc", "Lk", "B", "interpret")
)
def align_superblock(
    s1, s2, l1, l2, sub_p, gaps, *, algo: str, Lc: int, Lk: int, B: int,
    interpret: bool = False
):
    """Score S*B pairs with the Pallas wavefront kernel.

    Args:
      s1: (S*B, Lc) int32 indices (PAD beyond l1), s2: (S*B, Lk), Lk <= Lc.
      l1, l2: (S*B,) int32 true lengths.
      sub_p: (25, 25) int32 padded substitution matrix.
      gaps: (3,) int32 [gap, open, extend] (negated penalties).
      B: lane width; S*B must be a multiple of B.

    Returns: (S*B,) int32 scores, bit-exact per reference recurrences.
    """
    n = s1.shape[0]
    assert n % B == 0, (n, B)
    S = n // B
    Kpad = round_up(Lk, 32)  # int8 sublane tile; == Lk for 32-multiple edges
    D = Lc + Lk
    CD = pick_CD(D, Kpad, B)
    Dpad = round_up(D, CD)

    sk = build_skewed_stream(
        s1, s2, sub_p, S=S, B=B, Lc=Lc, Lk=Lk, Kpad=Kpad, Dpad=Dpad
    )  # (S, Dpad, Kpad, B)
    l1b = l1.reshape(S, 1, B).astype(jnp.int32)
    l2b = l2.reshape(S, 1, B).astype(jnp.int32)
    gaps2 = gaps.reshape(1, 3).astype(jnp.int32)

    grid = (S, Dpad // CD)
    out = pl.pallas_call(
        _make_kernel(algo, CD),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gaps (1, 3)
            pl.BlockSpec((1, CD, Kpad, B), lambda s, c: (s, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda s, c: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 1, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((4 if algo == "nw" else 6, Kpad, B), jnp.int32)
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * S * B * Dpad * Kpad, transcendentals=0,
            bytes_accessed=S * Dpad * Kpad * B,
        ),
        interpret=interpret,
    )(gaps2, sk, l1b, l2b)
    return out.reshape(n)
