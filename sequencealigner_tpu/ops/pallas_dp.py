"""Pallas TPU wavefront DP kernel.

The performance path replacing the XLA lax.scan DP (ops/xla_dp.py) on real
TPU hardware.  Same mathematical design — pairs-batched anti-diagonal sweep
with uniform sentinel-border recurrence — engineered for the chip:

- **int8 skewed score stream, built without gathers.**  Substitution scores
  are produced by MXU one-hot contractions (exact in bf16: scores are small
  integers), then *skewed* so each DP step reads its whole diagonal as one
  contiguous (K, B) slab.  The skew is a pad + flat-reshape trick (shifting
  row k right by k = viewing an (Lk, W) buffer as (Lk, W-1)), a pure layout
  copy — no gather ops.  -128 marks pad/invalid cells; it is "negative
  enough" as-is: pad cells only ever feed pad cells (the DP moves right/
  down), so their exact magnitude never reaches a valid cell.

- **Grid-pipelined streaming.**  grid = (superblock, diagonal-chunk); Pallas
  double-buffers the (CD, K, B) int8 score chunks HBM->VMEM while the VPU
  sweeps the previous chunk — the on-chip analogue of the reference's
  two-stream CUDA overlap (/root/reference/src/interface/seqalign_cuda.c:173-284),
  done by the compiler.  Chunk size is capped so both buffers + state fit VMEM.

- **Ping-pong wavefront state, 2 shifts/step.**  H lives in two (K, B) int32
  scratch buffers whose d-1/d-2 roles alternate with diagonal parity (no
  copies), alongside *pre-shifted* copies (w = shift(H), ys = shift(Y)) so
  each step performs exactly two sublane rolls.  K = shorter sequence + 1 on
  sublanes, B pairs on lanes.

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
    """Lane width (pairs per stripe): target ~64k state elements per VPU op."""
    b = 65536 // Kpad
    b = 1 << max(b.bit_length() - 1, 0)
    return max(LANE, min(1024, b))


def pick_CD(D: int, Kpad: int, B: int) -> int:
    """Diagonal chunk: even, multiple of 16, chunk bytes <= CHUNK_BYTES."""
    cd = CHUNK_BYTES // (Kpad * B)
    cd = max(16, cd // 16 * 16)
    return min(cd, round_up(D, 16))


def pick_S(B: int, Kpad: int, Dpad: int, target_bytes: int = 256 << 20) -> int:
    """Superblock height: bound the materialized SK stream in HBM."""
    s = target_bytes // (B * Kpad * Dpad)
    return max(1, min(256, int(s)))


def build_skewed_scores(s1, s2, sub_p, *, Lc: int, Lk: int, Kpad: int, Dpad: int):
    """(N, Lc) x (N, Lk) index arrays -> (N, Kpad, Dpad) int8 skewed grid:
    out[n, k, d-1] = sub[s2[n, k-1], s1[n, d-k-1]] at valid cells, PAD_MARK
    elsewhere (d is the 1-based diagonal, k the 1-based row in s2)."""
    bf = jnp.bfloat16
    subm = jnp.full((PAD + 1, PAD + 1), PAD_MARK, bf)
    subm = subm.at[:24, :24].set(jnp.asarray(sub_p[:24, :24], bf))
    # MXU one-hot contraction; exact: scores are small ints, one term per sum.
    oh1 = jax.nn.one_hot(s1, PAD + 1, dtype=bf)  # (N, Lc, 25)
    oh2 = jax.nn.one_hot(s2, PAD + 1, dtype=bf)  # (N, Lk, 25)
    prof2 = jnp.einsum("nkc,cd->nkd", oh2, subm)  # (N, Lk, 25)
    sub0 = jnp.einsum(
        "nkd,ncd->nkc", prof2, oh1, preferred_element_type=jnp.float32
    ).astype(jnp.int8)  # (N, Lk, Lc):  sub[s2[k0], s1[c0]]

    # Skew via pad + flat reshape: OUT[k0, j] = padded[k0, j - k0] (row k0
    # shifted right by k0).  Requires Dpad >= Lc + Lk so wrap reads land in
    # the marker padding.
    n = s1.shape[0]
    a = jnp.pad(
        sub0, ((0, 0), (0, 0), (0, Dpad - Lc)), constant_values=PAD_MARK
    )  # (N, Lk, Dpad)
    out = a.reshape(n, Lk * Dpad)[:, : Lk * (Dpad - 1)].reshape(n, Lk, Dpad - 1)
    # SK[:, k, d-1] = OUT[k-1, d-2]; row 0 / rows > Lk / column d=1 invalid.
    return jnp.pad(
        out, ((0, 0), (1, Kpad - Lk - 1), (1, 0)), constant_values=PAD_MARK
    )


def _make_kernel(algo: str, CD: int):
    sm = np.int32(SCORE_MIN)  # concrete literal (a jnp scalar would be traced)

    def kernel(gaps_ref, sk_ref, l1_ref, l2_ref, out_ref, h0, h1, w0, w1, xb, ys, acc):
        c = pl.program_id(1)
        nchunks = pl.num_programs(1)
        shape = h0.shape  # (Kpad, B)
        k0mask = jax.lax.broadcasted_iota(jnp.int32, shape, 0) == 0

        @pl.when(c == 0)
        def _init():
            # h0 = H at d=0 (cell (0,0) = 0), w0 = shift(H_0), w1 = shift(H_-1).
            h0[...] = jnp.where(k0mask, 0, jnp.full(shape, sm, jnp.int32))
            w0[...] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, shape, 0) == 1,
                0,
                jnp.full(shape, sm, jnp.int32),
            )
            h1[...] = jnp.full(shape, sm, jnp.int32)
            w1[...] = jnp.full(shape, sm, jnp.int32)
            xb[...] = jnp.full(shape, sm, jnp.int32)
            ys[...] = jnp.full(shape, sm, jnp.int32)
            acc[...] = jnp.zeros(shape, jnp.int32)

        gap = gaps_ref[0, 0]
        opn = gaps_ref[0, 1]
        ext = gaps_ref[0, 2]
        l2 = l2_ref[0]  # (1, B)
        khot = jax.lax.broadcasted_iota(jnp.int32, shape, 0) == l2
        dstar = l1_ref[0] + l2  # capture diagonal, (1, B)

        def shift(v):
            return jnp.where(k0mask, sm, pltpu.roll(v, shift=1, axis=0))

        def one_diag(d, t, hp, hw, wp, wp2):
            """One diagonal step: reads H_{d-1} (hp), shift(H_{d-1}) (wp),
            shift(H_{d-2}) (wp2); writes H_d into hw and shift(H_d) into wp2
            (whose value is dead after this step)."""
            sd = sk_ref[0, t].astype(jnp.int32)
            diag = wp2[...] + sd
            if algo == "nw":
                h = jnp.maximum(jnp.maximum(diag, hp[...] + gap), wp[...] + gap)
                h = jnp.maximum(h, sm)
            else:
                x = jnp.maximum(hp[...] + opn, xb[...] + ext)
                y = jnp.maximum(wp[...] + opn, ys[...] + ext)
                h = jnp.maximum(jnp.maximum(diag, x), y)
                h = jnp.maximum(h, 0 if algo == "sw" else sm)
                xb[...] = jnp.maximum(x, sm)
                ys[...] = shift(jnp.maximum(y, sm))
            if algo == "sw":
                acc[...] = jnp.maximum(acc[...], h)
            else:
                acc[...] = acc[...] + jnp.where(khot & (d == dstar), h, 0)
            hw[...] = h
            wp2[...] = shift(h)

        def two_steps(i, _):
            t = i * 2
            d = c * CD + t + 1
            # Parity invariant at even t: h0/w0 hold d-1, h1/w1 hold d-2.
            one_diag(d, t, h0, h1, w0, w1)
            one_diag(d + 1, t + 1, h1, h0, w1, w0)
            return 0

        jax.lax.fori_loop(0, CD // 2, two_steps, 0)

        @pl.when(c == nchunks - 1)
        def _finish():
            if algo == "sw":
                out_ref[0] = jnp.max(acc[...], axis=0, keepdims=True)
            else:
                out_ref[0] = jnp.sum(acc[...], axis=0, keepdims=True)

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
    Kpad = round_up(Lk + 1, 32)  # int8 sublane tile
    D = Lc + Lk
    CD = pick_CD(D, Kpad, B)
    Dpad = round_up(D, CD)

    sk = build_skewed_scores(s1, s2, sub_p, Lc=Lc, Lk=Lk, Kpad=Kpad, Dpad=Dpad)
    sk = sk.reshape(S, B, Kpad, Dpad).transpose(0, 3, 2, 1)  # (S, Dpad, Kpad, B)
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
        scratch_shapes=[pltpu.VMEM((Kpad, B), jnp.int32) for _ in range(7)],
        cost_estimate=pl.CostEstimate(
            flops=14 * S * B * Dpad * Kpad, transcendentals=0,
            bytes_accessed=S * Dpad * Kpad * B,
        ),
        interpret=interpret,
    )(gaps2, sk, l1b, l2b)
    return out.reshape(n)
