"""Pallas TPU wavefront DP kernel — banded COLUMN sweep.

The performance path replacing the XLA lax.scan DP (ops/xla_dp.py) on real
TPU hardware.  Pairs ride the 128 VPU lanes; DP rows are processed in bands
of KB = 32 sublanes; and — unlike the classic anti-diagonal wavefront — the
sweep walks COLUMNS, resolving the within-column vertical dependency with a
log2(KB) max-prefix scan (the lazy-F idea of striped Smith-Waterman, done
deterministically).  Column order is what makes the whole design cheap:

- **No skew, anywhere.**  An anti-diagonal sweep needs substitution scores
  delivered along diagonals, which costs either multi-pass XLA layout work
  (pad + flat-reshape skew + transposes: measured MORE expensive than the DP
  itself) or per-row-shifted DMA windows (illegal under Mosaic's tile rules).
  A column sweep consumes the PLAIN substitution grid: one contiguous
  (KB, B) slab per step via ordinary BlockSpec pipelining.

- **One-einsum score build.**  The grid is built by MXU one-hot contractions
  (exact: scores are small integers) directly into the kernel-ready
  (S, W, Kpad, B) pair-minor layout; margins are baked into the INPUT by
  padding s1/s2 with the PAD character (whose substitution row/column is
  PAD_MARK), so there is no pad pass over the stream.  Like the reference's
  in-loop scoring (src/bio/kernels.cu:49-66), no skewed/derived score grid
  is ever materialized.  NOTE: the engine runs build and kernel as SEPARATE
  dispatches — fused in one jit, XLA's layout assignment around the Pallas
  custom call degrades the dot+transpose to ~4x the cost (measured).

- **Column recurrences.**  For column w (1-based c = w + 1), band rows r:
      m[r] = Hprev[r-1] + sub[r]                     (diagonal)
      x[r] = max(Hprev[r] + opn, Xprev[r] + ext)     (left, elementwise)
      z[r] = max(m[r], x[r])
      y[r] = max(y[r-1] + max(ext, opn), z[r-1] + opn)
      h[r] = max(z[r], y[r])          (+ floor 0 and running max for SW)
  The y recurrence is exact: y = max(y'+e, h'+o) with h = max(z, y) expands
  to max(y'+max(e,o), z'+o).  (For SW the reference's h also includes the 0
  floor, whose +opn reopening term is dropped — safe, since an optimal local
  alignment never opens a gap from a zero cell.)  The first-order recurrence
  is solved per column as a prefix max in the y - r*slope domain: log2(KB)
  roll+max steps.  NW's vertical term is the same scan with slope = gap.

- **Analytic borders.**  Left border column H[k][0] initializes each band's
  carry; the top border H[0][*] is band 0's "previous bottom row" stream.
  GA's border slope is max(opn, ext) — NOT ext: the reference's border
  recurrence reads H = X at every border cell (ga.c:26-41), so a border gap
  re-opens each step when opn > ext.

- **Band crossing.**  Band bi+1 consumes band bi's bottom-row H (and Y)
  values through parity-alternating column streams in VMEM (`prev`),
  written one (1, B) slice per column.

- **Reduction-free capture.**  NW/GA accumulate ``where(k == l2 and
  w == l1 - 1)`` into a (KB, B) accumulator — one select per step, a single
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

#: int8 marker for pad/invalid cells in the score grid.
PAD_MARK = -128

LANE = 128
#: VMEM budget for one score chunk (two are live due to double buffering).
CHUNK_BYTES = 2 << 20

#: Default band height (int8 sublane tile).  See band_kb.
KB = 32

#: Largest band height band_kb may return; geometry()'s VMEM chunk budget is
#: computed for this height, so the two must stay in lockstep.
KB_MAX = 64


def band_kb(Lk: int) -> int:
    """Band height for a given row count: KB_MAX (64) whenever that does not
    inflate Kpad beyond the 32-band rounding (Lk in (64k-32, 64k]) — doubling
    the band halves the per-cell share of the per-column fixed costs
    (prev-stream I/O, the profile lane gather, the prefix scan's log term);
    everywhere else (Lk <= 32 or a 33..32-overhang edge like 96/160) stay at
    32 so padded cells don't grow."""
    if Lk > 32 and round_up(Lk, KB_MAX) == round_up(Lk, 32):
        return KB_MAX
    return 32

#: Longest padded column count the inline kernel accepts: the band-crossing
#: stream lives in VMEM at (2, nprev, W+1, B) int32 ≈ 4 KiB per column
#: (~17 MiB at 4096); longer pairs take the streamed XLA path
#: (ops/xla_dp.py).  The reference's GPU path instead hard-caps length at
#: 1023 (src/bio/kernels.cuh:10).
W_MAX = 4096


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def geometry(Lc: int, Lk: int, B: int) -> tuple[int, int, int, int]:
    """(nb, Kpad, CD, W): band count, padded row count, column chunk, padded
    column count.  One band IS the monolithic case when Lk <= band_kb(Lk).
    The band height itself is band_kb(Lk) — derived, not returned.

    CD is a function of Lc ONLY (the cap is computed for the maximum band
    height, not band_kb(Lk)): pack_bucket_words lays a bucket's c-side words
    out once with the bucket's own geometry, and every combo that bucket
    appears in — whatever the partner's band height — must unpack with the
    SAME window or the codes land in the wrong columns (a (320, 32) combo
    against a 64-band-packed 320 bucket measured silently wrong scores
    before this was pinned)."""
    kb = band_kb(Lk)
    assert kb <= KB_MAX, (kb, Lk)  # the chunk budget below assumes KB_MAX
    nb = -(-Lk // kb)
    Kpad = nb * kb
    cap = max(8, CHUNK_BYTES // (KB_MAX * B) // 8 * 8)
    wmin = round_up(Lc, 8)
    if cap >= wmin:
        CD = wmin
    else:
        nchunks = -(-wmin // cap)
        CD = round_up(-(-wmin // nchunks), 8)
    return nb, Kpad, CD, round_up(Lc, CD)


def pick_S(B: int, Kpad: int, W: int, target_cells: int = 1 << 31) -> int:
    """Superblock height: with in-kernel scoring nothing scales with S but
    the code tensors (~4(W+Kpad) bytes/pair), so size dispatches by PADDED
    CELLS — ~2^31 is ~20 ms of device time at the kernel's ~100 Gcell/s,
    large enough to amortize per-dispatch host/link overhead, small enough
    for flush pacing and progress."""
    s = target_cells // (B * Kpad * W)
    return max(1, min(2048, int(s)))


def supports(Lc: int, Lk: int) -> bool:
    """Whether the inline Pallas kernel can run this bucket combo (see
    W_MAX; Lk <= Lc by the engine's combo ordering)."""
    nb, Kpad, CD, W = geometry(Lc, Lk, LANE)
    return W <= W_MAX


def build_stream(
    s1, s2, sub_p, *, S: int, B: int, Lc: int, Lk: int, Kpad: int, W: int
):
    """(S, W, Kpad, B) int8 substitution grid: out[s, w, k, b] =
    sub[s2[n, k], s1[n, w]] (n = s*B + b), PAD_MARK at pad rows/columns.

    One (s, b)-batched MXU dot emitting (S, B, W, Kpad), then the single
    cheap B-to-minor transpose (0, 2, 3, 1).  Dispatch this SEPARATELY from
    align_prebuilt (see module notes)."""
    i8 = jnp.int8
    subm = jnp.full((PAD + 1, PAD + 1), PAD_MARK, i8)
    subm = subm.at[:24, :24].set(jnp.asarray(sub_p[:24, :24], i8))
    s1p = jnp.pad(s1, ((0, 0), (0, W - Lc)), constant_values=PAD)
    s2p = jnp.pad(s2, ((0, 0), (0, Kpad - Lk)), constant_values=PAD)
    oh1 = jax.nn.one_hot(s1p, PAD + 1, dtype=i8)
    oh2 = jax.nn.one_hot(s2p, PAD + 1, dtype=i8)
    prof2 = jnp.einsum(
        "nkc,cd->nkd", oh2, subm, preferred_element_type=jnp.int32
    ).astype(i8)  # (n, Kpad, 25): prof2[n, k, a] = sub[s2[n, k], a]
    p2 = prof2.reshape(S, B, Kpad, PAD + 1)
    o1 = oh1.reshape(S, B, W, PAD + 1)
    out = jnp.einsum(
        "sbwd,sbkd->sbwk", o1, p2, preferred_element_type=jnp.int32
    ).astype(i8)
    return out.transpose(0, 2, 3, 1)


#: Alphabet slots in the inline-mode profile (24 chars + PAD, padded to the
#: int8 sublane tile).
ALPHA = 32


def padded_submatrix_i8(sub_p) -> jnp.ndarray:
    """(ALPHA, ALPHA) int8 submatrix with PAD_MARK everywhere outside the
    real 24x24 frame (so PAD codes in either sequence score PAD_MARK).
    Traceable (sub_p may be a device array under jit)."""
    subm = jnp.full((ALPHA, ALPHA), PAD_MARK, jnp.int8)
    return subm.at[:24, :24].set(jnp.asarray(sub_p)[:24, :24].astype(jnp.int8))


#: Packed-profile rows: 4 alphabet slots byte-packed per int32, 8 rows cover
#: all ALPHA = 32 slots.  An (8, 128) int32 block is exactly one vreg — the
#: largest window v5e's dynamic_gather can index (no byte gather on this
#: generation; 32-bit gathers cannot span sublane vregs).
PACK8 = 8


def packed_lane_table(sub_p) -> jnp.ndarray:
    """(PACK8, LANE) int32 byte-packed padded submatrix with the ALPHABET on
    lanes: byte j of out[r, a] = sub[a, r + 8*j] (PAD_MARK outside the real
    24x24 frame; lanes beyond ALPHA hold packed PAD_MARK).  The whole
    substitution matrix in 4 KiB of VMEM — the TPU analogue of the
    reference's __constant__ LUTs (src/bio/kernels.cuh:20-24)."""
    subm = padded_submatrix_i8(sub_p).astype(jnp.int32) & 0xFF
    k = subm.reshape(ALPHA, 4, PACK8)
    packed = k[:, 0] | (k[:, 1] << 8) | (k[:, 2] << 16) | (k[:, 3] << 24)
    pad_val = jnp.int32(-0x7F7F7F80)  # 0x80808080: PAD_MARK in every byte
    out = jnp.full((PACK8, LANE), pad_val, jnp.int32)
    return out.at[:, :ALPHA].set(packed.T)


def build_inline(s1, s2, *, S: int, B: int, Lc: int, Lk: int,
                 Kpad: int, W: int, CD: int):
    """Inline-mode kernel inputs — NO per-pair score data at all, just the
    pair-minor code tensors:

    c1: (S, W, B) int32 s1 codes (PAD beyond l1)
    c2: (S, Kpad, B) int32 s2 codes (PAD beyond l2)

    The kernel builds each column's (KB, B) score block itself from the
    VMEM-resident packed_lane_table: one per-lane LANE-axis gather by the s1
    code yields the column's byte-packed alphabet profile (PACK8, B), then
    four single-vreg sublane gathers by the s2 codes + a variable-shift byte
    extract select the scores — the Pallas analogue of the reference's
    in-loop constant-LUT reads (src/bio/kernels.cu:49-66), using the
    matrices' symmetry (sub[a][b] == sub[b][a], SURVEY.md §2.1).  The MXU
    score-grid build of build_stream (74% of device time at short shapes,
    BASELINE.md r2) is gone entirely, and HBM streams only ~1 byte per
    column per pair.

    Codes ride BYTE-PACKED four-per-int32 so the pair-minor transposes — the
    only remaining XLA layout work — move 4x less data.  The packing is
    STRIDED within each kernel window (byte k of word r = column r + k*CD/4
    of the chunk; s2 likewise per KB-band): the kernel then unpacks a whole
    window with four shift-ands and one plain concatenation (no sublane
    interleave), once per grid step."""
    i8 = jnp.int8
    n = S * B
    kb = band_kb(Lk)
    s1p = jnp.pad(s1.astype(i8), ((0, 0), (0, W - Lc)), constant_values=PAD)
    s2p = jnp.pad(s2.astype(i8), ((0, 0), (0, Kpad - Lk)), constant_values=PAD)
    w1 = jax.lax.bitcast_convert_type(
        s1p.reshape(n, W // CD, 4, CD // 4).transpose(0, 1, 3, 2), jnp.int32
    )  # (n, W//CD, CD//4)
    w2 = jax.lax.bitcast_convert_type(
        s2p.reshape(n, Kpad // kb, 4, kb // 4).transpose(0, 1, 3, 2),
        jnp.int32,
    )  # (n, Kpad//kb, kb//4)
    c1 = w1.reshape(S, B, W // 4)
    c2 = w2.reshape(S, B, Kpad // 4)
    return c1, c2


#: c-rows per outer-product tile (see align_outer): one tile pairs S_TILE
#: consecutive c-side bucket rows against one 128-lane window of k-side rows.
S_TILE = 128


def pack_bucket_outer(mat: np.ndarray, lengths: np.ndarray, edge: int):
    """Host-side per-bucket arrays for the OUTER-PRODUCT-TILED kernel
    (align_outer) — built once per bucket at upload time:

      cwords: (count_padS, 1 + W//4) int32 — row r = [true length | s1 codes
        byte-packed 4/word in plain order (code w = byte w%4 of word w//4)].
        Rows are padded to a multiple of S_TILE *plus one extra tile* of
        all-PAD/len-0 rows, so tail tiles and dummy descriptor rows always
        index in bounds and score as discardable zeros.
      kmatT: (Kpad, count_pad128) int8 — the TRANSPOSED code matrix: column
        b = sequence b's codes (PAD beyond its length and beyond count).
        A k-tile is the contiguous lane window [:, kt*128:(kt+1)*128] — the
        gather-free analogue of the reference's per-thread sequence reads
        (src/bio/kernels.cu:49-66).
      klens: (1, count_pad128) int32 — true lengths (0 at pad lanes).

    Returns None when the bucket is too long for the Pallas kernel
    (W > W_MAX)."""
    nb, Kpad, CD, W = geometry(edge, edge, LANE)
    if W > W_MAX:
        return None
    count = mat.shape[0]
    rows = round_up(max(count, 1), S_TILE) + S_TILE
    m = np.full((rows, W), PAD, np.int8)
    m[:count, :edge] = mat[:, :edge]
    cwords = np.zeros((rows, 1 + W // 4), np.int32)
    cwords[:count, 0] = lengths[:count]
    cwords[:, 1:] = np.ascontiguousarray(m).view(np.int32)
    cols = round_up(max(count, 1), LANE)
    kT = np.full((Kpad, cols), PAD, np.int8)
    kT[:edge, :count] = mat[:, :edge].T
    klens = np.zeros((1, cols), np.int32)
    klens[0, :count] = lengths[:count]
    return cwords, kT, klens


def pack_bucket_words(mat: np.ndarray, edge: int):
    """Host-side strided packing of one bucket's (count, edge) int8 code
    matrix into the kernel's two word layouts, done ONCE per bucket at
    upload time (the per-dispatch pad + byte-group transpose + bitcast of
    build_inline — ~1/3 of device busy at short shapes — becomes a plain
    row gather):

      c-form (count, W//4) int32 — CD-window strided words for the column
        (s1) side; k-form (count, Kpad//4) int32 — KB-band strided words for
        the row (s2) side.  Byte k of word (window j, slot r) holds code
        ``j*win + k*win//4 + r`` (PAD beyond the true length), matching
        build_inline exactly.

    Returns (c_form, k_form), or None when the bucket is too long for the
    inline kernel (W > W_MAX; the engine's XLA path needs no packing)."""
    nb, Kpad, CD, W = geometry(edge, edge, LANE)
    if W > W_MAX:
        return None
    count = mat.shape[0]

    def strided(width: int, win: int) -> np.ndarray:
        m = np.full((count, width), PAD, np.int8)
        m[:, :edge] = mat[:, :edge]
        w = np.ascontiguousarray(
            m.reshape(count, width // win, 4, win // 4).transpose(0, 1, 3, 2)
        )
        return w.view(np.int32).reshape(count, width // 4)

    return strided(W, CD), strided(Kpad, band_kb(edge))


def align_packed(
    c1w, c2w, l1, l2, sub_p, gaps, *, algo: str, Lc: int, Lk: int, B: int,
    interpret: bool = False
):
    """Inline-scoring kernel on PRE-PACKED code words (pack_bucket_words
    rows gathered per pair): zero XLA-side layout work — the pair-to-minor
    transpose happens inside the kernel (see _make_kernel inline notes)."""
    n = c1w.shape[0]
    S = n // B
    nb, Kpad, CD, W = geometry(Lc, Lk, B)
    c1 = c1w[:, : W // 4].reshape(S, B, W // 4)
    c2 = c2w[:, : Kpad // 4].reshape(S, B, Kpad // 4)
    return align_prebuilt_inline(
        c1, c2, l1, l2, sub_p, gaps, algo=algo, Lc=Lc, Lk=Lk, B=B,
        interpret=interpret,
    )


def _make_kernel(
    algo: str, CD: int, W: int, KB: int, inline: bool = False,
    outer: bool = False, nb: int = 1,
):
    sm = np.int32(SCORE_MIN)  # concrete literal (a jnp scalar would be traced)
    nprev = 1 if algo == "nw" else 2  # H (+ Y) bottom-row streams
    LOG = KB.bit_length() - 1

    def kernel(gaps_ref, *refs):
        if outer:
            # Outer-product tile mode: grid (T, S_TILE, nb, chunks); the
            # 128 lanes are CONTIGUOUS k-side bucket rows (kmat_ref is a
            # lane window of the transposed bucket) and the whole grid-s
            # step shares ONE c-side row whose codes arrive as packed
            # scalars (cw_ref, SMEM).  Scoring reads a per-band prebuilt
            # (ALPHA*KB, B) table (qbuf) — near-zero VPU work per cell.
            (tab_ref, cw_ref, kmat_ref, klen_ref, out_ref, state, prev,
             qbuf) = refs
        elif inline:
            (tab_ref, c1_ref, c2_ref, l1_ref, l2_ref, out_ref, state, prev,
             cbuf, kbuf) = refs
        else:
            sk_ref, l1_ref, l2_ref, out_ref, state, prev = refs
        dim0 = 2 if outer else 1
        band = pl.program_id(dim0)
        c = pl.program_id(dim0 + 1)
        nchunks = pl.num_programs(dim0 + 1)
        shape = state.shape[1:]  # (KB, B)
        kiota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        k0mask = kiota == 0

        gap = gaps_ref[0, 0]
        opn = gaps_ref[0, 1]
        ext = gaps_ref[0, 2]
        if outer:
            l2 = klen_ref[...]  # (1, B) k-tile true lengths
            wstar = cw_ref[0, 0, 0] - 1  # scalar: shared c-row capture column
        else:
            l2 = l2_ref[0]  # (1, B)
            wstar = l1_ref[0] - 1  # capture column (0-based)
        khot = kiota == l2 - 1 - band * KB

        rp = band % 2  # read parity
        wp_par = (band + 1) % 2

        # Slope of the vertical-gap scan and its per-row ramp.
        slope = gap if algo == "nw" else jnp.maximum(ext, opn)
        ramp = kiota * slope
        kvec = kiota + band * KB + 1  # absolute 1-based DP row per state row

        def border(k):
            """Left/top border value at DP row/column index k (see module
            notes on the max(opn, ext) slope)."""
            if algo == "nw":
                return k * gap
            if algo == "ga":
                return opn + (k - 1) * jnp.maximum(opn, ext)
            return jnp.zeros_like(k)  # sw

        @pl.when((band == 0) & (c == 0))
        def _prefill():
            # Top border H[0][*] as band 0's "previous bottom row": slot j
            # holds H[0][column j] (slot 0 = H[0][0] = 0).
            wshape = prev.shape[2:]  # (W + 1, B)
            col = jax.lax.broadcasted_iota(jnp.int32, wshape, 0)
            if algo == "sw":
                prev[0, 0] = jnp.zeros(wshape, jnp.int32)
            else:
                prev[0, 0] = jnp.where(col <= 0, jnp.int32(0), border(col))
            prev[1, 0] = jnp.full(wshape, sm, jnp.int32)
            if nprev == 2:
                prev[0, 1] = jnp.full(wshape, sm, jnp.int32)
                prev[1, 1] = jnp.full(wshape, sm, jnp.int32)

        @pl.when(c == 0)
        def _init():
            # Left border column H[k][0] (nw.c:13-18 / ga.c:26-41 / sw.c:21-31)
            state[0] = border(kvec) + jnp.zeros(shape, jnp.int32)
            state[1] = jnp.full(shape, sm, jnp.int32)  # X[.][0]
            state[2] = jnp.zeros(shape, jnp.int32)  # capture accumulator
            # Seed the NEXT band's "column -1" diagonal read: its row 0 at
            # w = 0 reads slot 0 = H[this band's bottom row][0], the left
            # border — never written by the step loop below.
            prev[wp_par, 0, pl.ds(0, 1)] = (
                jnp.zeros((1, shape[1]), jnp.int32) + border((band + 1) * KB)
            )

        def scan_max(v):
            """Prefix max along band rows (axis 0): flat Kogge-Stone,
            log2(KB) roll+max+select steps (the select's mask is a constant,
            folded by Mosaic).  A two-level variant (3 local steps + a
            one-vreg scan of 8-row group totals + broadcast) was built and
            measured 83 Gcell/s vs 136 flat at 64x64 GA: the
            sublane-regrouping reshape and the group-prefix broadcast are
            multi-op relayouts on TPU, costing more than the 9 full-band
            ops they save."""
            for i in range(LOG):
                sh = 1 << i
                rolled = pltpu.roll(v, shift=np.int32(sh), axis=0)
                v = jnp.where(kiota < sh, v, jnp.maximum(v, rolled))
            return v

        if outer:
            # Per-band score table: qbuf[a*KB + k, b] = sub[c2codes[k, b], a]
            # for EVERY alphabet letter a — built once per band (once per
            # TILE when nb == 1, hoisted across all S_TILE c-rows) from the
            # VMEM-resident packed submatrix.  Each column's (KB, B) score
            # slab is then ONE dynamic sublane slice selected by the shared
            # c-row's scalar code: the per-pair mode's ~4 VPU ops/cell of
            # packed gathers + byte extracts (the in-loop LUT reads of
            # src/bio/kernels.cu:49-66) drop to ~0 per cell.
            assert KB % PACK8 == 0
            NS = KB // PACK8
            gd_sub = jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0,),
                start_index_map=(0,), operand_batching_dims=(1,),
                start_indices_batching_dims=(1,),
            )
            inb = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
            if nb > 1:
                build_cond = c == 0
            else:  # one band: the table is tile-wide, build at first c-row
                build_cond = (pl.program_id(1) == 0) & (c == 0)

            @pl.when(build_cond)
            def _qbuild():
                nlanes = shape[1]
                c2codes = kmat_ref[pl.ds(band * KB, KB), :].astype(jnp.int32)
                idx = c2codes & 7
                lshift = 24 - ((c2codes >> 3) << 3)
                for a in range(ALPHA):
                    prof = jnp.broadcast_to(
                        tab_ref[:, a : a + 1], (PACK8, nlanes)
                    )
                    parts = []
                    for r in range(NS):
                        sl = slice(r * PACK8, (r + 1) * PACK8)
                        g = jax.lax.gather(
                            prof, idx[sl][..., None], gd_sub, (1, 1), mode=inb
                        )
                        parts.append(jax.lax.shift_right_arithmetic(
                            jax.lax.shift_left(g, lshift[sl]), jnp.int32(24)
                        ))
                    qbuf[pl.ds(a * KB, KB), :] = jnp.concatenate(parts, axis=0)

            def get_sd(i, w):
                word = cw_ref[0, 0, 1 + (w >> 2)]  # packed c-row codes (SMEM)
                code = (word >> ((w & 3) * 8)) & 0xFF
                return qbuf[pl.ds(code * KB, KB), :]
        elif inline:
            # In-kernel substitution scoring (the reference's in-loop LUT
            # reads, src/bio/kernels.cu:49-66), from raw codes: one LANE-axis
            # per-lane gather by the column's s1 code pulls the byte-packed
            # alphabet profile (PACK8, B) out of the VMEM-resident table,
            # then four single-vreg (PACK8, B) sublane gathers indexed by the
            # band's s2 codes + a variable-shift byte extract yield the
            # (KB, B) scores — ~4 VPU ops per cell (a 25-way select chain
            # measured 3.4x the grid-mode kernel time; v5e has no byte gather
            # and 32-bit gathers cannot span sublane vregs, hence the
            # packing).  No score data touches HBM in this mode.
            assert KB % PACK8 == 0
            NS = KB // PACK8
            table = tab_ref[...]  # (PACK8, LANE) packed submatrix

            # Code words arrive PAIR-MAJOR (B, words) — the raw layout of
            # the engine's row gather (Mosaic's block rule also forbids a
            # words-minor block narrower than a lane tile) — and are
            # transposed + unpacked into VMEM scratch ONCE per superblock:
            # a materialized XLA transpose feeding the custom call measured
            # ~5x the cost of the same transpose done in-kernel (lane/sublane
            # shuffles on small resident tiles, overlapped with the DMAs),
            # and the per-grid-step unpack this replaces re-ran nb times per
            # chunk.  Strided pack: within window j of width win, byte k of
            # word (j, slot r) = code j*win + k*win/4 + r, so stacking the
            # four shift-ands along a new axis restores code order.
            def unpack(wt, win4):
                nwin = wt.shape[0] // win4
                parts = [
                    ((wt >> (8 * k)) & 0xFF).reshape(nwin, 1, win4, -1)
                    for k in range(4)
                ]
                cat = jnp.concatenate(parts, axis=1)
                return cat.reshape(nwin * 4 * win4, cat.shape[-1])

            @pl.when((band == 0) & (c == 0))
            def _codes():
                cbuf[...] = unpack(c1_ref[0].T, CD // 4)  # (W, B)
                kbuf[...] = unpack(c2_ref[0].T, KB // 4)  # (Kpad, B)

            # This band's s2 codes (offset is a static multiple of KB).
            c2codes = kbuf[pl.ds(pl.multiple_of(band * KB, KB), KB)]
            idx = c2codes & 7
            # Byte extract as (g << (24 - 8*(code>>3))) >> 24: arithmetic
            # final shift sign-extends the int8 score.
            lshift = 24 - ((c2codes >> 3) << 3)
            idx_s = [idx[r * PACK8:(r + 1) * PACK8] for r in range(NS)]
            lsh_s = [lshift[r * PACK8:(r + 1) * PACK8] for r in range(NS)]

            gd_sub = jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0,),
                start_index_map=(0,), operand_batching_dims=(1,),
                start_indices_batching_dims=(1,),
            )
            gd_lane = jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(1,),
                start_index_map=(1,), operand_batching_dims=(0,),
                start_indices_batching_dims=(0,),
            )
            inb = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS

            def get_sd(i, w):
                code_row = cbuf[pl.ds(w, 1)]  # (1, B) s1 code of column w
                idx1 = jnp.broadcast_to(code_row, (PACK8, shape[1]))
                g8 = jax.lax.gather(
                    table, idx1[..., None], gd_lane, (1, 1), mode=inb
                )
                parts = []
                for r in range(NS):
                    g = jax.lax.gather(
                        g8, idx_s[r][..., None], gd_sub, (1, 1), mode=inb
                    )
                    parts.append(jax.lax.shift_right_arithmetic(
                        jax.lax.shift_left(g, lsh_s[r]), jnp.int32(24)))
                return jnp.concatenate(parts, axis=0)
        else:

            def get_sd(i, w):
                return sk_ref[0, i].astype(jnp.int32)

        def capture(w, h, acc):
            """NW/GA result capture: the (l2-1, l1-1) cell, accumulated so a
            single end-of-grid sum yields the score.  In outer mode wstar is
            a SCALAR (the tile's shared c-row length), so the two vector ops
            run under a scalar-predicated cond — every column but one skips
            them; per-pair modes keep the vector select (wstar varies per
            lane)."""
            if outer:
                return jax.lax.cond(
                    w == wstar,
                    lambda a: a + jnp.where(khot, h, jnp.int32(0)),
                    lambda a: a,
                    acc,
                )
            return acc + jnp.where(khot & (w == wstar), h, jnp.int32(0))

        def step(i, ab, j, carry):
            w = c * CD + i  # 0-based column
            sd = get_sd(i, w)  # (KB, B)
            h_ab = ab[0][j + 1 : j + 2]  # H[k0-1][col w]
            h_ab_prev = ab[0][j : j + 1]  # H[k0-1][col w-1]
            hprev, xprev, acc = carry
            m = jnp.where(
                k0mask, h_ab_prev,
                pltpu.roll(hprev, shift=np.int32(1), axis=0),
            ) + sd
            if algo == "nw":
                zl = jnp.maximum(m, hprev + gap)
                z0 = jnp.where(k0mask, jnp.maximum(zl, h_ab + gap), zl)
                h = scan_max(z0 - ramp) + ramp
                acc = capture(w, h, acc)
                prev[wp_par, 0, pl.ds(w + 1, 1)] = h[KB - 1 : KB]
                return (h, xprev, acc)
            x = jnp.maximum(hprev + opn, xprev + ext)
            z = jnp.maximum(m, x)
            y_ab = ab[1][j + 1 : j + 2]
            zshift = jnp.where(
                k0mask,
                jnp.maximum(y_ab + ext, h_ab + opn),
                pltpu.roll(z, shift=np.int32(1), axis=0) + opn,
            )
            y = scan_max(zshift - ramp) + ramp
            h = jnp.maximum(z, y)
            if algo == "sw":
                h = jnp.maximum(h, jnp.int32(0))
                acc = jnp.maximum(acc, h)
            else:
                acc = capture(w, h, acc)
            prev[wp_par, 0, pl.ds(w + 1, 1)] = h[KB - 1 : KB]
            prev[wp_par, 1, pl.ds(w + 1, 1)] = y[KB - 1 : KB]
            return (h, x, acc)

        def step8(i8, carry):
            # Batch the band-above reads for 8 columns (one (9, B) slice per
            # stream instead of per-step (1, B) slices) and peel the 8 steps
            # with static sub-indices — also amortizes loop overhead.
            base = pl.multiple_of(i8 * 8, 8)
            w0 = c * CD + base
            ab = [prev[rp, s, pl.ds(w0, 9)] for s in range(nprev)]
            for j in range(8):
                carry = step(base + j, ab, j, carry)
            return carry

        carry0 = (state[0], state[1], state[2])
        if outer:
            # Column truncation at the tile's SHARED c-row length (an SMEM
            # scalar): columns beyond wstar are pad for EVERY lane of every
            # band of this (t, s) problem, contribute to no capture (NW/GA
            # capture at w == wstar; SW pad columns only decay, see module
            # notes), and the bound is identical across bands so the prev
            # stream is consistently written exactly where it is read.
            # Sorted buckets make this a large real-cell win (a 24-64-length
            # bucket pads to W = 64: ~30% of all padded columns skipped),
            # and dummy descriptor rows (length 0) cost ZERO columns — which
            # is what lets the engine pad tile groups to one dispatch.
            nst = jnp.clip((wstar + 1 - c * CD + 7) // 8, 0, CD // 8)
            carry = jax.lax.fori_loop(jnp.int32(0), nst, step8, carry0)
        else:
            carry = jax.lax.fori_loop(  # int32 bounds: int64 can't lower in Mosaic
                jnp.int32(0), jnp.int32(CD // 8), step8, carry0
            )
        for idx in range(3):
            state[idx] = carry[idx]

        @pl.when(c == nchunks - 1)
        def _finish():
            acc = state[2]
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


def align_prebuilt(
    sk, l1, l2, gaps, *, algo: str, Lc: int, Lk: int, B: int,
    interpret: bool = False
):
    """Run the column-sweep kernel on a prebuilt (S, W, Kpad, B) grid."""
    S = sk.shape[0]
    n = S * B
    nb, Kpad, CD, W = geometry(Lc, Lk, B)
    kb = band_kb(Lk)
    l1b = l1.reshape(S, 1, B).astype(jnp.int32)
    l2b = l2.reshape(S, 1, B).astype(jnp.int32)
    gaps2 = gaps.reshape(1, 3).astype(jnp.int32)

    grid = (S, nb, W // CD)
    nprev = 1 if algo == "nw" else 2
    out = pl.pallas_call(
        _make_kernel(algo, CD, W, kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gaps (1, 3)
            pl.BlockSpec((1, CD, kb, B), lambda s, b, c: (s, c, b, 0),
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
            pltpu.VMEM((3, kb, B), jnp.int32),  # H / X / acc carry handoff
            pltpu.VMEM((2, nprev, W + 1, B), jnp.int32),  # band crossing
        ],
        cost_estimate=pl.CostEstimate(
            flops=20 * S * B * Kpad * W, transcendentals=0,
            bytes_accessed=S * Kpad * W * B,
        ),
        interpret=interpret,
    )(gaps2, sk, l1b, l2b)
    return out.reshape(n)


def align_prebuilt_inline(
    c1, c2, l1, l2, sub_p, gaps, *, algo: str, Lc: int, Lk: int, B: int,
    interpret: bool = False
):
    """Run the column-sweep kernel with in-kernel scoring: c1 (S, B, W//4)
    / c2 (S, B, Kpad//4) PAIR-MAJOR packed code words (build_inline or
    gathered pack_bucket_words rows); substitution scores never touch
    HBM and no XLA-side transpose is needed."""
    S = c1.shape[0]
    n = S * B
    assert B == LANE  # the in-kernel lane gather spans exactly one vreg
    nb, Kpad, CD, W = geometry(Lc, Lk, B)
    kb = band_kb(Lk)
    l1b = l1.reshape(S, 1, B).astype(jnp.int32)
    l2b = l2.reshape(S, 1, B).astype(jnp.int32)
    gaps2 = gaps.reshape(1, 3).astype(jnp.int32)
    table = packed_lane_table(sub_p)

    grid = (S, nb, W // CD)
    nprev = 1 if algo == "nw" else 2
    out = pl.pallas_call(
        _make_kernel(algo, CD, W, kb, inline=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gaps (1, 3)
            pl.BlockSpec((PACK8, LANE), lambda s, b, c: (0, 0),
                         memory_space=pltpu.VMEM),  # packed submatrix
            # Full word rows per superblock (the block index only moves with
            # s, so Pallas fetches each once per superblock; a words-minor
            # per-chunk block would violate Mosaic's lane-tile rule).
            pl.BlockSpec((1, B, W // 4), lambda s, b, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),  # s1 code words
            pl.BlockSpec((1, B, Kpad // 4), lambda s, b, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),  # s2 code words
            pl.BlockSpec((1, 1, B), lambda s, b, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda s, b, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda s, b, c: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 1, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((3, kb, B), jnp.int32),  # H / X / acc carry handoff
            pltpu.VMEM((2, nprev, W + 1, B), jnp.int32),  # band crossing
            pltpu.VMEM((W, B), jnp.int32),  # unpacked s1 codes
            pltpu.VMEM((Kpad, B), jnp.int32),  # unpacked s2 codes
        ],
        cost_estimate=pl.CostEstimate(
            flops=25 * S * B * Kpad * W, transcendentals=0,
            bytes_accessed=S * B * (W + Kpad),
        ),
        interpret=interpret,
    )(gaps2, table, c1, c2, l1b, l2b)
    return out.reshape(n)


def pick_T(Lc: int, Lk: int, target_cells: int = 1 << 31, t_max: int = 256):
    """Tiles per outer-mode dispatch: sized by padded cells like pick_S
    (~2^31 ≈ 15 ms of device time), capped so one dispatch's output stays
    small, rounded down to a power of two (bounded executable set)."""
    nb, Kpad, CD, W = geometry(Lc, Lk, LANE)
    tile = S_TILE * LANE * Kpad * W
    t = max(1, min(t_max, target_cells // tile))
    return 1 << (int(t).bit_length() - 1)


def align_outer(
    desc, cwords, kmatT, klens, sub_p, gaps, *, algo: str, Lc: int, Lk: int,
    interpret: bool = False,
):
    """OUTER-PRODUCT-TILED column sweep: score T tiles of (S_TILE c-rows x
    LANE k-rows) pairs with ZERO per-pair data movement.

    Each tile pairs S_TILE consecutive c-side bucket rows against one
    contiguous 128-lane window of the TRANSPOSED k-side bucket (kmatT), so
    the engine ships only a (T, 2) int32 descriptor array [c0_row, k_tile]
    per dispatch — no per-pair gather, no pair-minor transpose, no packed
    word streams (the per-dispatch row gather + in-kernel unpack of the
    per-pair mode are gone entirely).  Pairs that a rectangle covers twice
    or that fall outside a triangle (same-bucket diagonal tiles) are simply
    discarded by the host — the kernel needs no validity masking because
    pad rows/lanes carry length 0 and PAD codes.

    This is the TPU-shaped analogue of the reference CUDA path's zero-prep
    in-loop scoring (src/bio/kernels.cu:49-66): where each CUDA thread walks
    its own pair, here each grid step walks 128 pairs that share one c-row,
    so the k-side streams contiguously and the substitution scores come from
    a per-band VMEM table (see _make_kernel outer notes).

    Args:
      desc: (T, 2) int32 [c-row index, k-tile index] per tile.
      cwords/kmatT/klens: pack_bucket_outer arrays (c bucket / k bucket).
    Returns: (T, S_TILE, LANE) int32 scores (tile-major, c-row, k-lane).
    """
    T = desc.shape[0]
    B = LANE
    nb, Kpad, CD, W = geometry(Lc, Lk, B)
    kb = band_kb(Lk)
    gaps2 = gaps.reshape(1, 3).astype(jnp.int32)
    table = packed_lane_table(sub_p)
    nprev = 1 if algo == "nw" else 2
    kern = _make_kernel(algo, CD, W, kb, outer=True, nb=nb)
    # Mosaic's block rule wants the last two dims equal to the array's (or
    # 8/128-divisible): give the per-row SMEM window a singleton sublane dim.
    cwords = cwords.reshape(cwords.shape[0], 1, 1 + W // 4)

    def kernel(desc_ref, gaps_ref, *refs):  # desc feeds index maps only
        return kern(gaps_ref, *refs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, S_TILE, nb, W // CD),
        in_specs=[
            pl.BlockSpec((PACK8, LANE), lambda t, s, b, c, d, g: (0, 0),
                         memory_space=pltpu.VMEM),  # packed submatrix
            pl.BlockSpec((1, 1, 1 + W // 4),
                         lambda t, s, b, c, d, g: (d[t, 0] + s, 0, 0),
                         memory_space=pltpu.SMEM),  # shared c-row words
            pl.BlockSpec((Kpad, B), lambda t, s, b, c, d, g: (0, d[t, 1]),
                         memory_space=pltpu.VMEM),  # k-tile codes (int8 T)
            pl.BlockSpec((1, B), lambda t, s, b, c, d, g: (0, d[t, 1]),
                         memory_space=pltpu.VMEM),  # k-tile lengths
        ],
        out_specs=pl.BlockSpec(
            (1, 1, B), lambda t, s, b, c, d, g: (t * S_TILE + s, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((3, kb, B), jnp.int32),  # H / X / acc carry handoff
            pltpu.VMEM((2, nprev, W + 1, B), jnp.int32),  # band crossing
            pltpu.VMEM((ALPHA * kb, B), jnp.int32),  # per-band score table
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * S_TILE, 1, B), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=20 * T * S_TILE * B * Kpad * W, transcendentals=0,
            bytes_accessed=T * (S_TILE * W + Kpad * B),
        ),
        interpret=interpret,
    )(desc, gaps2, table, cwords, kmatT, klens)
    return out.reshape(T, S_TILE, B)


@functools.partial(
    jax.jit, static_argnames=("algo", "Lc", "Lk", "B", "interpret", "inline")
)
def align_superblock(
    s1, s2, l1, l2, sub_p, gaps, *, algo: str, Lc: int, Lk: int, B: int,
    interpret: bool = False, inline: bool = False
):
    """Score S*B pairs with the Pallas column-sweep kernel (single jit —
    convenient for tests; the engine dispatches build_stream and
    align_prebuilt separately for the fast layout path).

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
    nb, Kpad, CD, W = geometry(Lc, Lk, B)
    if inline:
        c1, c2 = build_inline(
            s1, s2, S=S, B=B, Lc=Lc, Lk=Lk, Kpad=Kpad, W=W, CD=CD
        )
        return align_prebuilt_inline(
            c1, c2, l1, l2, sub_p, gaps, algo=algo, Lc=Lc, Lk=Lk, B=B,
            interpret=interpret,
        )
    sk = build_stream(s1, s2, sub_p, S=S, B=B, Lc=Lc, Lk=Lk, Kpad=Kpad, W=W)
    return align_prebuilt(
        sk, l1, l2, gaps, algo=algo, Lc=Lc, Lk=Lk, B=B, interpret=interpret
    )
