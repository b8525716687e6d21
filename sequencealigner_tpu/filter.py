"""Similarity prefilter: greedy positional-identity dedup before alignment.

Semantics of the reference filter (/root/reference/src/bio/filter.c:14-89)
made *deterministic*: sequence j is dropped iff some KEPT i < j has
matches/min(len_i, len_j) >= threshold, where matches counts positionally
equal characters over the first min(len) positions (filter.c:48-54), resolved
strictly in file order (the reference's OpenMP version races on lost[] and is
only nondeterministically close to this; SURVEY.md §5 fixes keep-first-in-file-
order as the spec).  The division is performed in float32 like the C code.

TPU-first:
- **MXU match counting.**  Positional identity over characters is a dot
  product of one-hot encodings: counts = OH_i · OH_j^T with OH = (rows,
  L x 24) int8 (pad positions get the all-zero vector, so pad never
  matches).  One (block, L*24) x (L*24, seg) int8 matmul replaces the VPU
  eq+reduce — ~150x on the counting itself.
- **Device-reduced prior verdicts, segment batching.**  Candidates are
  processed in SEGMENTS of several blocks per dispatch; the comparison
  against every PRIOR block is reduced on-device against the current kept
  mask, so per segment only one bool per candidate plus the (seg x seg)
  local tile crosses the host link.  Host work is the O(seg^2) greedy
  resolution only (native C with a NumPy fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ui
from .io.input import SequenceSet

#: Pad value for the raw char matrix: NUL never occurs in parsed sequences
#: (parsers reject it), so pad positions one-hot to the zero vector.
_PAD = 0

#: Blocks per dispatch segment: larger segments amortize host round trips
#: (the n=100k filter was ~98% link latency at one block per dispatch).
SEG_BLOCKS = 8


@functools.partial(jax.jit, static_argnames=("block", "nseg"))
def _filter_segment(codes, lens, kept, thr, j0, *, block, nseg):
    """One candidate segment [j0, j0 + block*nseg) against all prior blocks
    and itself.

    codes: (Np, L) int8 compact char codes (0..23; -1 at pad), Np a multiple
    of block; lens: (Np,) int32 (0 on pad rows); kept: (Np,) uint8, final
    below j0.  Returns killed_prior (S,) bool and sim_local (S, S) uint8,
    S = block * nseg.
    """
    f32 = jnp.float32
    S = block * nseg
    L = codes.shape[1]

    def onehot_flat(rows):
        # bf16: guarantees the MXU path; counts <= L <= 2^14 are exact in
        # the f32 accumulator
        oh = jax.nn.one_hot(rows, 24, dtype=jnp.bfloat16)  # (r, L, 24)
        return oh.reshape(rows.shape[0], L * 24)

    cols = jax.lax.dynamic_slice_in_dim(codes, j0, S, 0)
    collens = jax.lax.dynamic_slice_in_dim(lens, j0, S, 0)
    colflat = onehot_flat(cols)  # (S, L*24)

    def sim_of(counts, rowlens):
        minlen = jnp.minimum(rowlens[:, None], collens[None, :])
        return (minlen > 0) & (
            counts / jnp.maximum(minlen, 1).astype(f32) >= thr
        )

    nblk = codes.shape[0] // block

    def body(killed, i0):
        rows = jax.lax.dynamic_slice_in_dim(codes, i0, block, 0)
        rowlens = jax.lax.dynamic_slice_in_dim(lens, i0, block, 0)
        keptb = jax.lax.dynamic_slice_in_dim(kept, i0, block, 0) != 0
        counts = jax.lax.dot_general(
            onehot_flat(rows), colflat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block, S)
        prior = sim_of(counts, rowlens) & keptb[:, None]
        hit = jnp.any(prior & (i0 < j0), axis=0)  # whole block prior to j0
        return killed | hit, None

    # Static full-square scan with an (i0 < j0) mask: a dynamic fori bound
    # measured 13x SLOWER (465 vs 35 s at n=100k) — XLA pipelines the
    # fixed-trip scan, not the dynamic loop.
    i0s = jnp.arange(nblk, dtype=jnp.int32) * block
    killed, _ = jax.lax.scan(body, jnp.zeros(S, bool), i0s)

    counts_local = jax.lax.dot_general(
        colflat, colflat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sim_local = sim_of(counts_local, collens)
    return killed, sim_local.astype(jnp.uint8)


def _char_matrix(ss: SequenceSet, n: int, lmax: int) -> np.ndarray:
    """(n, lmax) uint8 raw-byte matrix, vectorized (no per-sequence loop)."""
    chars = np.zeros((n, lmax), dtype=np.uint8)
    total = int(ss.offsets[n])
    row = np.repeat(np.arange(n), np.diff(ss.offsets[: n + 1]).astype(np.int64))
    col = np.arange(total, dtype=np.int64) - ss.offsets[row]
    chars[row, col] = ss.data[:total]
    return chars


def filter_sequences(
    ss: SequenceSet, threshold: float, *, block: int = 512, progress: bool = True
) -> tuple[SequenceSet, int]:
    """Returns (filtered set, number dropped)."""
    if threshold <= 0.0:
        return ss, 0

    n = ss.num
    S = block * SEG_BLOCKS
    npad = -(-n // S) * S
    lengths = np.zeros(npad, np.int32)
    lengths[:n] = ss.lengths
    chars = np.zeros((npad, ss.max_len), dtype=np.uint8)
    chars[:n] = _char_matrix(ss, n, ss.max_len)
    # Compact codes: valid chars map through the parse-time LUT (0..23);
    # pad/invalid become -1, whose one-hot is the zero vector (never matches).
    codes = np.where(
        chars == _PAD, np.int8(-1), ss.lut[chars].astype(np.int8)
    )

    thr = np.float32(threshold)
    lost = np.zeros(npad, dtype=np.uint8)
    kept = np.ones(npad, dtype=np.uint8)
    bar = ui.Progress(n - 1, "Filtering sequences") if progress else None

    codes_dev = jax.device_put(codes)
    lens_dev = jax.device_put(lengths)
    from .io import native

    for j0 in range(0, n, S):
        j1 = min(j0 + S, n)
        killed, sim_local = _filter_segment(
            codes_dev, lens_dev, jax.device_put(kept), thr,
            np.int32(j0), block=block, nseg=SEG_BLOCKS,
        )
        bsz = j1 - j0
        killed = np.asarray(killed)[:bsz]
        # Host greedy within the segment, with the device-reduced prior-block
        # verdict folded in as a SENTINEL row 0 (a permanently-kept pseudo
        # sequence "similar" to every prior-killed candidate), so cascading
        # works: a candidate killed by a prior block cannot itself kill.
        sim = np.asarray(sim_local)[:bsz, :bsz]
        aug = np.zeros((bsz + 1, bsz), np.uint8)
        aug[0] = killed.astype(np.uint8)
        aug[1:] = sim
        loc_lost = np.zeros(bsz + 1, np.uint8)
        if not native.filter_resolve(aug, loc_lost, 1, bsz + 1):
            lb = loc_lost.view(bool)
            augb = aug.view(bool)
            for j in range(1, bsz + 1):
                lb[j] = bool(np.any(augb[:j, j - 1] & ~lb[:j]))
        lost[j0:j1] = loc_lost[1:]
        kept[j0:j1] = 1 - lost[j0:j1]
        if bar:
            bar.add(bsz)
    if bar:
        bar.end()

    lost = lost.view(bool)[:n]
    dropped = int(lost.sum())
    if dropped == 0:
        ss.kept = np.arange(n, dtype=np.int64)
        return ss, 0
    keep = np.flatnonzero(~lost)
    seqs = [ss.data[ss.offsets[i] : ss.offsets[i + 1]] for i in keep]
    out = SequenceSet.from_list(seqs, ss.lut)
    out.kept = keep.astype(np.int64)  # original indices of the survivors
    return out, dropped
