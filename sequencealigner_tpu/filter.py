"""Similarity prefilter: greedy positional-identity dedup before alignment.

Semantics of the reference filter (/root/reference/src/bio/filter.c:14-89)
made *deterministic*: sequence j is dropped iff some KEPT i < j has
matches/min(len_i, len_j) >= threshold, where matches counts positionally
equal characters over the first min(len) positions (filter.c:48-54), resolved
strictly in file order (the reference's OpenMP version races on lost[] and is
only nondeterministically close to this; SURVEY.md §5 fixes keep-first-in-file-
order as the spec).  The division is performed in float32 like the C code.

TPU-first and transfer-light: the O(N^2 * L) match counting runs as blocked
equality reductions on the device, and the comparison against every PRIOR
block is also REDUCED on the device against the current kept mask — so only
one bool per candidate plus the (block x block) local similarity tile ever
crosses the host link (~N*block bytes total, not the O(N^2) count matrix).
Only the O(block^2)-per-block greedy resolution runs on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ui
from .io.input import SequenceSet

#: Pad value for the raw char matrix: NUL never occurs in parsed sequences
#: (parsers reject it), so pad-pad positions can never count as matches.
_PAD = 0


@functools.partial(jax.jit, static_argnames=("block",))
def _filter_block(chars, lens, kept, thr, j0, *, block):
    """One candidate block [j0, j0+block) against all prior blocks + itself.

    chars: (Np, L) uint8, padded to a multiple of ``block`` rows (pad rows
      have lens == 0).  kept: (Np,) uint8 — kept status, FINAL for rows
      < j0, irrelevant beyond.  Returns:
      killed_prior: (block,) bool — candidate j similar to any KEPT i < j0.
      sim_local: (block, block) uint8 — similarity of in-block pairs.
    """
    f32 = jnp.float32
    cols = jax.lax.dynamic_slice_in_dim(chars, j0, block, 0)  # (Bj, L)
    collens = jax.lax.dynamic_slice_in_dim(lens, j0, block, 0)
    nblk = chars.shape[0] // block

    def sim_of(rows, rowlens):
        eq = (rows[:, None, :] == cols[None, :, :]) & (rows[:, None, :] != _PAD)
        counts = jnp.sum(eq, axis=-1, dtype=jnp.int32)
        minlen = jnp.minimum(rowlens[:, None], collens[None, :])
        return (minlen > 0) & (
            counts.astype(f32) / jnp.maximum(minlen, 1).astype(f32) >= thr
        )

    def body(killed, i0):
        rows = jax.lax.dynamic_slice_in_dim(chars, i0, block, 0)
        rowlens = jax.lax.dynamic_slice_in_dim(lens, i0, block, 0)
        keptb = jax.lax.dynamic_slice_in_dim(kept, i0, block, 0) != 0
        prior = sim_of(rows, rowlens) & keptb[:, None]
        hit = jnp.any(prior & (i0 < j0), axis=0)  # whole block prior to j0
        return killed | hit, None

    i0s = jnp.arange(nblk, dtype=jnp.int32) * block
    # Only whole blocks strictly before j0 contribute (j0 is block-aligned);
    # later blocks are masked inside body via (i0 < j0).
    killed, _ = jax.lax.scan(body, jnp.zeros(block, bool), i0s)
    sim_local = sim_of(cols, collens)
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
    npad = -(-n // block) * block
    lengths = np.zeros(npad, np.int32)
    lengths[:n] = ss.lengths
    chars = np.zeros((npad, ss.max_len), dtype=np.uint8)
    chars[:n] = _char_matrix(ss, n, ss.max_len)

    thr = np.float32(threshold)
    lost = np.zeros(npad, dtype=np.uint8)
    kept = np.ones(npad, dtype=np.uint8)
    bar = ui.Progress(n - 1, "Filtering sequences") if progress else None

    chars_dev = jax.device_put(chars)
    lens_dev = jax.device_put(lengths)
    from .io import native

    for j0 in range(0, n, block):
        j1 = min(j0 + block, n)
        killed, sim_local = _filter_block(
            chars_dev, lens_dev, jax.device_put(kept), thr,
            np.int32(j0), block=block,
        )
        killed = np.asarray(killed)[: j1 - j0]
        bsz = j1 - j0
        # Host greedy within the block, with the device-reduced prior-block
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
            bar.add(j1 - j0)
    if bar:
        bar.end()

    lost = lost.view(bool)[:n]
    dropped = int(lost.sum())
    if dropped == 0:
        return ss, 0
    keep = np.flatnonzero(~lost)
    seqs = [ss.data[ss.offsets[i] : ss.offsets[i + 1]] for i in keep]
    return SequenceSet.from_list(seqs, ss.lut), dropped
