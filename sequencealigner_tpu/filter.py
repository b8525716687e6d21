"""Similarity prefilter: greedy positional-identity dedup before alignment.

Semantics of the reference filter (/root/reference/src/bio/filter.c:14-89)
made *deterministic*: sequence j is dropped iff some KEPT i < j has
matches/min(len_i, len_j) >= threshold, where matches counts positionally
equal characters over the first min(len) positions (filter.c:48-54), resolved
strictly in file order (the reference's OpenMP version races on lost[] and is
only nondeterministically close to this; SURVEY.md §5 fixes keep-first-in-file-
order as the spec).  The division is performed in float32 like the C code.

TPU-first: the O(N^2 * L) match counting runs as blocked equality reductions
on the device; only the O(N^2) greedy resolution runs on the host.
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


@functools.partial(jax.jit, static_argnums=())
def _match_counts(rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """(Bi, L) x (Bj, L) uint8 -> (Bi, Bj) int32 positional match counts over
    positions where both are real characters."""
    eq = (rows[:, None, :] == cols[None, :, :]) & (rows[:, None, :] != _PAD)
    return jnp.sum(eq, axis=-1, dtype=jnp.int32)


def filter_sequences(
    ss: SequenceSet, threshold: float, *, block: int = 512, progress: bool = True
) -> tuple[SequenceSet, int]:
    """Returns (filtered set, number dropped)."""
    if threshold <= 0.0:
        return ss, 0

    n = ss.num
    lengths = ss.lengths.astype(np.int64)
    lmax = ss.max_len
    chars = np.full((n, lmax), _PAD, dtype=np.uint8)
    for i in range(n):
        s = ss.data[ss.offsets[i] : ss.offsets[i + 1]]
        chars[i, : len(s)] = s

    thr = np.float32(threshold)
    lost = np.zeros(n, dtype=np.uint8)
    bar = ui.Progress(n - 1, "Filtering sequences") if progress else None

    chars_dev = jax.device_put(chars)
    for j0 in range(0, n, block):
        j1 = min(j0 + block, n)
        cols_dev = jax.lax.slice_in_dim(chars_dev, j0, j1, axis=0)
        # Match counts of every candidate row i < j1 against this column block.
        counts = np.empty((j1, j1 - j0), dtype=np.int32)
        for i0 in range(0, j1, block):
            i1 = min(i0 + block, j1)
            rows_dev = jax.lax.slice_in_dim(chars_dev, i0, i1, axis=0)
            counts[i0:i1] = np.asarray(_match_counts(rows_dev, cols_dev))
        minlen = np.minimum(lengths[:j1, None], lengths[None, j0:j1])
        sim = np.ascontiguousarray(
            counts.astype(np.float32) / minlen.astype(np.float32) >= thr
        ).view(np.uint8)
        # Greedy in-order resolution within the block (cross-block kept status
        # is already final); native C loop with a NumPy fallback.
        from .io import native

        if not native.filter_resolve(sim, lost, j0, j1):
            lostb = lost.view(bool)
            for j in range(max(j0, 1), j1):
                cand = sim.view(bool)[:j, j - j0]
                lostb[j] = bool(np.any(cand & ~lostb[:j]))
        if bar:
            bar.add(j1 - j0)
    if bar:
        bar.end()

    lost = lost.view(bool)
    dropped = int(lost.sum())
    if dropped == 0:
        return ss, 0
    keep = np.flatnonzero(~lost)
    seqs = [ss.data[ss.offsets[i] : ss.offsets[i + 1]] for i in keep]
    return SequenceSet.from_list(seqs, ss.lut), dropped
