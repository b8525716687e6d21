"""Alignment engine: orchestrates bucketed pair blocks onto the device mesh.

TPU-native replacement for the reference's orchestration layer
(/root/reference/src/interface/seqalign_cuda.c): instead of a CUDA batch loop
with two streams (:151-290), blocks of pairs are dispatched asynchronously
under jit — JAX's async dispatch overlaps device compute with the host-side
fetch/scatter of the previous block, the same double-buffering the reference
builds by hand.  Multi-device: the block batch dimension is sharded over a
1-D ``pairs`` mesh axis (data parallelism over the pair space — the only
parallelism the problem has, SURVEY.md §2.7); bucket sequence data is
replicated, so no cross-device communication happens during scoring at all.
Device memory never holds the N^2 matrix: scores stream back per block
(hence no analogue of cuda_memory() is needed).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Persistent compilation cache: a CLI run is a fresh process, and the bucketed
# pair schedule compiles one executable per (algo, Lc, Lk, B) shape — cache
# them across invocations so only the first-ever run pays compile time.
_cache_dir = os.environ.get(
    "SEQALIGN_TPU_CACHE", os.path.expanduser("~/.cache/sequencealigner-tpu/xla")
)
if _cache_dir and _cache_dir != "0":
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization; never fail on it
        pass

from . import ui
from .io.input import SequenceSet
from .io.output import OutputStore
from .ops.xla_dp import PAD, align_block, padded_submatrix
from .scheduler import Schedule, block_width

ALGOS = ("nw", "ga", "sw")


def make_mesh(device_kind: str = "auto", n_devices: int | None = None) -> Mesh:
    """1-D mesh over the pair axis.  device_kind 'cpu' is the -C fallback
    (the reference's CPU path, seqalign_cuda.c:318-328)."""
    devs = jax.devices("cpu") if device_kind == "cpu" else jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("pairs",))


@partial(jax.jit, static_argnames=("algo", "Lc", "Lk"), donate_argnums=())
def _score_block(bucket_c, bucket_k, rows_c, rows_k, l1, l2, sub_p, gaps, *, algo, Lc, Lk):
    s1 = bucket_c[rows_c].astype(jnp.int32)
    s2 = bucket_k[rows_k].astype(jnp.int32)
    return align_block(s1, s2, l1, l2, sub_p, gaps, algo=algo, Lc=Lc, Lk=Lk)


@dataclasses.dataclass
class AlignStats:
    pairs: int = 0
    cells: int = 0
    seconds: float = 0.0

    @property
    def pairs_per_sec(self) -> float:
        return self.pairs / self.seconds if self.seconds else 0.0

    @property
    def gcups(self) -> float:
        return self.cells / self.seconds / 1e9 if self.seconds else 0.0


class Engine:
    def __init__(
        self,
        algo: str,
        sub: np.ndarray,
        gaps: tuple[int, int, int],
        *,
        mesh: Mesh | None = None,
        device_kind: str = "auto",
        target_cells: int | None = None,
    ):
        if algo not in ALGOS:
            raise ValueError(f"unknown algorithm {algo!r}")
        self.algo = algo
        self.mesh = mesh if mesh is not None else make_mesh(device_kind)
        self.ndev = self.mesh.devices.size
        self.sub_p = padded_submatrix(sub)
        self.gaps = np.asarray(gaps, dtype=np.int32)
        self.target_cells = target_cells
        self._shard = NamedSharding(self.mesh, P("pairs"))
        self._rep = NamedSharding(self.mesh, P())

    def _put_rep(self, x):
        return jax.device_put(x, self._rep)

    def _put_shard(self, x):
        return jax.device_put(x, self._shard)

    def _bucket_arrays(self, ss: SequenceSet, sched: Schedule):
        """Per-bucket device-resident int8 LUT-index matrices (pad = PAD)."""
        lut = ss.lut
        arrays = []
        for b in sched.buckets:
            rows = sched.order[b.start : b.end]
            mat = np.full((b.count, b.edge), PAD, dtype=np.int8)
            for local, orig in enumerate(rows):
                s = ss.data[ss.offsets[orig] : ss.offsets[orig + 1]]
                mat[local, : len(s)] = lut[s]
            arrays.append(self._put_rep(mat))
        return arrays

    def align_all(
        self,
        ss: SequenceSet,
        store: OutputStore | None,
        *,
        progress: bool = True,
    ) -> AlignStats:
        sched = Schedule.build(ss.lengths)
        total_pairs = sched.total_pairs()
        ui.pinfo("Performing %d pairwise alignments", total_pairs)
        bar = ui.Progress(total_pairs, "Aligning sequences") if progress else None

        t0 = time.perf_counter()
        buckets_dev = self._bucket_arrays(ss, sched)
        sub_dev = self._put_rep(self.sub_p)
        gaps_dev = self._put_rep(self.gaps)

        stats = AlignStats()
        pending = None

        def resolve(p):
            dev_scores, blk = p
            scores = np.asarray(dev_scores)
            v = blk.valid
            if store is not None:
                store.fill_pairs(blk.orig_i[v], blk.orig_j[v], scores[v])
            stats.pairs += blk.n_valid
            stats.cells += blk.cells
            if bar:
                bar.add(blk.n_valid)

        kwargs = {}
        if self.target_cells:
            kwargs["target_cells"] = self.target_cells
        for a, b in sched.combos():
            npairs = sched.combo_pair_count(a, b)
            if npairs == 0:
                continue
            Lk = sched.buckets[a].edge
            Lc = sched.buckets[b].edge
            B = block_width(Lc, Lk, self.target_cells) if self.target_cells else block_width(Lc, Lk)
            # Shrink small-combo blocks, but keep divisibility by mesh size.
            while B // 2 >= max(self.ndev, 8) and B // 2 >= npairs:
                B //= 2
            B = max(B, self.ndev)
            for blk in sched.blocks(a, b, width=B):
                dev_scores = _score_block(
                    buckets_dev[b],
                    buckets_dev[a],
                    self._put_shard(blk.rows_c),
                    self._put_shard(blk.rows_k),
                    self._put_shard(blk.l1),
                    self._put_shard(blk.l2),
                    sub_dev,
                    gaps_dev,
                    algo=self.algo,
                    Lc=Lc,
                    Lk=Lk,
                )
                if pending is not None:
                    resolve(pending)
                pending = (dev_scores, blk)
        if pending is not None:
            resolve(pending)
        if bar:
            bar.end()
        stats.seconds = time.perf_counter() - t0
        return stats
