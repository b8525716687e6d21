"""Multi-host distribution of the pair space.

The reference is strictly single-process / single-GPU (SURVEY.md §2.7:
``cudaSetDevice(0)`` hardcoded, seqalign_cuda.c:65).  This module is the
TPU-native scale-out it never had, per the SURVEY plan: the schedule's
superblock stream is deterministically striped across hosts (pairs are
sharded, never one DP matrix), each host scores its stripe on its local
devices, and score triplets are merged with ``process_allgather`` over
DCN so every host ends with the complete result.  No sequence data moves:
inputs are replicated (every host parses the same file), only final scores
(12 B/pair) cross the network.

Design notes:
- Striping is by global superblock index (round-robin), which balances load
  because blocks within a bucket-combo have uniform cell cost and combos are
  interleaved across hosts.
- Merge points must be globally deterministic: the engine counts *all* blocks
  (owned or not) toward its flush threshold, so every host reaches each merge
  point after the same block sequence, keeping the collective aligned.
- ``jax.distributed.initialize`` is driven by env vars so the same CLI works
  single-host (no-op) and under a pod launcher.
"""

from __future__ import annotations

import os

import numpy as np


def init_from_env() -> tuple[int, int]:
    """Initialize the JAX distributed runtime when the environment asks for
    it; returns (process_index, process_count).

    Env contract (same triple the standard launchers provide):
      SEQALIGN_TPU_COORDINATOR=host:port  SEQALIGN_TPU_NUM_PROCESSES=N
      SEQALIGN_TPU_PROCESS_ID=K — or rely on jax.distributed's own
      auto-detection env (Cloud TPU metadata) by setting
      SEQALIGN_TPU_DISTRIBUTED=1.
    """
    import jax

    coord = os.environ.get("SEQALIGN_TPU_COORDINATOR")
    auto = os.environ.get("SEQALIGN_TPU_DISTRIBUTED") == "1"
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["SEQALIGN_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["SEQALIGN_TPU_PROCESS_ID"]),
        )
    elif auto:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def default_gather():
    """The real collective (lazy import; only touched multi-process)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather


class TripletMerger:
    """Exchange (i, j, score) triplets between hosts; every host returns the
    union, so each host's OutputStore converges to the full matrix.

    ``gather`` maps a host-local ndarray to a stacked (nhosts, ...) ndarray
    (injected in tests; defaults to jax.experimental.multihost_utils
    process_allgather over DCN).
    """

    def __init__(self, nhosts: int, gather=None):
        self.nhosts = nhosts
        self._gather = gather

    def __call__(
        self, i: np.ndarray, j: np.ndarray, s: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self.nhosts == 1:
            return i, j, s
        gather = self._gather or default_gather()
        n_local = np.asarray([len(s)], dtype=np.int64)
        sizes = np.asarray(gather(n_local)).reshape(-1)
        m = int(sizes.max())

        def exchange(x, dtype):
            x = np.asarray(x, dtype=dtype)
            if m > len(x):
                x = np.concatenate([x, np.zeros(m - len(x), dtype=dtype)])
            g = np.asarray(gather(x))  # (nhosts, m)
            return np.concatenate([g[h, : sizes[h]] for h in range(len(sizes))])

        return (
            exchange(i, np.int64),
            exchange(j, np.int64),
            exchange(s, np.int32),
        )


def barrier(name: str = "seqalign") -> None:
    """Cross-host sync point (e.g. before host 0 writes the output file)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
