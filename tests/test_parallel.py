"""Multi-host distribution logic, simulated in-process: partition striping
must cover the pair space exactly once across hosts, and merged partitioned
runs must reproduce the unpartitioned result bit-for-bit (SURVEY.md §2.7's
multi-host pair-block sharding plan)."""

import os
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]

from sequencealigner_tpu import matrices
from sequencealigner_tpu.engine import Engine
from sequencealigner_tpu.io.input import SequenceSet
from sequencealigner_tpu.io.output import OutputStore
from sequencealigner_tpu.parallel.multihost import TripletMerger

M = matrices.get("blosum62")


def _random_set(rng, n, lo=4, hi=40):
    seqs = [
        rng.choice(np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8),
                   int(rng.integers(lo, hi)))
        for _ in range(n)
    ]
    return SequenceSet.from_list(seqs, M.lut)


def _matrix(store):
    return np.asarray(store.matrix).reshape(store.dim, store.dim)


@pytest.mark.parametrize("nhosts", [2, 3])
def test_partitioned_union_equals_full(nhosts):
    rng = np.random.default_rng(5)
    ss = _random_set(rng, 36)
    gaps = (0, -10, -1)

    eng = Engine("ga", M.matrix, gaps, device_kind="cpu", target_cells=1 << 12)
    full = OutputStore(ss.num, triangular=False, spill=False)
    stats = eng.align_all(ss, full, progress=False)
    assert stats.pairs == ss.num * (ss.num - 1) // 2

    merged = np.zeros((ss.num, ss.num), np.int32)
    covered = np.zeros((ss.num, ss.num), bool)
    total_pairs = 0
    for h in range(nhosts):
        st = OutputStore(ss.num, triangular=False, spill=False)
        s = eng.align_all(ss, st, progress=False, partition=(h, nhosts))
        total_pairs += s.pairs
        got = _matrix(st)
        mask = got != 0
        # Hosts must not overlap (a pair is scored by exactly one host).
        assert not (covered & mask).any()
        covered |= mask
        merged = np.where(mask, got, merged)
    assert total_pairs == stats.pairs
    np.testing.assert_array_equal(merged, _matrix(full))


class FakeGather:
    """Stands in for process_allgather: replays per-host inputs recorded from
    sequential runs, returning the stacked (nhosts, ...) array every host
    would see."""

    def __init__(self, per_host_values):
        self.vals = per_host_values

    def __call__(self, x):
        return np.stack(self.vals)


def test_triplet_merger_exchanges_union():
    from sequencealigner_tpu.parallel.multihost import pack_triplets

    i0, j0, s0 = (np.array([1, 2], np.int64), np.array([3, 4], np.int64),
                  np.array([10, 20], np.int32))
    # int64-range indices must survive the int32-word packing
    i1, j1, s1 = (np.array([1 << 40], np.int64), np.array([6], np.int64),
                  np.array([-30], np.int32))

    def gather(x):
        # emulate both hosts contributing to each collective
        if x.dtype == np.int64 and len(x) == 1:  # word-count exchange
            return np.array([[5 * 2], [5 * 1]])
        return np.stack([x, pack_triplets(i1, j1, s1, len(x))])

    m = TripletMerger(2, gather=gather)
    gi, gj, gs = m(i0, j0, s0)
    np.testing.assert_array_equal(gi, [1, 2, 1 << 40])
    np.testing.assert_array_equal(gj, [3, 4, 6])
    np.testing.assert_array_equal(gs, [10, 20, -30])


def test_triplet_merger_single_host_passthrough():
    m = TripletMerger(1)
    i = np.array([1], np.int64)
    j = np.array([2], np.int64)
    s = np.array([3], np.int32)
    gi, gj, gs = m(i, j, s)
    assert gi is i and gj is j and gs is s


def test_partition_with_merger_completes_every_store():
    """With the merger exchanging triplets, every host's store must converge
    to the full matrix (what happens on a real 2-host run)."""
    rng = np.random.default_rng(9)
    ss = _random_set(rng, 24)
    gaps = (-4, 0, 0)
    eng = Engine("nw", M.matrix, gaps, device_kind="cpu", target_cells=1 << 12)

    full = OutputStore(ss.num, triangular=False, spill=False)
    eng.align_all(ss, full, progress=False)

    # Run both "hosts" sequentially, recording each flush's triplets; the
    # fake merger then hands both hosts the union, mimicking allgather.
    recorded = {}

    class RecordingMerger:
        def __init__(self, h):
            self.h = h

        def __call__(self, i, j, s):
            recorded.setdefault(self.h, []).append((i, j, s))
            return i, j, s

    stores = []
    for h in range(2):
        st = OutputStore(ss.num, triangular=False, spill=False)
        eng.align_all(ss, st, progress=False, partition=(h, 2),
                      merger=RecordingMerger(h))
        stores.append(st)
    # exchange: apply host 1's triplets to host 0's store and vice versa
    for h, st in enumerate(stores):
        for i, j, s in recorded[1 - h]:
            if len(s):
                st.fill_pairs(i, j, s)
        np.testing.assert_array_equal(_matrix(st), _matrix(full))


def test_two_process_distributed_merge(tmp_path):
    """Real jax.distributed run: two processes, striped blocks, gloo
    allgather merge — both hosts' stores must converge to the same full
    matrix."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(textwrap.dedent(f"""
        import os, sys
        proc_id = int(sys.argv[1])
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                                   num_processes=2, process_id=proc_id,
                                   local_device_ids=[proc_id])
        import numpy as np
        from sequencealigner_tpu import matrices
        from sequencealigner_tpu.engine import Engine
        from sequencealigner_tpu.io.input import SequenceSet
        from sequencealigner_tpu.io.output import OutputStore
        from sequencealigner_tpu.parallel import multihost

        m = matrices.get("blosum62")
        rng = np.random.default_rng(1)
        seqs = [rng.choice(np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8),
                           int(rng.integers(4, 30))) for _ in range(20)]
        ss = SequenceSet.from_list(seqs, m.lut)
        store = OutputStore(ss.num, triangular=False, spill=False)
        eng = Engine("ga", m.matrix, (0, -10, -1), target_cells=1 << 12)
        eng.align_all(ss, store, progress=False, partition=(proc_id, 2),
                      merger=multihost.TripletMerger(2))
        np.save(r"{tmp_path}" + f"/mh_{{proc_id}}.npy",
                np.asarray(store.matrix).reshape(ss.num, ss.num))
    """))
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO_ROOT)  # worker scripts live in tmp; the package does not
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i)],
                         cwd=str(REPO_ROOT), env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode()[-2000:]
    a = np.load(tmp_path / "mh_0.npy")
    b = np.load(tmp_path / "mh_1.npy")
    np.testing.assert_array_equal(a, b)
    assert (a != 0).any() and (a == a.T).all()


def test_resumed_blocks_recontributed_to_merger(tmp_path):
    """Multi-host resume: blocks skipped via the journal must still flow
    through the merger (read back from the persistent store), so peer hosts
    that crashed before filling converge too."""
    from sequencealigner_tpu import checkpoint as ckpt

    rng = np.random.default_rng(13)
    ss = _random_set(rng, 20)
    gaps = (0, -10, -1)
    eng = Engine("ga", M.matrix, gaps, device_kind="cpu", target_cells=1 << 12)

    full = OutputStore(ss.num, triangular=False, spill=False)
    eng.align_all(ss, full, progress=False)
    want = _matrix(full)

    header = ckpt.config_fingerprint(
        algo="ga", gaps=gaps, matrix="blosum62", num_seqs=ss.num,
        lengths=ss.lengths, triangular=False,
    )
    spath = tmp_path / "h0.scores"
    jpath = tmp_path / "h0.ckpt"

    received = []

    class Rec:
        def __call__(self, i, j, s):
            received.append((i.copy(), j.copy(), s.copy()))
            return i, j, s

    st = OutputStore(ss.num, triangular=False, spill=False, persist_path=spath)
    j0 = ckpt.Journal(jpath, header)
    eng.align_all(ss, st, progress=False, partition=(0, 2), merger=Rec(),
                  journal=j0)
    j0.close()
    first_pairs = sum(len(s) for _, _, s in received)
    assert first_pairs > 0
    received.clear()

    # Resume: every host-0 block is journaled; the merger must still see all
    # of host 0's pairs with the stored scores.
    st2 = OutputStore(ss.num, triangular=False, spill=False, persist_path=spath)
    j1 = ckpt.Journal(jpath, header)
    stats = eng.align_all(ss, st2, progress=False, partition=(0, 2),
                          merger=Rec(), journal=j1)
    j1.close()
    assert stats.pairs == 0 and stats.pairs_resumed > 0
    got_pairs = sum(len(s) for _, _, s in received)
    assert got_pairs == first_pairs
    for i, j, s in received:
        np.testing.assert_array_equal(s, want[i, j])
