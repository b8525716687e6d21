"""End-to-end align_all wall-time breakdown on the bench workload.

Run on the real TPU (no JAX_PLATFORMS=cpu).  Times the prep (bucket packing +
upload) separately from the dispatch+compute+fetch of a full align_all, and
reports effective GCUPS.  See memory note: np.asarray is what forces
completion over the axon tunnel; run twice — the first pass includes compile.
"""

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from sequencealigner_tpu import matrices
from sequencealigner_tpu.engine import Engine
from sequencealigner_tpu.io.input import SequenceSet
from sequencealigner_tpu.scheduler import Schedule

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
LO, HI = 24, 64

rng = np.random.default_rng(20260816)
m = matrices.get("blosum62")
seqs = [rng.choice(np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8),
                   int(rng.integers(LO, HI + 1))) for _ in range(N)]
ss = SequenceSet.from_list(seqs, m.lut)
eng = Engine("ga", m.matrix, (0, -10, -1))
print("use_pallas:", eng.use_pallas, "ndev:", eng.ndev)

sched = Schedule.build(ss.lengths)
print("buckets:", [(b.edge, b.count) for b in sched.buckets])

t0 = time.perf_counter()
eng._bucket_arrays(ss, sched)
print(f"bucket prep+upload: {(time.perf_counter() - t0) * 1e3:.0f} ms")

for trial in range(3):
    t0 = time.perf_counter()
    stats = eng.align_all(ss, None, progress=False)
    dt = time.perf_counter() - t0
    print(f"trial{trial}: {dt * 1e3:.0f} ms  {stats.cells / dt / 1e9:.2f} GCUPS  "
          f"{stats.pairs / dt / 1e3:.0f}k pairs/s")
