"""E2E device-trace decomposition of the OUTER-tile engine path.

Runs a BASELINE config workload through Engine.align_all under
jax.profiler and aggregates TPU-side trace events, so the wall time
splits into kernel / infeed / outfeed / gaps.  Companion to
profile_kernels.py (which traces the per-pair align_superblock mode).

Usage: python benchmarks/profile_outer.py [n] [algo] [reps]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import collections
import glob
import gzip
import json
import tempfile
import time
import zlib

import numpy as np
import jax

from sequencealigner_tpu import matrices, ui
from sequencealigner_tpu.engine import Engine
from benchmarks.run_configs import make_set, PROTEIN


def device_times(tracedir):
    path = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    evs = d["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    spans = collections.defaultdict(list)
    for e in evs:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            spans[e["name"]].append((e["ts"], e["ts"] + e["dur"]))
    return agg, cnt, spans


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    algo = sys.argv[2] if len(sys.argv) > 2 else "ga"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    ui.configure(quiet=True)
    m = matrices.get("pam250" if algo == "ga" else "blosum62")
    rng = np.random.default_rng(zlib.crc32(b"3_ga_pam250"))
    ss = make_set(rng, n, 24, 64, PROTEIN, m.lut)
    gaps = (-4, 0, 0) if algo == "nw" else (0, -10, -1)
    eng = Engine(algo, m.matrix, gaps)
    stats = eng.align_all(ss, None, progress=False)  # warm
    walls = []
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                t0 = time.perf_counter()
                stats = eng.align_all(ss, None, progress=False)
                walls.append(time.perf_counter() - t0)
        agg, cnt, spans = device_times(td)
    wall = min(walls)
    print(f"n={n} algo={algo} pairs={stats.pairs} cells={stats.cells}")
    print(f"wall best={wall*1e3:.1f} ms  all={[round(w*1e3,1) for w in walls]}")
    print(f"e2e GCUPS best={stats.cells/wall/1e9:.2f}")
    # busy time: union of all device event spans
    allspans = sorted(s for v in spans.values() for s in v)
    busy, end = 0.0, -1.0
    for a, b in allspans:
        if a > end:
            busy += b - a
            end = b
        elif b > end:
            busy += b - end
            end = b
    print(f"device busy total={busy/1e3/reps:.1f} ms/run (union of events)")
    for k in sorted(agg, key=agg.get, reverse=True)[:12]:
        print(f"  {agg[k]/1e3/reps:8.2f} ms/run  x{cnt[k]//reps:<4d} {k}")


if __name__ == "__main__":
    main()
