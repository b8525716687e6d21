"""Kernel-rate harness: DEVICE-TRACE timings of align_superblock on real TPU.

Host-side wall clocks through the axon tunnel are unreliable (RTT floor
~25 ms, pipelining hides device time), so rates are read from the
jax.profiler device trace: the per-call duration of the jitted computation
and of the Pallas kernel event inside it.

Usage:
  python benchmarks/profile_kernels.py ga,64,64,128,8,check nw,256,256,128,16 ...
arg = algo,Lc,Lk,B,S[,check]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import collections
import glob
import gzip
import json
import tempfile

import numpy as np
import jax

from sequencealigner_tpu import matrices
from sequencealigner_tpu.ops import pallas_dp
from sequencealigner_tpu.ops.xla_dp import padded_submatrix, align_block

m = matrices.get("blosum62")
sub_p = padded_submatrix(m.matrix)
gaps = np.array([0, -10, -1], np.int32)
rng = np.random.default_rng(0)
pick = jax.jit(lambda x: x.reshape(-1)[:8])


def device_times(tracedir):
    """{event name: (total_us, count)} for TPU-side events."""
    path = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    evs = d["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    for e in evs:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return agg, cnt


def rate(algo, Lc, Lk, B, S, check=False, reps=4, inline=False):
    n = S * B
    s1 = rng.integers(0, 20, (n, Lc)).astype(np.int32)
    s2 = rng.integers(0, 20, (n, Lk)).astype(np.int32)
    l1 = np.full(n, Lc, np.int32)
    l2 = np.full(n, Lk, np.int32)
    d = [jax.device_put(x) for x in (s1, s2, l1, l2, sub_p, gaps)]
    f = lambda: pallas_dp.align_superblock(
        *d, algo=algo, Lc=Lc, Lk=Lk, B=B, inline=inline)
    r = np.asarray(f())
    if check:
        ref = np.asarray(align_block(*d, algo=algo, Lc=Lc, Lk=Lk))
        print("  check:", "OK" if np.array_equal(r, ref) else "MISMATCH!!")
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                np.asarray(pick(f()))
        agg, cnt = device_times(td)
    total = sum(v for k, v in agg.items() if k.startswith("jit_align_superblock"))
    kern = sum(v for k, v in agg.items()
               if k.startswith("align_superblock") and not k.startswith("jit"))
    per, perk = total / reps / 1e6, kern / reps / 1e6
    nb, Kpad, CD, W = pallas_dp.geometry(Lc, Lk, B)
    true = n * Lc * Lk
    padded = n * Kpad * W
    tag = " inline" if inline else ""
    print(f"{algo}{tag} Lc={Lc} Lk={Lk} B={B} S={S}: device {per*1e3:.2f} "
          f"ms/call (kernel {perk*1e3:.2f}) -> true={true/per/1e9:.1f} GCUPS  "
          f"padded-kernel={padded/perk/1e9:.0f} Gcell/s  (CD={CD}, nb={nb})")


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        algo, Lc, Lk, B, S, *opts = arg.split(",")
        rate(algo, int(Lc), int(Lk), int(B), int(S), check="check" in opts,
             inline="inline" in opts)
