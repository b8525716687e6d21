"""Kernel-rate harness: S-differenced timings of align_superblock on real
TPU (see memory: block_until_ready is a no-op over the tunnel; np.asarray
forces completion).  Usage:
  python benchmarks/profile_kernels.py ga,64,64,128,256,1024,check ...
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
import numpy as np
import jax

from sequencealigner_tpu import matrices
from sequencealigner_tpu.ops import pallas_dp
from sequencealigner_tpu.ops.xla_dp import padded_submatrix, align_block

m = matrices.get("blosum62")
sub_p = padded_submatrix(m.matrix)
gaps = np.array([0, -10, -1], np.int32)
rng = np.random.default_rng(0)

def data(Lc, Lk, n, maxlen=True):
    s1 = rng.integers(0, 20, (n, Lc)).astype(np.int32)
    s2 = rng.integers(0, 20, (n, Lk)).astype(np.int32)
    l1 = np.full(n, Lc, np.int32); l2 = np.full(n, Lk, np.int32)
    return [jax.device_put(x) for x in (s1, s2, l1, l2, sub_p, gaps)]

def rate(algo, Lc, Lk, B, S_lo, S_hi, check=False, banded=False):
    d_lo = data(Lc, Lk, S_lo * B); d_hi = data(Lc, Lk, S_hi * B)
    fn = (pallas_dp.align_superblock_banded
          if banded and pallas_dp.use_banded(Lk) else pallas_dp.align_superblock)
    f = lambda d: fn(*d, algo=algo, Lc=Lc, Lk=Lk, B=B)
    r = np.asarray(f(d_lo))
    if check:
        ref = np.asarray(align_block(*d_lo, algo=algo, Lc=Lc, Lk=Lk))
        print("  check:", "OK" if np.array_equal(r, ref) else "MISMATCH!!")
    np.asarray(f(d_hi))
    tl, th = [], []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(d_lo)); tl.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); np.asarray(f(d_hi)); th.append(time.perf_counter()-t0)
    dt = min(th) - min(tl)
    nsb = S_hi - S_lo
    Kpad = pallas_dp.round_up(Lk + 1, 32)
    D = Lc + Lk
    CD = pallas_dp.pick_CD(D, Kpad, B)
    Dpad = pallas_dp.round_up(D, CD)
    padded = nsb * B * Kpad * Dpad
    true = nsb * B * Lc * Lk
    print(f"{algo} Lc={Lc} Lk={Lk} B={B}: {dt/nsb*1e6:.0f} us/sblk  "
          f"padded={padded/dt/1e9:.1f} Gcell/s  true={true/dt/1e9:.1f} GCUPS (CD={CD})")

for arg in sys.argv[1:]:
    algo, Lc, Lk, B, slo, shi, *opts = arg.split(",")
    rate(algo, int(Lc), int(Lk), int(B), int(slo), int(shi),
         check="check" in opts, banded="banded" in opts)
