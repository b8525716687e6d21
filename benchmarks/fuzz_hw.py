"""Hardware fuzz: the Pallas kernel on the REAL TPU vs the XLA reference
computed on the CPU backend, over random shapes/matrices/gap configs.

The reference runs on CPU deliberately: the pure-XLA lax.scan path
(ops/xla_dp.align_block) CRASHES the TPU runtime at some shapes (first seen
at Lc=256..264 x Lk=154, "TPU worker process crashed"; reproduced with the
XLA path ALONE, while the Pallas kernel runs those shapes bit-exactly).
The engine never runs align_block on TPU for Pallas-supported shapes.

Usage: SEED=11 TRIALS=8 python benchmarks/fuzz_hw.py
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
import numpy as np, jax
from sequencealigner_tpu import matrices
from sequencealigner_tpu.ops.pallas_dp import align_superblock
from sequencealigner_tpu.ops.xla_dp import PAD, padded_submatrix, align_block

cpu = jax.devices("cpu")[0]
mats = ["blosum62", "pam250", "blosum30", "nuc44"]
rng = np.random.default_rng(int(os.environ.get("SEED", 0)))
trials = int(os.environ.get("TRIALS", 8))
for t in range(trials):
    mname = mats[rng.integers(0, len(mats))]
    M = matrices.get(mname)
    SUB_P = padded_submatrix(M.matrix)
    nlet = 16 if mname == "nuc44" else 20
    algo = ["nw", "ga", "sw"][rng.integers(0, 3)]
    if algo == "nw":
        gaps = (-int(rng.integers(1, 13)), 0, 0)
    else:
        gaps = (0, -int(rng.integers(1, 15)), -int(rng.integers(1, 15)))
    Lc = int(rng.integers(2, 520)); Lk = int(rng.integers(1, Lc + 1))
    n = 256
    l1 = rng.integers(1, Lc + 1, n).astype(np.int32)
    l2 = rng.integers(1, Lk + 1, n).astype(np.int32)
    s1 = np.full((n, Lc), PAD, np.int32); s2 = np.full((n, Lk), PAD, np.int32)
    for b in range(n):
        s1[b, :l1[b]] = rng.integers(0, nlet, l1[b])
        s2[b, :l2[b]] = rng.integers(0, nlet, l2[b])
    gg = np.array(gaps, np.int32)
    got = np.asarray(align_superblock(s1, s2, l1, l2, SUB_P, gg,
        algo=algo, Lc=Lc, Lk=Lk, B=128))
    # reference on the CPU backend: jit the XLA scan path on CPU
    with jax.default_device(cpu):
        want = np.asarray(align_block(
            jax.device_put(s1, cpu), jax.device_put(s2, cpu),
            jax.device_put(l1, cpu), jax.device_put(l2, cpu),
            jax.device_put(SUB_P, cpu), jax.device_put(gg, cpu),
            algo=algo, Lc=Lc, Lk=Lk))
    ok = np.array_equal(got, want)
    print(f"[{t}] {algo} {mname} gaps={gaps} Lc={Lc} Lk={Lk}: {'OK' if ok else 'MISMATCH!!'}", flush=True)
    assert ok
print("HW FUZZ PASS", flush=True)
