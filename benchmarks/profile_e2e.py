import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
"""E2E breakdown: where does align_all wall time go?"""
import time
import numpy as np
import jax, jax.numpy as jnp

from sequencealigner_tpu import matrices
from sequencealigner_tpu.engine import Engine, _score_stack, FLUSH_PAIRS
from sequencealigner_tpu.io.input import SequenceSet
from sequencealigner_tpu.scheduler import Schedule

rng = np.random.default_rng(20260816)
m = matrices.get("blosum62")
seqs = [rng.choice(np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8),
                   int(rng.integers(24, 65))) for _ in range(1024)]
ss = SequenceSet.from_list(seqs, m.lut)
eng = Engine("ga", m.matrix, (0, -10, -1))
eng.align_all(ss, None, progress=False)  # warm
print("use_pallas:", eng.use_pallas)

sched = Schedule.build(ss.lengths)
for trial in range(2):
    t0 = time.perf_counter()
    buckets_dev = eng._bucket_arrays(ss, sched)
    sub_dev = eng._put_rep(eng.sub_p)
    gaps_dev = eng._put_rep(eng.gaps)
    t_prep = time.perf_counter() - t0

    t_put = t_disp = 0.0
    devs = []
    total_cells = 0
    for a, b in sched.combos():
        npairs = sched.combo_pair_count(a, b)
        if npairs == 0: continue
        Lk = sched.buckets[a].edge; Lc = sched.buckets[b].edge
        width, B = eng._superblock_width(Lc, Lk, npairs)
        blks = list(sched.blocks(a, b, width=width))
        total_cells += sum(x.cells for x in blks)
        off = 0
        while off < len(blks):
            seg = 1 << (len(blks) - off).bit_length() - 1
            part = blks[off:off+seg]; off += seg
            t1 = time.perf_counter()
            put2 = lambda x: jax.device_put(np.stack(x), eng._shard2)
            rc = put2([x.rows_c for x in part]); rk = put2([x.rows_k for x in part])
            l1 = put2([x.l1 for x in part]); l2 = put2([x.l2 for x in part])
            t2 = time.perf_counter(); t_put += t2 - t1
            dev = _score_stack(buckets_dev[b], buckets_dev[a], rc, rk, l1, l2,
                               sub_dev, gaps_dev, algo="ga", Lc=Lc, Lk=Lk, B=B,
                               use_pallas=eng.use_pallas)
            devs.append(dev.reshape(-1))
            t_disp += time.perf_counter() - t2
    t3 = time.perf_counter()
    combined = np.asarray(jnp.concatenate(devs))
    t_fetch = time.perf_counter() - t3
    total = time.perf_counter() - t0
    print(f"trial{trial}: prep={t_prep*1e3:.0f}ms put={t_put*1e3:.0f}ms "
          f"dispatch={t_disp*1e3:.0f}ms fetch+compute={t_fetch*1e3:.0f}ms "
          f"total={total*1e3:.0f}ms  ndisp={len(devs)} gcups={total_cells/total/1e9:.2f}")
