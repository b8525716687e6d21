#!/usr/bin/env python3
"""Measure the ACTUAL reference binary on the BASELINE configs.

Builds jakovdev/SequenceAligner via scripts/build_reference.sh (gcc-12 C23
shims + the capturing HDF5 stub), writes the exact datasets that
benchmarks/run_configs.py uses (same seeds) to FASTA/CSV, runs
`seqalign_ref -B` per config, and prints one JSON line per config with the
align-phase seconds and the derived GCUPS.

The reference's CPU path is OpenMP over pairs (/root/reference/src/bio/
align.c:32-66); on this 1-core host OMP_NUM_THREADS=1, so the printed
`gcups` is per-core. `gcups_x8`/`x16` columns give the linear-scaling
extrapolation to a typical multicore desktop (the reference's own
deployment target) — an upper bound, since it ignores memory-bandwidth
contention.

Usage: python benchmarks/reference_baseline.py [--scale 1.0] [--configs 1,2,3,4]
"""

import argparse
import json
import re
import subprocess
import sys
import tempfile
import zlib
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PROTEIN = b"ARNDCQEGHILKMFPSTWYV"
DNA = b"ATGC"


def ensure_binary() -> Path:
    exe = Path("/tmp/refbuild/seqalign_ref")
    if not exe.exists():
        subprocess.run([str(REPO / "scripts" / "build_reference.sh")], check=True)
    return exe


def make_seqs(name, n, lo, hi, alphabet):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    return [
        rng.choice(np.frombuffer(alphabet, np.uint8),
                   int(rng.integers(lo, hi + 1)))
        for _ in range(n)
    ]


def write_fasta(path, seqs):
    with open(path, "wb") as f:
        for k, s in enumerate(seqs):
            f.write(b">s%d\n%s\n" % (k, bytes(s)))


def write_csv(path, seqs):
    with open(path, "wb") as f:
        f.write(b"id,sequence\n")
        for k, s in enumerate(seqs):
            f.write(b"%d,%s\n" % (k, bytes(s)))


def run_ref(exe, inp, algo, matrix, gaps, filt):
    # -W (no write) is always passed: only -B timings matter here, so there
    # is no output path to forward.
    cmd = [str(exe), "-i", str(inp), "-m", matrix, "-a", algo, "-F", "-B",
           "-W", "-P"]
    if gaps[0]:
        cmd += ["-p", str(-gaps[0])]
    else:
        cmd += ["-s", str(-gaps[1]), "-e", str(-gaps[2])]
    if filt:
        cmd += ["-f", str(filt)]
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    txt = r.stdout
    align_s = float(re.search(r"Alignment: ([0-9.]+) sec", txt).group(1))
    pairs = int(re.search(r"Performing (\d+) pairwise alignments", txt).group(1))
    filt_m = re.search(r"Filtering: ([0-9.]+) sec", txt)
    return align_s, pairs, (float(filt_m.group(1)) if filt_m else 0.0)


def cells_of(seqs, pairs, filt_threshold):
    """Sum of l1*l2 over the aligned pair space."""
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    if filt_threshold:
        # reproduce the reference's single-thread greedy keep-first filter
        # (our framework's deterministic spec matches it; see filter.py)
        from sequencealigner_tpu import matrices, filter as filt
        from sequencealigner_tpu.io.input import SequenceSet
        m = matrices.get("blosum62")
        ss = SequenceSet.from_list(seqs, m.lut)
        kept, _ = filt.filter_sequences(ss, filt_threshold, progress=False)
        lens = np.asarray(kept.lengths, dtype=np.int64)
        assert kept.num * (kept.num - 1) // 2 == pairs, \
            f"filter mismatch: ours {kept.num} vs reference pair count {pairs}"
    tot = int(lens.sum())
    sq = int((lens * lens).sum())
    return (tot * tot - sq) // 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    want = {int(x) for x in args.configs.split(",")}
    s = args.scale
    exe = ensure_binary()

    cfgs = []
    if 1 in want:
        cfgs.append(("1_nw_protein_short", "nw", "blosum62", int(1024 * s),
                     24, 64, PROTEIN, (-4, 0, 0), 0.0))
    if 2 in want:
        cfgs.append(("2_sw_protein_filtered", "sw", "blosum62", int(1024 * s),
                     24, 64, PROTEIN, (0, -10, -1), 0.9))
    if 3 in want:
        cfgs.append(("3_ga_pam250", "ga", "pam250", int(1024 * s),
                     24, 64, PROTEIN, (0, -10, -1), 0.0))
    if 4 in want:
        cfgs.append(("4_dna_mixed", "ga", "nuc44", int(4096 * s),
                     64, 1024, DNA, (0, -10, -1), 0.0))

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        for name, algo, matrix, n, lo, hi, alphabet, gaps, filt in cfgs:
            seqs = make_seqs(name, n, lo, hi, alphabet)
            inp = td / (name + (".csv" if alphabet is DNA else ".fasta"))
            (write_csv if alphabet is DNA else write_fasta)(inp, seqs)
            best, pairs, filt_s = None, 0, 0.0
            for _ in range(args.repeat):
                a_s, pairs, filt_s = run_ref(exe, inp, algo, matrix, gaps,
                                             filt)
                best = a_s if best is None or a_s < best else best
            cells = cells_of(seqs, pairs, filt)
            print(json.dumps({
                "config": name, "algo": algo, "n": n, "pairs": pairs,
                "align_seconds": best, "filter_seconds": filt_s,
                "gcups_1core": round(cells / best / 1e9, 3),
                "gcups_x8": round(8 * cells / best / 1e9, 2),
                "gcups_x16": round(16 * cells / best / 1e9, 2),
                "pairs_per_sec": round(pairs / best),
            }), flush=True)


if __name__ == "__main__":
    main()
