#!/usr/bin/env python3
"""Regenerate the packaged substitution-matrix dataset.

The reference tool generates its matrices at build time from the ``parasail``
Python package (see /root/reference/script/generate_matrices.py), so its
scores are Parasail's matrices bit-for-bit.  We need the identical dataset for
score parity.  Preferred source is parasail itself; when parasail is not
installed we recover the same numeric data from the reference's generated
header (``src/generated/matrices.h``), which is machine-generated scientific
data (BLOSUM/PAM/EDNAFULL integer tables), not source code.

Output: ``sequencealigner_tpu/_matrix_data.npz`` with
  - names:     (M,) array of matrix names (sorted like the reference: amino
               matrices first, then nucleotide)
  - matrices:  (M, 24, 24) int32 score frames (nucleotide 16x16 data lives in
               the top-left of a zero 24x24 frame, matching the reference's
               fixed-stride storage, matrices.h frame layout)
  - luts:      (2, 128) int32 char->index lookup tables (0=amino, 1=nucleo)
  - amino_n:   scalar, number of amino matrices (the first amino_n entries of
               ``names`` use lut 0, the rest lut 1)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
OUT = ROOT / "sequencealigner_tpu" / "_matrix_data.npz"

AMINO_ALPHABET = "ARNDCQEGHILKMFPSTWYVBZX*"
NUCLEO_ALPHABET = "ATGCSWRYKMBVHDN*"
DIM = 24  # SUB_MAT_DIM in the reference (src/bio/align.h:14)


def build_luts() -> np.ndarray:
    luts = np.full((2, 128), -1, dtype=np.int32)
    for which, alphabet in enumerate((AMINO_ALPHABET, NUCLEO_ALPHABET)):
        for index, letter in enumerate(alphabet):
            luts[which, ord(letter)] = index
    return luts


def from_parasail():
    import parasail

    amino, nucleo = [], []
    for name in sorted(a for a in dir(parasail) if not a.startswith("__")):
        if name.startswith(("blosum", "pam")):
            bucket, alphabet = amino, AMINO_ALPHABET
        elif name.startswith(("dna", "nuc")):
            bucket, alphabet = nucleo, NUCLEO_ALPHABET
        else:
            continue
        raw = getattr(getattr(parasail, name), "matrix", None)
        if raw is None:
            continue
        size = len(alphabet)
        frame = np.zeros((DIM, DIM), dtype=np.int32)
        for i in range(size):
            for j in range(size):
                frame[i, j] = int(raw[i][j])
        bucket.append((name, frame))
    return amino, nucleo


def from_reference_header():
    """Recover the numeric tables from the reference's generated data header."""
    hdr = Path("/root/reference/src/generated/matrices.h").read_text()

    amino_n = int(re.search(r"AMINO_MAT_N = (\d+)", hdr).group(1))
    nucleo_n = int(re.search(r"NUCLEO_MAT_N = (\d+)", hdr).group(1))
    names = re.findall(r'"([a-z0-9]+)"', re.search(r"NAMES\[[^]]*\] = \{(.*?)\};", hdr).group(1))
    assert len(names) == amino_n + nucleo_n

    body = re.search(r"MATRICES\[[^]]*\] = \{(.*?)\};", hdr, re.S).group(1)
    total = DIM * DIM * (amino_n + nucleo_n)
    flat = np.zeros(total, dtype=np.int64)
    pos = 0
    for tok in body.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "=" in tok:  # designated initializer "[idx]=val"
            idx, val = tok.split("=")
            pos = int(idx.strip("[] "))
            flat[pos] = int(val)
        else:
            flat[pos] = int(tok)
        pos += 1
    frames = flat.reshape(amino_n + nucleo_n, DIM, DIM).astype(np.int32)

    amino = [(names[i], frames[i]) for i in range(amino_n)]
    nucleo = [(names[amino_n + i], frames[amino_n + i]) for i in range(nucleo_n)]
    return amino, nucleo


def main() -> None:
    try:
        amino, nucleo = from_parasail()
        src = "parasail"
    except ImportError:
        amino, nucleo = from_reference_header()
        src = "reference generated data header"

    names = [n for n, _ in amino] + [n for n, _ in nucleo]
    matrices = np.stack([m for _, m in amino] + [m for _, m in nucleo])
    np.savez_compressed(
        OUT,
        names=np.array(names),
        matrices=matrices,
        luts=build_luts(),
        amino_n=np.int32(len(amino)),
    )
    print(f"Wrote {OUT} ({len(amino)} amino + {len(nucleo)} nucleotide matrices, from {src})")


if __name__ == "__main__":
    sys.exit(main())
