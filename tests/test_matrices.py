import numpy as np
import pytest

from sequencealigner_tpu import matrices


def test_counts_and_names():
    names = matrices.names()
    assert len(names) == 67
    assert matrices.amino_count() == 65
    assert "blosum62" in names and "pam250" in names
    assert names[-2:] == ["dnafull", "nuc44"]


def test_blosum62_known_values():
    m = matrices.get("blosum62")
    lut = m.lut
    # Canonical BLOSUM62 entries.
    a, r, w = lut[ord("A")], lut[ord("R")], lut[ord("W")]
    assert m.matrix[a, a] == 4
    assert m.matrix[a, r] == -1
    assert m.matrix[w, w] == 11
    assert m.alphabet == "ARNDCQEGHILKMFPSTWYVBZX*"


def test_case_insensitive_lookup():
    assert matrices.get("BLOSUM62").name == "blosum62"
    assert matrices.get("PaM100").name == "pam100"
    with pytest.raises(KeyError):
        matrices.get("nosuchmatrix")


def test_nucleotide_matrix_uses_nucleo_lut():
    m = matrices.get("nuc44")
    assert not m.is_amino
    assert m.lut[ord("A")] == 0 and m.lut[ord("T")] == 1
    assert m.lut[ord("E")] == -1  # not a nucleotide code
    assert m.alphabet == "ATGCSWRYKMBVHDN*"
    # frame is 24x24 with 16x16 data top-left (reference fixed-stride storage)
    assert m.matrix.shape == (24, 24)
    assert np.all(m.matrix[16:, :] == 0) and np.all(m.matrix[:, 16:] == 0)


def test_matrices_symmetric():
    for name in ("blosum62", "pam250", "nuc44", "dnafull"):
        m = matrices.get(name).matrix
        assert np.array_equal(m, m.T), name


def test_grouped_listing():
    text = matrices.grouped_listing()
    assert "Amino Matrices (65):" in text
    assert "Nucleotide Matrices (2):" in text
    assert "blosum62" in text
