"""Native C parsers vs the pure-Python reference parsers: identical outputs
and identical error messages on the same inputs."""

import numpy as np
import pytest

from sequencealigner_tpu import matrices
from sequencealigner_tpu.io import dsv, fasta, native
from sequencealigner_tpu.io.input import ParseError

LUT = matrices.get("blosum62").lut

pytestmark = pytest.mark.skipif(
    native.get() is None, reason="native parser library unavailable"
)


def py_fasta(data):
    import importlib

    # call the pure-python path by bypassing the native hook
    from sequencealigner_tpu.io import input as sio

    seqs = []
    # reuse internals: temporarily disable native
    lib = native._lib
    native._lib = None
    try:
        seqs = fasta.parse(data, "fasta", LUT)
    finally:
        native._lib = lib
    return seqs


def nat_fasta(data):
    out = native.fasta(data, LUT, 0)
    assert out is not None
    return out


def as_strs(seqs):
    return [bytes(s.tolist()).decode() for s in seqs]


class TestFastaParity:
    CASES = [
        b">a\nARND\n>b\nCQEG\nHILK\n",
        b">x\narn d\r\nc\n",
        b">a>b\nAC\n",
        b">a\nAC>b\nGT\n",
        b">one\n" + b"ACDEFGHIKLMNPQRSTVWY" * 50 + b"\n>two\nW\n",
    ]

    @pytest.mark.parametrize("data", CASES)
    def test_outputs_match(self, data):
        assert as_strs(nat_fasta(data)) == as_strs(py_fasta(data))

    ERRS = [
        b"AC\n>x\nAC\n",
        b">a\nAC\n>b\n",
        b">a\n   \n>b\nAC\n",
        b">a\nAC\n>b\nAO\n",
        b">a\nA\xffC\n",
    ]

    @pytest.mark.parametrize("data", ERRS)
    def test_errors_match(self, data):
        with pytest.raises(ParseError) as e_nat:
            nat_fasta(data)
        with pytest.raises(ParseError) as e_py:
            py_fasta(data)
        assert str(e_nat.value) == str(e_py.value)

    def test_fuzz_random_valid(self):
        rng = np.random.default_rng(0)
        aas = list("ARNDCQEGHILKMFPSTWYVarndcq")
        recs = []
        for i in range(200):
            body = "".join(rng.choice(aas, rng.integers(1, 80)))
            recs.append(f">s{i} desc\n{body}\n")
        data = "".join(recs).encode()
        assert as_strs(nat_fasta(data)) == as_strs(py_fasta(data))


class TestDsvParity:
    def _both(self, data, ext="csv"):
        lib = native._lib
        native._lib = None
        try:
            py = dsv.parse(data, ext, LUT)
        finally:
            native._lib = lib
        nat = dsv.parse(data, ext, LUT)
        return as_strs(py), as_strs(nat)

    def test_basic(self):
        py, nat = self._both(b"id,seq\n1,ARND\n2,CQEG\n")
        assert py == nat == ["ARND", "CQEG"]

    def test_seq_col_positions(self):
        for data in (b"seq,x,y\nARND,1,2\n", b"x,seq,y\n1,ARND,2\n", b"x,y,seq\n1,2,ARND\n"):
            py, nat = self._both(data)
            assert py == nat == ["ARND"]

    def test_tsv(self):
        py, nat = self._both(b"a\tseq\n1\tARND\n", "tsv")
        assert py == nat == ["ARND"]

    @pytest.mark.parametrize(
        "data",
        [
            b"id,seq\n1,ARND\n2,CQEG,zz\n",  # too many
            b"id,seq,extra\n1,ARND\n",  # too few
            b"id,x,seq\n1\n",  # no sequence column
            b"id,seq\n1,\n",  # empty
            b"id,seq\n1,AO\n",  # invalid char
        ],
    )
    def test_errors_match(self, data):
        lib = native._lib
        native._lib = None
        try:
            with pytest.raises(ParseError) as e_py:
                dsv.parse(data, "csv", LUT)
        finally:
            native._lib = lib
        with pytest.raises(ParseError) as e_nat:
            dsv.parse(data, "csv", LUT)
        assert str(e_py.value) == str(e_nat.value)

    def test_fuzz_random_valid(self):
        rng = np.random.default_rng(1)
        aas = list("ARNDCQEGHILKMFPSTWYV")
        rows = ["id,sequence,extra"]
        for i in range(300):
            body = "".join(rng.choice(aas, rng.integers(1, 60)))
            rows.append(f"{i},{body},x{i}")
        data = ("\n".join(rows) + "\n").encode()
        py, nat = self._both(data)
        assert py == nat and len(py) == 300
