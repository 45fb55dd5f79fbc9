"""Serialization parity: byte-identical conversion and round-trips.

The reference's `.matok` content is a deterministic function of the
FST, so converting a committed `.fst` must reproduce the committed
`.matok` byte for byte (gzip layer excluded).  `.datok` layout depends
on Go map iteration order, so only load→save round-trips are byte
checked there; constructed double arrays are checked behaviorally.
"""

import gzip

import pytest

import datok_tpu as dt

REF = "/root/reference/testdata"


@pytest.mark.parametrize(
    "name", ["simpletok", "tokenizer_de", "tokenizer_en", "clitic_test"]
)
def test_convert_matrix_byte_parity(name):
    auto = dt.load_foma_file(f"{REF}/{name}.fst")
    mat = dt.MatrixTokenizer.from_automaton(auto)
    ref = gzip.open(f"{REF}/{name}.matok", "rb").read()
    assert mat.to_bytes() == ref


@pytest.mark.parametrize("name", ["simpletok", "tokenizer_de", "tokenizer_en"])
def test_matok_roundtrip(name):
    raw = gzip.open(f"{REF}/{name}.matok", "rb").read()
    mat = dt.parse_matrix(raw)
    assert mat.to_bytes() == raw


@pytest.mark.parametrize("name", ["simpletok", "tokenizer_de"])
def test_datok_roundtrip(name):
    raw = gzip.open(f"{REF}/{name}.datok", "rb").read()
    da = dt.parse_datok(raw)
    assert da.to_bytes() == raw


def test_matok_header_fields(mat_de):
    # Verified against the reference model (BASELINE.md)
    assert mat_de.state_count == 18400
    assert mat_de.epsilon == 1
    assert mat_de.unknown == 2
    assert mat_de.identity == 3
    assert len(mat_de.array) == (18400 + 1) * 171


def test_datok_stats(dat_de):
    # LoadFactor >= 60% asserted by the reference (datok_test.go:239)
    assert dat_de.load_factor() >= 60
    assert dat_de.get_size() == 2887688


def test_constructed_da_load_factor():
    # > 88 on the Kanda-style bench FST (datok_test.go:1238-1243)
    auto = dt.load_foma_file(f"{REF}/abbr_bench.fst")
    da = dt.DaTokenizer.from_automaton(auto)
    assert da.load_factor() > 88


def test_load_tokenizer_file_dispatch():
    mat = dt.load_tokenizer_file(f"{REF}/tokenizer_de.matok")
    assert mat.type() == "MATOK"
    da = dt.load_tokenizer_file(f"{REF}/simpletok.datok")
    assert da.type() == "DATOK"


def test_constructed_da_roundtrip():
    auto = dt.load_foma_file(f"{REF}/simpletok.fst")
    da = dt.DaTokenizer.from_automaton(auto)
    raw = da.to_bytes()
    assert dt.parse_datok(raw).to_bytes() == raw
