"""Stream pipeline: EOT-split lane parallelism must be byte-exact."""

import pytest

import datok_tpu as dt
from datok_tpu.runtime.pipeline import (
    eot_split_safe,
    split_documents,
    tokenize_stream,
)
from datok_tpu.runtime.writer import TOKEN_POS, TokenWriter


def test_split_documents():
    assert split_documents("a\x04b\x04c") == ["a\x04", "b\x04", "c"]
    assert split_documents("abc") == ["abc"]
    assert split_documents("") == [""]
    assert split_documents("\x04") == ["\x04"]


def test_eot_split_safe(mat_de, dat_de):
    # The DE model consumes EOT as an ignorable char from whitespace-
    # class states (targets 2/18271/18335, e.g. after a backtick), so
    # the static root-return property does NOT hold — the pipeline must
    # verify exit states and chain-repair instead.
    assert not eot_split_safe(mat_de)
    assert not eot_split_safe(dat_de)


STREAMS = [
    "Erste.\n\x04Zweite hier!\x04 Dritte?\x04",
    "A.\x04B ohne Ende",
    "\x04\x04",
    "Der alte Mann. Ging am 5.9.2018 zur Weststr. 3.\x04readme.txt fertig!\x04",
    # non-root exit after EOT (backtick leaves a whitespace-class
    # state; EOT is consumed as ignorable) — exercises chain repair
    "ab `\x04cd ef\x04gh",
    "x`\x04`y\x04z",
]


@pytest.mark.parametrize("stream", STREAMS)
def test_stream_matches_oracle(mat_de, stream):
    w = tokenize_stream(mat_de, stream)
    assert w.getvalue() == mat_de.tokenize(stream)


def test_stream_positions_across_texts(mat_de):
    stream = "This.\x0a\x04And.\n\x04\n"
    w = TokenWriter(dt.TOKENS | dt.SENTENCES | TOKEN_POS)
    tokenize_stream(mat_de, stream, w)
    assert w.getvalue() == "This\n.\n\n0 4 4 5\nAnd\n.\n\n0 3 3 4\n"


def test_cli_convert_and_tokenize(tmp_path, capsys):
    from datok_tpu.cli import main

    out = tmp_path / "st.matok"
    rc = main(["convert", "-i", "/root/reference/testdata/simpletok.fst", "-o", str(out)])
    assert rc == 0

    inp = tmp_path / "in.txt"
    inp.write_text("Der alte Mann.")
    capsys.readouterr()
    rc = main(["tokenize", "-t", str(out), str(inp)])
    assert rc == 0
    assert capsys.readouterr().out == "Der\nalte\nMann\n.\n\n\n"


def test_long_document_segmentation(mat_de):
    from datok_tpu.runtime.jax_engine import BatchEngine
    from datok_tpu.runtime.oracle import transduce_events
    from datok_tpu.runtime.pipeline import events_long_batch

    eng = BatchEngine(mat_de)
    base = (
        "Der Vorsitzende der Abk. hat z.B. gewählt. Bald darauf folgte, "
        'laut "Bericht", die 2. Wahl am 5.9.2018 auf wikipedia.org!\n'
    )
    docs = [
        base * 40,                        # ~5 KB, segments chained
        "Der alte Mann. " * 300,
        base[:300],                        # shorter than one segment
        "x" * 2500 + " kurz.",            # token spanning segments → fallback
        "A\x04" + base * 20 + "\x04Ende.",  # EOTs inside a long doc
    ]
    evs, exits = events_long_batch(eng, docs, seg_len=1024)
    for d, e in zip(docs, evs):
        assert e == transduce_events(mat_de, d), len(d)


def test_stream_with_long_docs(mat_de):
    base = "Ein Satz mit Wörtern und z.B. Abkürzungen bzw. Zahlen wie 3,5 Mio. "
    stream = (base * 600) + "\x04" + (base * 3) + "\x04kurz"
    from datok_tpu.runtime.jax_engine import BatchEngine

    w = tokenize_stream(mat_de, stream)
    assert w.getvalue() == mat_de.tokenize(stream)
