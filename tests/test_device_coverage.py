"""Every model family is first-class on every device engine.

Parametrized parity over {DE, EN, clitic, simpletok} × {general, hot,
pallas-interpret}: each engine must produce oracle-identical event
streams on the full conformance corpus (hot/general) or a boundary-
heavy subset (pallas interpreter mode, which is orders slower) plus
model-specific inputs — the reference's cross-model test spread
(matrix_test.go:1017-1230) on the TPU engines.
"""

import json
import os

import pytest

from datok_tpu.runtime.jax_engine import BatchEngine
from datok_tpu.runtime.oracle import transduce_events

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/testdata"

with open(os.path.join(HERE, "conformance", "scenarios.json"), encoding="utf-8") as f:
    CORPUS = sorted({s["input"] for s in json.load(f)})

# model-specific exercises beyond the shared corpus
EXTRA = {
    "tokenizer_en.matok": [
        "they're They're THEY'RE doesn't Doesn't DOESN'T",
        "I'm won't shan't it's a can't-miss event, ain't it?",
        "We'll've been there by Jan. 3rd, Mr. Smith. The U.S.A. etc.",
        "Don't.\x04Didn't.\x04",
        "",
    ],
    "clitic_test.matok": [
        "n't n't n't",
        "Dean't dean't deant",
        "aan't a an't",
        "",
        "\x04",
    ],
    "tokenizer_de.matok": [],
    "simpletok.matok": [
        "Der alte  Mann.   Hier!\x04Und (dort)?",
        " \t\n mixed   spacing . ",
    ],
}

MODELS = list(EXTRA.keys())


@pytest.fixture(scope="module")
def model_cache():
    import datok_tpu as dt

    return {name: dt.load_matrix_file(f"{REF}/{name}") for name in MODELS}


def _assert_parity(eng, tok, texts):
    evs = eng.events_batch(texts)
    for t, e in zip(texts, evs):
        assert e == transduce_events(tok, t), repr(t[:60])


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.parametrize("engine", ["general", "hot"])
def test_corpus_parity(model_cache, name, engine):
    tok = model_cache[name]
    eng = BatchEngine(tok, engine=engine)
    assert eng.engine == engine
    texts = CORPUS + EXTRA[name]
    if engine == "general":  # serial-gather machine is slow; thin out
        texts = texts[::4] + EXTRA[name]
    _assert_parity(eng, tok, texts)


@pytest.mark.parametrize("name", MODELS)
def test_pallas_interpret_parity(model_cache, name):
    tok = model_cache[name]
    eng = BatchEngine(
        tok, engine="pallas", kernel_k=16, kernel_bl=128,
        pallas_interpret=True,
    )
    assert eng.engine == "pallas"
    # interpreter mode is ~100× slower than compiled — a spread of the
    # corpus plus every model-specific input keeps runtime sane
    texts = CORPUS[::8] + EXTRA[name]
    _assert_parity(eng, tok, texts)


def test_en_hot_profile_covers_clitics(model_cache):
    """The EN calibration additions must put the clitic/abbreviation
    machinery in the hot set (was German-centric before)."""
    tok = model_cache["tokenizer_en.matok"]
    eng = BatchEngine(tok, engine="hot")
    hot = set(eng.spec.hot_full.tolist())
    # every state visited while transducing English clitic text must be
    # hot — cold states here would mean EN runs at service speed
    counter = {}
    transduce_events(
        tok,
        "Don't they're we'll I'm isn't won't Mr. Smith's Jan. 3rd etc.",
        state_counter=counter,
    )
    cold = [s for s in counter if s not in hot]
    assert not cold, f"EN clitic states missing from hot set: {cold[:10]}"
