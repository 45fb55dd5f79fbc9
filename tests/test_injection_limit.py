"""The S >= 2^15 injection limit must fail loud and fall back exact.

The fused kernel's cold-entry injection rides full target ids in a
15-bit field (pallas_engine._run_machine_pallas), so models with
>= 2^15 states must (a) disable injection with a one-line notice and
(b) stay byte-exact through the pooled-service fallback.  No committed
fixture is that large (DE: 18,400 states), so these tests synthesize a
~32.8K-state model whose hot path walks state ids above 2^15 — ids
that would corrupt the injected entries if injection were wrongly
enabled.
"""

import logging

import numpy as np
import pytest

from datok_tpu.fsa.automaton import Automaton, Edge
from datok_tpu.fsa.matrix import MatrixTokenizer
from datok_tpu.runtime.jax_engine import BatchEngine, decode_events_batch
from datok_tpu.runtime.oracle import transduce_events

# chain states occupy the TOP of the id range so every deep-chain
# transition's (source, target) ids exceed 2^15
CHAIN_BASE = 32600
CHAIN_LEN = 200


def _big_tok() -> MatrixTokenizer:
    """Synthesize a >2^15-state tokenizer: root + '.' state + a long
    'a'-chain at ids 32600..32799, every chain state with an ε
    token-bound arc back to the root (valid Datok conventions,
    Readme.md:106-124)."""
    S = CHAIN_BASE + CHAIN_LEN - 1
    auto = Automaton()
    auto.epsilon, auto.unknown, auto.identity = 1, 2, 3
    auto.final = -1
    auto.sigma_rev = {4: "a", 5: " ", 6: "."}
    auto.sigma_count = 6
    auto.state_count = S
    auto.transitions = [None] * (S + 2)
    auto.transitions[1] = {
        4: Edge(4, 4, CHAIN_BASE),
        5: Edge(5, 1, 1, nontoken=True),
        6: Edge(6, 6, 2),
    }
    auto.transitions[2] = {1: Edge(1, 0, 1, tokenend=True)}
    for i in range(CHAIN_LEN):
        s = CHAIN_BASE + i
        nxt = s + 1 if i + 1 < CHAIN_LEN else s
        auto.transitions[s] = {
            4: Edge(4, 4, nxt),
            1: Edge(1, 0, 1, tokenend=True),
        }
    return MatrixTokenizer.from_automaton(auto)


@pytest.fixture(scope="module")
def big_tok():
    return _big_tok()


def _engine(big_tok):
    # hot_size=128 keeps the structural BFS fill from covering the
    # whole chain, so deep-chain characters are genuinely cold
    return BatchEngine(
        big_tok,
        engine="pallas",
        kernel_k=16,
        kernel_bl=128,
        hot_size=128,
        pallas_interpret=True,
        profile_texts=["aaa aa. a."],
    )


def test_injection_disabled_with_notice(big_tok, caplog):
    with caplog.at_level(logging.WARNING, logger="datok_tpu"):
        eng = _engine(big_tok)
    assert eng.rep.S >= (1 << 15)
    assert eng.spec.svc_ok  # packed service table still available
    assert eng.inj_enabled is False
    assert any(
        "injection disabled" in r.getMessage() for r in caplog.records
    ), "engine must announce the lost optimization"


def test_service_fallback_exact(big_tok):
    """Deep-chain texts (cold states with ids > 2^15) must run on
    device — no oracle fallback — and match the oracle byte for byte."""
    eng = _engine(big_tok)
    texts = [
        "a" * 180 + " aa.",
        "aaa a. " + "a" * 170 + ".",
        "a a. " + "a" * 150 + " a.",
    ]
    meta, lengths, _ = eng.encoder.encode_batch(texts)
    ys, bad, n_steps, state = eng.run_raw(meta, lengths)
    assert not bad[: len(texts)].any(), (
        "device must finish within budget (no hidden oracle fallback)"
    )
    evs = decode_events_batch(ys, n_steps)
    for t, e in zip(texts, evs):
        assert e == transduce_events(big_tok, t), repr(t[:40])


def test_small_model_keeps_injection(mat_de):
    eng = BatchEngine(
        mat_de, engine="pallas", kernel_bl=128, pallas_interpret=True
    )
    assert eng.inj_enabled is True
