"""Pallas fused-kernel engine: semantics parity in interpreter mode.

The fused kernel (datok_tpu/runtime/pallas_engine.py) shares its step
semantics with the XLA machines via the same ``_make_step`` factory,
but changes the transition-fetch representation (packed 16-bit two-
plane entries, tagged deferred state decode, cold side table) and the
loop structure (K steps per kernel call, XLA service steps between).
These tests run the kernel in Pallas interpreter mode on CPU and
assert byte-identical output vs the scalar oracle — the same
conformance oracle the reference's tests use (matrix_test.go).
"""

import numpy as np
import pytest

from datok_tpu.runtime.jax_engine import BatchEngine

TEXTS = [
    "Der alte Mann.",
    'Er sagte: "Gut!", und ging.',
    "Die Abk. bzw. z.B. Weststr. 3 um 14:30 Uhr.\x04Noch ein Text.\x04",
    "wikipedia.org und korap@ids-mannheim.de sowie 50.4%.",
    "",
    "Mach's gut \U0001F600 ;) T__T <b>xml</b> &quot; verf***** D'dorf.",
    "Lehrer:innenfortbildung und ein(e) gute:r Azubi.",
    "a" * 200 + ".",
    "   führende   Leerzeichen und\tTabs!",
]


@pytest.fixture(scope="module")
def pallas_engine(mat_de):
    return BatchEngine(
        mat_de,
        engine="pallas",
        kernel_k=16,
        kernel_bl=128,
        pallas_interpret=True,
    )


def test_pallas_spec_tables(mat_de):
    eng = BatchEngine(
        mat_de, engine="pallas", kernel_bl=128, pallas_interpret=True
    )
    spec = eng.spec
    assert spec.pallas_ok
    assert spec.planes_kT.shape == (2 * spec.H, spec.A_pad)
    assert spec.planes_kT.dtype == np.int8
    assert spec.n_cold <= 2047


def test_pallas_parity_oracle(pallas_engine, mat_de):
    got = pallas_engine.tokenize_batch(TEXTS)
    want = [mat_de.tokenize(t) for t in TEXTS]
    assert got == want


def test_pallas_parity_early_exit(mat_de):
    eng = BatchEngine(
        mat_de,
        engine="pallas",
        kernel_k=16,
        kernel_bl=128,
        kernel_early_exit=True,
        pallas_interpret=True,
    )
    sub = TEXTS[:4]
    assert eng.tokenize_batch(sub) == [mat_de.tokenize(t) for t in sub]


def test_pallas_segment_chaining(pallas_engine, mat_de):
    """Entry contexts / cut lanes flow through the tagged registers."""
    text = "Der Vorsitzende der Abk. hat z.B. gewählt und bzw. verlor."
    evs, exits = pallas_engine.events_batch([text], return_exits=True)
    assert len(evs[0]) > 0
    assert exits[0] != 0
