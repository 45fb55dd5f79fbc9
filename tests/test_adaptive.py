"""Adaptive hot-set engine selection (VERDICT r4 ask #1).

The narrow (H≤640) and wide (H=768, pring=256) fused engines must be
byte-equivalent — the hot set is a performance partition, never a
semantic one — and the cold-rate router must send uniform prose to the
narrow engine and rare-word-dense text to the wide one (measured
separation: 0.28% vs 0.99% cold fetches on the narrow DE hot set).
"""

import numpy as np
import pytest

from datok_tpu.runtime.adaptive import AdaptiveEngine
from datok_tpu.runtime.jax_engine import _CALIBRATION
from datok_tpu.runtime.oracle import transduce_events

# In-profile prose (the hot set is corpus-profiled, so only text whose
# vocabulary the profile saw measures a low cold rate — novel
# vocabulary walks unprofiled trie states at 4-7% cold, which is the
# per-wave-spec machinery's job, not the static router's)
UNIFORM = _CALIBRATION * 8

# rare-word-dense: URLs, obfuscated emails, IPs, deep abbreviation
# tries — the regions that profile cold on the narrow hot set
COLD_HEAVY = (
    "Erreichbar via https://korap.ids-mannheim.de/?q=Baum&x=1 oder "
    "korap[at]ids-mannheim[dot]de bzw. 10.0.10.51:8080. Vgl. "
    "F.D.P.-Fraktion, Ba.-Wü., z.Zt. ca. 0,5% lt. Prof. Dr.-Ing. "
    "Musterfrau-Häberle. ;-) ^_^ &#x2F; <a href='x.htm'>T</a> "
) * 8


@pytest.fixture(scope="module")
def ae(mat_de):
    return AdaptiveEngine(mat_de)


def test_routing(ae):
    ae.choose([UNIFORM] * 16)
    assert ae.last_choice == "narrow", ae.last_cold_rate
    ae.choose([COLD_HEAVY] * 16)
    assert ae.last_choice == "wide", ae.last_cold_rate
    # measured separation backs the default threshold: uniform well
    # under it, cold-heavy well over it
    assert ae.cold_rate([UNIFORM] * 4) < ae.threshold
    assert ae.cold_rate([COLD_HEAVY] * 4) > ae.threshold


def test_narrow_wide_byte_parity(ae):
    texts = [UNIFORM, COLD_HEAVY, "a", "", "Der Mann.\x04Zwei.\x04"]
    out_n = ae.narrow.tokenize_batch(texts)
    out_w = ae.wide.tokenize_batch(texts)
    assert out_n == out_w
    # and both match the scalar oracle
    from datok_tpu.runtime.events import format_events
    from datok_tpu.runtime.writer import SIMPLE

    for t, o in zip(texts, out_n):
        ev = list(transduce_events(ae.tok, t))
        assert o == format_events(ev, t, SIMPLE)


def test_wide_is_lazy(mat_de):
    a2 = AdaptiveEngine(mat_de)
    a2.choose([UNIFORM] * 4)
    assert a2._wide is None, "uniform corpus must not build the wide engine"


def test_choose_empty(ae):
    assert ae.choose([]) is ae.narrow
