"""Auto-tune drift guard (VERDICT r4 ask #6).

The auto hot-set size H is the largest speed-of-light term of the fused
kernel (the per-step one-hot build is 2H VPU rows), and the measured
knee for the committed DE/EN models at the committed profile corpus is
H in [512, 640] with >= 98% transition coverage
(jax_engine.profile_hot_states' auto rule; BENCH_LOG round-4 H sweep:
uniform 383/375/347 MB/s at H=512/640/768).

In round 3 an innocent profile-corpus expansion silently grew the auto
H from 512 to 768 and cost ~8% uniform throughput until a manual sweep
caught it.  These tests make that failure loud: editing the profile
corpus (default_profile_texts) or the auto rule such that the knee
moves out of the documented band must fail the suite, at which point
the knee should be re-measured on hardware (bench_micro/sweep_kernel.py)
and this guard re-pinned deliberately.
"""

import numpy as np
import pytest

from datok_tpu.runtime.jax_engine import (
    default_profile_texts,
    profile_hot_states,
)
from datok_tpu.runtime.oracle import transduce_events


def _auto_hot_and_coverage(tok):
    texts = default_profile_texts(tok)
    hot = profile_hot_states(tok, texts, "auto")
    counter = {}
    for t in texts:
        transduce_events(tok, t, state_counter=counter)
    total = sum(counter.values())
    hot_set = set(int(s) for s in hot)
    covered = sum(c for s, c in counter.items() if s in hot_set)
    return hot, covered / max(total, 1)


@pytest.mark.parametrize("model", ["de", "en"])
def test_auto_hot_set_knee_pinned(model, mat_de, mat_en):
    tok = mat_de if model == "de" else mat_en
    hot, coverage = _auto_hot_and_coverage(tok)
    H = len(hot)
    # The documented knee band for the committed models + profile
    # corpus.  If this fails after a deliberate profile-corpus change,
    # re-measure the H sweep on TPU and re-pin BOTH the auto rule's cap
    # (jax_engine.profile_hot_states) and this band together.
    assert 512 <= H <= 640, (
        f"auto hot-set size drifted to H={H} for the {model} model "
        "(documented knee band [512, 640]); re-measure the H sweep "
        "before accepting this"
    )
    assert H % 128 == 0, f"H={H} not MXU-lane aligned"
    assert coverage >= 0.98, (
        f"hot-set coverage {coverage:.4f} < 98% for the {model} model: "
        "cold transitions cost one kernel ROUND each under injection, "
        "so a coverage regression is a throughput cliff on real text"
    )


def test_hot_set_root_first(mat_de):
    hot = profile_hot_states(mat_de, default_profile_texts(mat_de), "auto")
    assert int(hot[0]) == 1, "root state must be hot id 0 (kernel init)"
    assert len(np.unique(hot)) == len(hot)
