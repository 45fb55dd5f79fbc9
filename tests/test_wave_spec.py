"""Per-wave hot specs: census selection, machine sharing, parity.

A wave's own fetch working set is tiny (bench_micro/probe_novel.py:
458 states at 99.95% self-coverage on novel prose), while a corpus-
profiled hot set runs percent-level cold there — so the engine can
census each wave with the exact native walk (dt_state_census) and
build a per-wave HotSpec.  Two invariants make this cheap enough to
do per wave, and both are pinned here:

  1. **Machine sharing** — HotSpec.for_wave shapes the wave spec to
     the engine spec's static signature (same H, pinned cold-table
     width, state 1 at slot 0, pinned ε/unknown class ids), so the
     jitted machines' static `spec` argument hashes equal and the
     compiled machine is reused with only table DATA swapped.
  2. **Exactness** — the kernel's injection/service safety net makes
     hot-set contents a pure performance knob; output must be
     byte-identical to the scalar oracle for ANY hot set, including
     census sets missing mid-document vocabulary.

Reference counterpart: none (the Go runtime has no hot/cold split);
the oracle parity target is matrix.go:383-697 semantics.
"""

import numpy as np
import pytest

from datok_tpu.runtime.jax_engine import BatchEngine, HotSpec

TEXTS = [
    "Der alte Mann ging zügig über die Weststr. zur Arbeit.",
    'Sie rief: "Warte!" und lief z.B. hinterher.',
    "Quantenchromodynamik und Xylophonvirtuosen bzw. 3,14% Rendite.",
    "wikipedia.org sowie korap@ids-mannheim.de um 14:30 Uhr.\x04Neu.\x04",
    "",
    "Mach's gut \U0001F600 ;) <b>xml</b> D'dorf.",
]

# vocabulary far from the committed profile corpus — the case where
# profile hot sets run cold (probe_novel.py) and census specs must
# still be exact
NOVEL = [
    "Zyklotronresonanz vexiert jodhaltige Quarzbrocken famos.",
    "Die Psychopharmakakommission qualifizierte Oxymorone hyperbolisch.",
    "Wachstumsschmerzen plagen juvenile Axolotl beträchtlich, ca. 7,5%.",
]


@pytest.fixture(scope="module")
def eng(mat_de):
    return BatchEngine(
        mat_de,
        engine="pallas",
        kernel_k=16,
        kernel_bl=128,
        pallas_interpret=True,
        per_wave=True,
    )


def test_census_states_exact_walk(eng, mat_de):
    counts = eng.census_states(TEXTS)
    if counts is None:
        pytest.skip("native library unavailable")
    assert counts[1] > 0  # root state is always fetched
    # every state the oracle walk visits on these texts is censused
    assert int((counts > 0).sum()) >= 32


def test_wave_spec_shares_machine_signature(eng, mat_de):
    wspec = eng.wave_spec(TEXTS)
    if wspec is eng.spec:
        pytest.skip("native census unavailable (wave spec fell back)")
    # the wave routes to a ladder rung; its spec must share that
    # rung's static signature (one compiled machine per rung)
    base = eng._rung_base(wspec.H)
    assert wspec.sig == base.sig
    assert hash(wspec) == hash(base) and wspec == base
    assert wspec.H in eng.WAVE_H_LADDER + (eng.spec.H,)
    assert wspec.hid1 == 0 and eng.spec.hid1 == 0
    assert len(wspec.cold_full_p2) == len(eng.spec.cold_full_p2)
    # pinned class ids: ε→0, unknown→1 (or 0 when classes collide)
    if wspec.cls_tab is not None:
        assert int(wspec.cls_tab[mat_de.epsilon]) == 0
        assert int(wspec.cls_tab[mat_de.unknown]) <= 1
    # the big service table is the SAME tok-level object (uploaded
    # once, shared across waves)
    assert wspec.svc_static is eng.spec.svc_static


def test_wave_spec_cache_reuses_objects(eng):
    a = eng.wave_spec(TEXTS)
    b = eng.wave_spec(TEXTS)
    assert a is b  # identical census → one spec → one device upload


def test_per_wave_parity_oracle(eng, mat_de):
    got = eng.tokenize_batch(TEXTS)
    want = [mat_de.tokenize(t) for t in TEXTS]
    assert got == want


def test_per_wave_parity_novel_vocabulary(eng, mat_de):
    got = eng.tokenize_batch(NOVEL)
    want = [mat_de.tokenize(t) for t in NOVEL]
    assert got == want


def test_adversarial_tiny_hot_set_is_exact(eng, mat_de):
    """A census that missed almost everything must still be exact —
    the injection/service safety net carries the cold fetches."""
    tiny = HotSpec.for_wave(eng.spec, eng.tok, np.array([1, 2, 3]))
    assert tiny.sig == eng.spec.sig
    enc = eng.encoder_for(tiny)
    meta, lengths, _ = enc.encode_batch(TEXTS)
    ys, bad, n_steps, state = eng.run_raw(
        meta, lengths, spec=tiny
    )
    from datok_tpu.runtime.jax_engine import decode_events_batch
    from datok_tpu.runtime.oracle import transduce_events

    decoded = decode_events_batch(ys, n_steps)
    for i, t in enumerate(TEXTS):
        if bad[i]:
            continue  # budget overflow lanes repair on host elsewhere
        assert decoded[i] == transduce_events(mat_de, t), t


def test_spec_swap_does_not_retrace(eng, mat_de):
    """The whole point of signature sharing: two different wave specs
    must hit ONE jit cache entry of the fused machine (a retrace
    through the dev tunnel costs minutes of Mosaic compile)."""
    from datok_tpu.runtime import pallas_engine

    eng.tokenize_batch(TEXTS[:2])
    n1 = pallas_engine._run_machine_pallas._cache_size()
    eng.tokenize_batch(NOVEL)  # different census → different spec
    n2 = pallas_engine._run_machine_pallas._cache_size()
    assert n1 == n2


def test_pipeline_per_wave_parity(eng, mat_de):
    """The stream pipeline with a per-wave engine: census → wave spec
    → wave-encoded metas → spec-swapped device run, byte-parity with
    the synchronous stream across waves with different vocabularies."""
    from datok_tpu.runtime.pipeline import tokenize_stream
    from datok_tpu.runtime.overlap import tokenize_stream_pipelined

    stream = "\x04".join(
        [t if t else "x" for t in TEXTS]
        + NOVEL
        + ["Weitere Wörter: Schifffahrtskapitän, Donaudampfer usw."]
    ) + "\x04"
    a = tokenize_stream(eng.tok, stream, engine=eng).getvalue()
    b = tokenize_stream_pipelined(
        eng.tok, stream, engine=eng, lanes=4
    ).getvalue()
    assert a == b


def test_for_wave_fill_and_trim(eng):
    H = eng.spec.H
    # fewer census states than H: filled from the profile set
    small = HotSpec.for_wave(eng.spec, eng.tok, np.array([5, 9]))
    assert small.H == H and small.sig == eng.spec.sig
    assert small.hot_full[0] == 1
    # more census states than H: trimmed
    big = HotSpec.for_wave(
        eng.spec, eng.tok, np.arange(2, eng.rep.S, 2)[: 4 * H]
    )
    assert big.H == H


@pytest.mark.parametrize("seed", range(3))
def test_per_wave_stream_fuzz(eng, mat_de, seed):
    """Randomized streams through the pipelined surface with the
    per-wave engine: census-driven table swaps (different rungs per
    wave) must never disturb stream exactness."""
    import random

    from datok_tpu.runtime.pipeline import tokenize_stream
    from datok_tpu.runtime.overlap import tokenize_stream_pipelined

    rng = random.Random(4200 + seed)
    vocab = TEXTS[:4] + NOVEL
    for case in range(3):
        text = "".join(
            rng.choice(vocab) + ("\x04" if rng.random() < 0.7 else " ")
            for _ in range(rng.randint(2, 12))
        )
        want = tokenize_stream(mat_de, text, engine=eng).getvalue()
        got = tokenize_stream_pipelined(
            mat_de, text, engine=eng, lanes=rng.choice([3, 8]),
        ).getvalue()
        assert got == want, (seed, case, repr(text[:80]))
