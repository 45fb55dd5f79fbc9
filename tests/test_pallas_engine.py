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


def test_symbol_class_compression_exact(mat_de):
    """Class-compressed planes must be column-identical through cls_tab.

    The fused kernel matmuls against one column per symbol CLASS and
    gathers by the meta-borne class id (encode.py META_CLS_*); this
    pins the invariant that makes the optimization exact: for every
    symbol a, planes_cls[:, cls_tab[a]] == planes[:, a] bit-for-bit.
    """
    eng = BatchEngine(
        mat_de, engine="pallas", kernel_bl=128, pallas_interpret=True
    )
    spec = eng.spec
    assert spec.cls_tab is not None, "DE model should compress"
    assert spec.C_pad == 128 and spec.A_pad == 256
    assert int(spec.cls_tab.max()) < 128  # fits META_CLS_MASK
    np.testing.assert_array_equal(
        spec.planes_cls_kT[:, spec.cls_tab], spec.planes_kT
    )
    # the encoder stamps the same ids the kernel constants use
    assert eng.encoder.cls_tab is spec.cls_tab
    meta = eng.encoder.encode(np.frombuffer(
        "Der alte Mann z.B. ä\x04".encode("utf-32-le"), dtype="<u4"
    ).astype(np.int32))
    from datok_tpu.runtime.encode import META_A_MASK, META_CLS_MASK, META_CLS_SHIFT
    a = meta & META_A_MASK
    cls = (meta >> META_CLS_SHIFT) & META_CLS_MASK
    np.testing.assert_array_equal(cls, spec.cls_tab[a])


def test_pallas_parity_oracle(pallas_engine, mat_de):
    got = pallas_engine.tokenize_batch(TEXTS)
    want = [mat_de.tokenize(t) for t in TEXTS]
    assert got == want


def test_pallas_parity_no_svc_packed(mat_de):
    """The unpacked service fallback (svc_ok=False) stays exact.

    Models too large for the packed one-gather service table (S ≥ 2^18
    states or H > 1022) run the original take_along_axis + aux-refresh
    service; pin its parity so the fallback never rots.
    """
    from datok_tpu.runtime.pallas_engine import PallasSpec

    eng = BatchEngine(
        mat_de, engine="pallas", kernel_k=16, kernel_bl=128,
        pallas_interpret=True,
    )
    eng.spec.svc_ok = False  # before first run: jit keys on this spec
    eng.pallas_spec = PallasSpec(eng.spec)
    got = eng.tokenize_batch(TEXTS[:4])
    want = [mat_de.tokenize(t) for t in TEXTS[:4]]
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


def test_pallas_fused_boundary_fuzz(pallas_engine, mat_de):
    """Boundary-heavy fuzz through the fused-boundary fast path.

    Word/space/punctuation sequences maximize fused token-bound steps
    (the composed fail→ε-flush→consume entries); the mix also hits the
    excluded corners (sentence chains, EOT, stale-ok identity) that
    must stay on the slow path.
    """
    import random

    from datok_tpu.runtime.jax_engine import decode_events_batch
    from datok_tpu.runtime.oracle import transduce_events

    assert pallas_engine.spec.fused_ok
    rng = random.Random(7)
    words = ["der", "Mann", "z.B.", "a", "ᛄ", "müde", "1.9.2018", "-", "x"]
    seps = [" ", ". ", "! ", "? ", "\n", " \x04", ", ", ": "]
    texts = []
    for _ in range(40):
        n = rng.randint(0, 14)
        s = "".join(
            rng.choice(words) + rng.choice(seps) for _ in range(n)
        )
        texts.append(s)
    evs = pallas_engine.events_batch(texts)
    for t, e in zip(texts, evs):
        assert e == transduce_events(mat_de, t), repr(t[:60])


def test_pallas_fused_checkpoint_resume(pallas_engine, mat_de):
    """Fused steps write the lazy TAG_EPSOF checkpoint; a chained
    resume from it must be exact (exit decode resolves the sentinel)."""
    import numpy as np

    from datok_tpu.runtime.oracle import transduce_events

    doc = "Der alte Mann las am Tag die Zeitung im Zug. " * 8
    cut = 120
    meta, lengths, _ = pallas_engine.encoder.encode_batch([doc[:cut]])
    ys, bad, n_steps, state = pallas_engine.run_raw(
        meta, lengths, stops=np.array([True])
    )
    assert not bad[0]
    ck_ctx, ck_b = int(state[0, 1]), int(state[0, 2])
    assert ck_b > 0
    # resume on host from the device checkpoint: must equal a full walk
    from datok_tpu.runtime.jax_engine import decode_events_batch

    head = decode_events_batch(ys, n_steps)[0]
    while head and head[-1][0] == 2:
        head.pop()
    tail = transduce_events(mat_de, doc, entry_state=ck_ctx, start=ck_b)
    assert head + tail == transduce_events(mat_de, doc)
