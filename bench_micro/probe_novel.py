#!/usr/bin/env python
"""Novel-prose probe: pseudo-German text whose vocabulary is DISJOINT
from the hot-set profile corpus.

Round-5 finding: the corpus-profiled hot set overfits — real sentences
made of words absent from the profile corpus measure 4-7% cold fetches
on the narrow (H=640) DE hot set (vs 0.28% for the bench text, which
IS in the profile), and even H=2047 leaves 2-3%: novel words walk
word/abbreviation-trie states with a long flat occupancy tail.  This
probe measures what that means on the device — the honest
production-corpus number, where neither the bench text (best case) nor
the cycled conformance corpus (its scenarios are in the profile too)
is representative.

Words are composed from German syllables with capitalization,
inflection endings, and sentence punctuation, so they walk the same
trie machinery real unseen vocabulary does.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_LANES", "32768"))
L = int(os.environ.get("BENCH_LEN", "1024"))
REPS = int(os.environ.get("BENCH_REPS", "5"))

_SYL = (
    "ver ge be ent er zer an auf aus vor nach über unter zwischen "
    "hand werk schaft ung keit heit lich bar sam haus berg tal feld "
    "wald bach stein brück dorf burg heim hof gart mark platz weg "
    "stras lauf spiel werk zeug kraft stoff licht schatt morg abend "
    "nacht wint somm früh spät grün blau rot gelb schwarz weiß grau "
    "klein groß lang kurz breit schmal tief hoch nied flach rund "
    "spitz stumpf warm kalt heiß kühl nass trock hart weich fest "
    "los voll leer ganz halb viert drit zweit letz erst neu alt "
    "jung frisch reif roh gar fein grob zart rau glatt krumm "
).split()
_END_N = ["e", "en", "er", "es", "ung", "heit", "keit", "schaft", ""]
_END_V = ["t", "te", "ten", "st", "est", "end", ""]


def novel_texts(B, L, seed=11):
    rng = np.random.RandomState(seed)
    texts = []
    for i in range(B):
        target = L - 2
        parts = []
        n = 0
        first = True
        while n < target:
            k = rng.randint(1, 4)
            w = "".join(_SYL[rng.randint(len(_SYL))] for _ in range(k))
            w += (_END_N if rng.rand() < 0.6 else _END_V)[rng.randint(7)]
            if first or rng.rand() < 0.4:
                w = w.capitalize()
            first = False
            parts.append(w)
            n += len(w) + 1
            if rng.rand() < 0.12:
                parts[-1] += "."
                first = True
            elif rng.rand() < 0.08:
                parts[-1] += ","
        doc = " ".join(parts)[: target] + ".\x04"
        texts.append(doc)
    return texts


def main():
    import jax

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    texts = novel_texts(B, L)
    nbytes = sum(len(t.encode()) for t in texts)
    kw = {}
    for env, key, cast in (
        ("HOT", "hot_size", int), ("PRING", "kernel_pring", int),
        ("POOL", "kernel_pool", int), ("WGRP", "kernel_wgrp", int),
        ("KK", "kernel_k", int), ("CH", "kernel_ch", int),
        ("SVC_NS", "kernel_svc_ns", int), ("INJQ", "kernel_injq", int),
    ):
        if os.environ.get(env):
            kw[key] = cast(os.environ[env])
    eng = BatchEngine(tok, **kw)
    import jax.numpy as jnp

    meta, lengths, _ = eng.encoder.encode_batch(texts)
    if meta.shape[1] < L:
        meta = np.pad(meta, ((0, 0), (0, L - meta.shape[1])))
    meta_d = jax.block_until_ready(jnp.asarray(meta))
    lengths_d = jax.block_until_ready(jnp.asarray(lengths))
    t0 = time.time()
    ys, bad, steps, state = jax.block_until_ready(
        eng.run_raw_device(meta_d, lengths_d)
    )
    compile_s = time.time() - t0
    times = []
    for _ in range(REPS):
        t0 = time.time()
        out = eng.run_raw_device(meta_d, lengths_d)
        int(np.asarray(out[1]).sum())
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    st = (np.asarray(eng.last_stats) if eng.last_stats is not None
          else np.zeros(3, np.int32))
    print(json.dumps({
        "config": {k: v for k, v in os.environ.items()
                   if k in ("HOT", "PRING", "POOL", "WGRP", "KK", "CH",
                            "SVC_NS", "INJQ")},
        "bad": int(np.asarray(bad).sum()),
        "rounds": int(st[0]), "services": int(st[1]),
        "steps": int(steps),
        "steps_per_char": round(int(steps) / L, 2),
        "compile_s": round(compile_s, 1),
        "mbps": round(nbytes / med / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
