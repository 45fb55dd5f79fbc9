#!/usr/bin/env python
"""Mixed-real-text hetero probe: conformance corpus docs cycled over
lanes with varied lengths — the honest heterogeneous workload for the
headline bench (VERDICT r2 item 4), as opposed to the adversarial
rotated-text probe (probe_hetero.py)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_TEXT  # noqa: E402

B = int(os.environ.get("BENCH_LANES", "32768"))
L = int(os.environ.get("BENCH_LEN", "1024"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def hetero_texts(B, L):
    """Per-lane documents: conformance scenario inputs cycled and
    concatenated to varied lengths in [L/4, L)."""
    import json as _json

    scen = _json.load(open("conformance/scenarios.json"))
    pool = [
        s["input"].replace("\x04", " ")
        for s in scen if s.get("input") and len(s["input"]) > 20
    ]
    pool += [BENCH_TEXT]
    rng = np.random.RandomState(7)
    texts = []
    for i in range(B):
        target = int(L // 4 + (rng.rand() * (3 * L // 4 - 2)))
        buf = []
        n = 0
        j = rng.randint(len(pool))
        while n < target:
            t = pool[(j + len(buf)) % len(pool)]
            buf.append(t)
            n += len(t) + 1
        doc = " ".join(buf)[: target - 2] + ".\x04"
        texts.append(doc)
    return texts


def main():
    import jax
    import jax.numpy as jnp

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    texts = hetero_texts(B, L)
    if os.environ.get("SORTLEN"):
        texts = sorted(texts, key=len)
    nbytes = sum(len(t.encode()) for t in texts)
    # engine knobs via env for config sweeps on this workload
    kw = {}
    for env, key, cast in (
        ("HOT", "hot_size", int), ("PRING", "kernel_pring", int),
        ("POOL", "kernel_pool", int), ("WGRP", "kernel_wgrp", int),
        ("KK", "kernel_k", int), ("CH", "kernel_ch", int),
        ("SVC_NS", "kernel_svc_ns", int),
        ("INJQ", "kernel_injq", int),
    ):
        if os.environ.get(env):
            kw[key] = cast(os.environ[env])
    eng = BatchEngine(tok, **kw)
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
        # completion sync via host scalar fetch (tunnel-safe)
        int(np.asarray(out[1]).sum())
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    st = (np.asarray(eng.last_stats) if eng.last_stats is not None
          else np.zeros(3, np.int32))
    print(json.dumps({
        "config": {k: v for k, v in os.environ.items()
                   if k in ("HOT", "PRING", "POOL", "WGRP", "KK", "CH",
                            "SVC_NS", "INJQ", "SORTLEN")},
        "bad": int(np.asarray(bad).sum()),
        "rounds": int(st[0]), "services": int(st[1]),
        "steps": int(steps),
        "steps_per_char": round(int(steps) / L, 2),
        "compile_s": round(compile_s, 1),
        "mbps": round(nbytes / med / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
