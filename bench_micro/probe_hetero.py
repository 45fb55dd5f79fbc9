#!/usr/bin/env python
"""Heterogeneous-lane probe: rotated bench text per lane.

Lanes see the same document rotated by a per-lane offset, so their
content-dependent speeds diverge — the worst case for the per-block
ring windows (lanes more than `pring` chars apart meta-stall).  Use to
validate ring-size (kernel_pring) choices beyond the uniform bench.

    PRING=128 python bench_micro/probe_hetero.py
"""

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
PRING = int(os.environ.get("PRING", "0"))
POOL = int(os.environ.get("POOL", "0"))
SERVICE_K = int(os.environ.get("SERVICE_K", "0"))


def main():
    import jax
    import jax.numpy as jnp

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    base = (BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2]
    texts = [
        (base[(i * 131) % (L - 2):] + base[: (i * 131) % (L - 2)]) + ".\x04"
        for i in range(B)
    ]
    nbytes = sum(len(t.encode()) for t in texts)
    kw = {}
    if PRING:
        kw["kernel_pring"] = PRING
    if POOL:
        kw["kernel_pool"] = POOL
    if SERVICE_K:
        kw["service_k"] = SERVICE_K
    eng = BatchEngine(tok, **kw)
    meta, lengths, _ = eng.encoder.encode_batch(texts)
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
        jax.block_until_ready(eng.run_raw_device(meta_d, lengths_d))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(json.dumps({
        "pring": PRING or "default",
        "pool": POOL or "default",
        "service_k": SERVICE_K or "default",
        "bad": int(np.asarray(bad).sum()),
        "rounds": int((eng.last_stats or (0, 0, 0))[0]),
        "services": int((eng.last_stats or (0, 0, 0))[1]),
        "steps": int(steps),
        "compile_s": round(compile_s, 1),
        "mbps": round(nbytes / med / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
