#!/usr/bin/env python
"""Profile one bench run with jax.profiler; print an op-time rollup.

    python bench_micro/profile_machine.py [hetero]

Writes the trace under /tmp/datok_prof and rolls up device op time by
category (fused kernel / service gathers / decode matmuls / ring
slicing / rest) from the trace's op events when the tooling allows,
falling back to printing the trace path for manual inspection.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_TEXT  # noqa: E402

B = int(os.environ.get("BENCH_LANES", "32768"))
L = int(os.environ.get("BENCH_LEN", "1024"))
HETERO = len(sys.argv) > 1 and sys.argv[1] == "hetero"
MIXED = len(sys.argv) > 1 and sys.argv[1] == "mixed"


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    base = (BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2]
    if MIXED:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from probe_hetero_mixed import hetero_texts

        texts = sorted(hetero_texts(B, L), key=len)
    elif HETERO:
        texts = [
            (base[(i * 131) % (L - 2):] + base[: (i * 131) % (L - 2)]) + ".\x04"
            for i in range(B)
        ]
    else:
        texts = [base + ".\x04"] * B
    eng = BatchEngine(tok, **(
        {"kernel_pool": int(os.environ["POOL"])} if os.environ.get("POOL") else {}
    ))
    meta, lengths, _ = eng.encoder.encode_batch(texts)
    if meta.shape[1] < L:
        meta = np.pad(meta, ((0, 0), (0, L - meta.shape[1])))
    meta_d = jax.block_until_ready(jnp.asarray(meta))
    lengths_d = jax.block_until_ready(jnp.asarray(lengths))
    jax.block_until_ready(eng.run_raw_device(meta_d, lengths_d))  # compile

    out = "/tmp/datok_prof"
    with jax.profiler.trace(out):
        t0 = time.time()
        jax.block_until_ready(eng.run_raw_device(meta_d, lengths_d))
        wall = time.time() - t0
    print(json.dumps({
        "mode": "mixed" if MIXED else ("hetero" if HETERO else "uniform"),
        "wall_ms": round(wall * 1000, 1),
        "rounds": int(np.asarray(eng.last_stats)[0]) if eng.last_stats is not None else 0,
        "services": int(np.asarray(eng.last_stats)[1]) if eng.last_stats is not None else 0,
    }))

    # roll up device op durations from the trace proto (best effort)
    traces = sorted(glob.glob(out + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("trace at", out, "(no trace.json.gz found; inspect manually)")
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    buckets = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        lo = name.lower()
        if "fusion" in lo and "kernel" in lo or "custom-call" in lo or "tpu_custom_call" in lo:
            k = "pallas_kernel"
        elif "gather" in lo:
            k = "gather(service)"
        elif "dot" in lo or "convolution" in lo:
            k = "matmul"
        elif "dynamic-slice" in lo or "dynamic_update" in lo or "dynamic-update" in lo:
            k = "slices(ring/ys)"
        elif "fusion" in lo:
            k = "fusion(logic)"
        else:
            k = "other"
        buckets[k] += ev["dur"]
    total = sum(buckets.values()) or 1.0
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{k:18s} {v/1000:9.1f} ms  {100*v/total:5.1f}%")


if __name__ == "__main__":
    main()
