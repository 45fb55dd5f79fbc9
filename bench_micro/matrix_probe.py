#!/usr/bin/env python
"""One-process measurement matrix: {DE uniform, DE rotated, DE mixed,
EN uniform} x engine configs, with the tunnel-safe completion sync.

    python bench_micro/matrix_probe.py '[{"hot_size":512,"kernel_pring":128}]'

Prints one JSON line per (config, workload).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_TEXT, BENCH_TEXT_EN  # noqa: E402

B = int(os.environ.get("BENCH_LANES", "32768"))
L = int(os.environ.get("BENCH_LEN", "1024"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def timed(eng, meta_d, lengths_d, reps=REPS):
    times = []
    bad = 0
    for _ in range(reps):
        t0 = time.time()
        out = eng.run_raw_device(meta_d, lengths_d)
        bad = int(np.asarray(out[1]).sum())  # completion sync
        times.append(time.time() - t0)
    st = eng.last_stats
    st = np.zeros(3, np.int64) if st is None else np.asarray(st)
    return sorted(times)[len(times) // 2], bad, int(st[0]), int(st[1])


def main():
    import jax
    import jax.numpy as jnp

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine
    from probe_hetero_mixed import hetero_texts

    configs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [{}]
    which = os.environ.get("WORKLOADS", "uniform,hetero,mixed,en").split(",")

    tok_de = dt.load_matrix_file(
        "/root/reference/testdata/tokenizer_de.matok"
    )
    tok_en = dt.load_matrix_file(
        "/root/reference/testdata/tokenizer_en.matok"
    )
    doc = (BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2] + ".\x04"
    doc_en = (BENCH_TEXT_EN * (L // len(BENCH_TEXT_EN) + 1))[: L - 2] + ".\x04"
    work = {}
    if "uniform" in which:
        work["uniform"] = (tok_de, [doc] * B)
    if "hetero" in which:
        work["hetero"] = (
            tok_de,
            [
                (doc[(i * 131) % (L - 2):-2] + doc[: (i * 131) % (L - 2)])
                + ".\x04"
                for i in range(B)
            ],
        )
    if "mixed" in which:
        work["mixed"] = (tok_de, sorted(hetero_texts(B, L), key=len))
    if "en" in which:
        work["en"] = (tok_en, [doc_en] * B)

    engines = {}
    for cfg in configs:
        key = json.dumps(cfg, sort_keys=True)
        for wname, (tok, texts) in work.items():
            eng = engines.get((key, tok is tok_en))
            if eng is None:
                eng = BatchEngine(tok, **cfg)
                engines[(key, tok is tok_en)] = eng
            nbytes = sum(len(t.encode()) for t in texts)
            meta, lengths, _ = eng.encoder.encode_batch(texts)
            if meta.shape[1] < L:
                meta = np.pad(meta, ((0, 0), (0, L - meta.shape[1])))
            meta_d = jax.block_until_ready(jnp.asarray(meta))
            lengths_d = jax.block_until_ready(jnp.asarray(lengths))
            t0 = time.time()
            out = eng.run_raw_device(meta_d, lengths_d)
            int(np.asarray(out[1]).sum())
            compile_s = time.time() - t0
            steps0 = int(np.asarray(out[2]))
            med, bad, rounds, services = timed(eng, meta_d, lengths_d)
            print(
                json.dumps(
                    {
                        "cfg": cfg,
                        "workload": wname,
                        "mbps": round(nbytes / med / 1e6, 2),
                        "bad": bad,
                        "rounds": rounds,
                        "services": services,
                        "steps": steps0,
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )
            del meta_d, lengths_d


if __name__ == "__main__":
    main()
