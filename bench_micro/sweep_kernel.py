#!/usr/bin/env python
"""Sweep fused-kernel configs (CH, PRING, BL, K) on the real chip.

One process (the dev tunnel is single-tenant); each config compiles
fresh (~1-3 min) then times reps. Prints one JSON line per config.
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

CONFIGS = [
    dict(name="base", kernel_bl=2048, kernel_k=128, kernel_ch=0),
    dict(name="ch2", kernel_bl=2048, kernel_k=128, kernel_ch=2),
    dict(name="ch4", kernel_bl=2048, kernel_k=128, kernel_ch=4),
    dict(name="pring512", kernel_bl=2048, kernel_k=128, kernel_ch=0,
         kernel_pring=512),
    dict(name="bl4096", kernel_bl=4096, kernel_k=128, kernel_ch=0),
    dict(name="k256", kernel_bl=2048, kernel_k=256, kernel_ch=0),
    dict(name="ch8", kernel_bl=2048, kernel_k=128, kernel_ch=8),
    dict(name="ch16", kernel_bl=2048, kernel_k=128, kernel_ch=16),
    dict(name="ch4k256", kernel_bl=2048, kernel_k=256, kernel_ch=4),
    dict(name="ch8k256", kernel_bl=2048, kernel_k=256, kernel_ch=8),
    dict(name="ch4bl1024", kernel_bl=1024, kernel_k=128, kernel_ch=4),
    dict(name="hot512", hot_size=512),
    dict(name="hot640", hot_size=640),
    dict(name="hot896", hot_size=896),
    dict(name="pool4", kernel_pool=4),
    dict(name="pool16", kernel_pool=16),
    dict(name="hot512pool4", hot_size=512, kernel_pool=4),
    dict(name="hot384", hot_size=384),
    dict(name="hot448", hot_size=448),
    dict(name="pring128", kernel_pring=128),
    dict(name="pring512b", kernel_pring=512),
    dict(name="pool32u", kernel_pool=32),
    # round-4: the auto hot set grew 512 -> 768 when the profile corpus
    # gained the EN calibration texts; re-tune H x pring under
    # injection-mode cold handling
    dict(name="h512p256", hot_size=512),
    dict(name="h512p128", hot_size=512, kernel_pring=128),
    dict(name="h640p256", hot_size=640),
    dict(name="h640p128", hot_size=640, kernel_pring=128),
    dict(name="h768p128", kernel_pring=128),
    dict(name="h512p192", hot_size=512, kernel_pring=192),
    # round-4 second pass around the h512p128 winner
    dict(name="h512p128pool16", hot_size=512, kernel_pring=128,
         kernel_pool=16),
    dict(name="h512p128pool64", hot_size=512, kernel_pring=128,
         kernel_pool=64),
    dict(name="h512p128w256", hot_size=512, kernel_pring=128,
         kernel_wgrp=256),
    dict(name="h576p128", hot_size=576, kernel_pring=128),
    dict(name="h512p128k192", hot_size=512, kernel_pring=128,
         kernel_k=192),
    dict(name="h512p128ch4", hot_size=512, kernel_pring=128,
         kernel_ch=4),
    dict(name="h512p128k64", hot_size=512, kernel_pring=128,
         kernel_k=64),
    # round-4 third pass: re-validation with the fixed (scalar-fetch)
    # completion sync; r768p256 pins the round-3 configuration
    dict(name="r768p256", hot_size=768, kernel_pring=256),
    dict(name="r512p128", hot_size=512, kernel_pring=128),
    dict(name="r512p128k64", hot_size=512, kernel_pring=128,
         kernel_k=64),
    dict(name="r640p256", hot_size=640, kernel_pring=256),
    dict(name="r512p128k96", hot_size=512, kernel_pring=128,
         kernel_k=96, kernel_ch=8),
]
if os.environ.get("SWEEP_ONLY"):
    names = set(os.environ["SWEEP_ONLY"].split(","))
    CONFIGS = [c for c in CONFIGS if c["name"] in names]


def main():
    import jax
    import jax.numpy as jnp

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    if os.environ.get("SWEEP_MODEL") == "en":
        from bench import BENCH_TEXT_EN as base_text

        tok = dt.load_matrix_file(
            "/root/reference/testdata/tokenizer_en.matok"
        )
    else:
        base_text = BENCH_TEXT
        tok = dt.load_matrix_file(
            "/root/reference/testdata/tokenizer_de.matok"
        )
    doc = (base_text * (L // len(base_text) + 1))[: L - 2] + ".\x04"
    texts = [doc] * B
    nbytes = sum(len(t.encode()) for t in texts)
    hetero = os.environ.get("SWEEP_HETERO") == "1"
    if hetero:
        het = [
            (doc[(i * 131) % (L - 2):-2] + doc[: (i * 131) % (L - 2)])
            + ".\x04"
            for i in range(B)
        ]
        nbytes_h = sum(len(t.encode()) for t in het)

    for cfg in CONFIGS:
        name = cfg.pop("name")
        eng = BatchEngine(tok, **cfg)
        meta, lengths, _ = eng.encoder.encode_batch(texts)
        meta_d = jax.block_until_ready(jnp.asarray(meta))
        lengths_d = jax.block_until_ready(jnp.asarray(lengths))
        t0 = time.time()
        try:
            ys, bad, steps, state = jax.block_until_ready(
                eng.run_raw_device(meta_d, lengths_d)
            )
        except Exception as e:  # compile failures: report and continue
            print(json.dumps({"config": name, "error": str(e)[:300]}),
                  flush=True)
            cfg["name"] = name
            continue
        compile_s = time.time() - t0
        nbad = int(np.asarray(bad).sum())
        times = []
        for _ in range(REPS):
            t0 = time.time()
            out = eng.run_raw_device(meta_d, lengths_d)
            # sync via host scalar fetch: tunnel block_until_ready can
            # return before the loop computation finishes
            int(np.asarray(out[1]).sum())
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        st = eng.last_stats
        st = (0, 0, 0) if st is None else np.asarray(st)
        row = {
            "config": name, **cfg, "bad": nbad,
            "rounds": int(st[0]), "services": int(st[1]),
            "steps": int(steps),
            "compile_s": round(compile_s, 1),
            "mbps": round(nbytes / med / 1e6, 2),
        }
        if hetero:
            meta_h, lengths_h, _ = eng.encoder.encode_batch(het)
            meta_hd = jax.block_until_ready(jnp.asarray(meta_h))
            lengths_hd = jax.block_until_ready(jnp.asarray(lengths_h))
            tms = []
            bad_h = 0
            for _ in range(max(3, REPS - 2)):
                t0 = time.time()
                out = eng.run_raw_device(meta_hd, lengths_hd)
                bad_h = int(np.asarray(out[1]).sum())  # completion sync
                tms.append(time.time() - t0)
            row["hetero_mbps"] = round(
                nbytes_h / sorted(tms)[len(tms) // 2] / 1e6, 2
            )
            row["hetero_bad"] = bad_h
            del meta_hd, lengths_hd
        print(json.dumps(row), flush=True)
        cfg["name"] = name


if __name__ == "__main__":
    main()
