#!/usr/bin/env python
"""Per-wave hot-spec A/B probe across the four workload families.

WORKLOAD = uniform | rotated | mixed | novel; PER_WAVE=1 switches the
engine to a census-built per-wave spec (jax_engine.wave_spec).  Census
+ spec build + table upload are timed separately (`prep_s`) — in the
wave pipeline they ride the prep thread and overlap device time; in
this raw probe they are once-per-batch costs against ~100 ms device
runs.  Timing syncs via a host scalar fetch (tunnel-safe, BENCH_LOG
timing-sync note).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_TEXT, BENCH_TEXT_EN  # noqa: E402
from probe_hetero_mixed import hetero_texts  # noqa: E402
from probe_novel import novel_texts  # noqa: E402

# persistent XLA compile cache: fresh-process compiles of the big
# machines drop 554 s -> 18-60 s through the dev tunnel (BENCH_LOG r5)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
)

B = int(os.environ.get("BENCH_LANES", "32768"))
L = int(os.environ.get("BENCH_LEN", "1024"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
WORKLOAD = os.environ.get("WORKLOAD", "mixed")


def make_texts():
    if WORKLOAD == "uniform_en":
        base = (BENCH_TEXT_EN * (L // len(BENCH_TEXT_EN) + 1))[: L - 2]
        return [base + ".\x04"] * B
    if WORKLOAD == "uniform":
        base = (BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2]
        return [base + ".\x04"] * B
    if WORKLOAD == "rotated":
        base = (BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2]
        return [
            (base[(i * 131) % (L - 2):] + base[: (i * 131) % (L - 2)])
            + ".\x04"
            for i in range(B)
        ]
    if WORKLOAD == "mixed":
        t = hetero_texts(B, L)
        if os.environ.get("SORTSTEPS"):
            # sort lanes by EXACT step count (native walk per doc):
            # the kernel convoys per BL-block on steps, not chars —
            # run-skipping makes char length a noisy proxy
            import datok_tpu as dt
            from datok_tpu.runtime.jax_engine import BatchEngine
            from datok_tpu.utils.native import native_cold_rate

            tok = dt.load_matrix_file(
                "/root/reference/testdata/tokenizer_de.matok"
            )
            eng = BatchEngine(tok, engine="hot")
            import numpy as np
            mask = np.ones(eng.rep.S + 1, np.uint8)
            import time as _t
            t0 = _t.time()
            keys = []
            for d in t:
                m = eng.encoder.encode(
                    np.frombuffer(d.encode("utf-32-le"), dtype=np.int32)
                )
                r = native_cold_rate(tok, m, mask)
                keys.append(r[1] if r else len(d))
            print(f"# step-sort walk: {_t.time()-t0:.1f}s",
                  file=sys.stderr)
            return [d for _, d in sorted(zip(keys, t), key=lambda p: p[0])]
        return (sorted(t, key=len)
                if os.environ.get("SORTLEN", "1") not in ("", "0") else t)
    if WORKLOAD == "mixed_packed":
        # greedy-pack whole \x04-terminated docs into ≤L−2-char lanes:
        # stream-exact per lane, fills the lane bytes the plain mixed
        # batch wastes.  Round 4 measured packing NET NEGATIVE (cold
        # stalls amplified with lane length); per-wave specs remove
        # that amplification — this workload re-tests the call.
        docs = hetero_texts(B, L)
        lanes, cur = [], ""
        for d in docs:
            if len(cur) + len(d) <= L - 2:
                cur += d
            else:
                if cur:
                    lanes.append(cur)
                cur = d[: L - 2]
        if cur:
            lanes.append(cur)
        return sorted(lanes, key=len)
    if WORKLOAD == "novel":
        return novel_texts(B, L)
    raise SystemExit(f"unknown WORKLOAD {WORKLOAD}")


def main():
    import jax
    import jax.numpy as jnp

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    model = os.environ.get(
        "MODEL", "en" if WORKLOAD.endswith("_en") else "de"
    )
    tok = dt.load_matrix_file(
        f"/root/reference/testdata/tokenizer_{model}.matok"
    )
    texts = make_texts()
    nbytes = sum(len(t.encode()) for t in texts)
    kw = {}
    for env, key, cast in (
        ("HOT", "hot_size", int), ("PRING", "kernel_pring", int),
        ("POOL", "kernel_pool", int), ("KK", "kernel_k", int),
        ("CH", "kernel_ch", int), ("INJQ", "kernel_injq", int),
        ("WGRP", "kernel_wgrp", int), ("BL", "kernel_bl", int),
        ("INJB", "kernel_inj_budget", float),
    ):
        if os.environ.get(env):
            kw[key] = cast(os.environ[env])
    eng = BatchEngine(tok, per_wave=bool(os.environ.get("PER_WAVE")), **kw)

    prep_s = 0.0
    wspec = None
    enc = eng.encoder
    if eng.per_wave:
        t0 = time.time()
        wspec = eng.wave_spec(texts)
        if wspec is eng.spec:
            wspec = None
        else:
            enc = eng.encoder_for(wspec)
        prep_s = time.time() - t0

    meta, lengths, _ = enc.encode_batch(texts)
    if meta.shape[1] < L:
        meta = np.pad(meta, ((0, 0), (0, L - meta.shape[1])))
    meta_d = jax.block_until_ready(jnp.asarray(meta))
    lengths_d = jax.block_until_ready(jnp.asarray(lengths))
    t0 = time.time()
    out = eng.run_raw_device(meta_d, lengths_d, spec=wspec)
    int(np.asarray(out[1]).sum())
    compile_s = time.time() - t0
    times = []
    for _ in range(REPS):
        t0 = time.time()
        out = eng.run_raw_device(meta_d, lengths_d, spec=wspec)
        int(np.asarray(out[1]).sum())
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    st = (np.asarray(eng.last_stats) if eng.last_stats is not None
          else np.zeros(3, np.int32))
    ncold = 0
    if wspec is not None:
        counts = eng.census_states(texts)
        if counts is not None:
            hotmask = np.zeros(len(counts), bool)
            hotmask[wspec.hot_full] = True
            ncold = float(counts[~hotmask].sum() / max(counts.sum(), 1))
    print(json.dumps({
        "workload": WORKLOAD,
        "per_wave": bool(wspec is not None),
        "config": {k: os.environ[k] for k in
                   ("HOT", "PRING", "POOL", "KK", "CH", "INJQ",
                    "WGRP", "BL", "INJB")
                   if k in os.environ},
        "H": int((wspec or getattr(eng, "spec", None)).H),
        "bad": int(np.asarray(out[1]).sum()),
        "rounds": int(st[0]), "services": int(st[1]),
        "steps": int(out[2]),
        "cold_rate_vs_spec": round(ncold, 5),
        "prep_s": round(prep_s, 4),
        "compile_s": round(compile_s, 1),
        "mbps": round(nbytes / med / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
