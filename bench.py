#!/usr/bin/env python
"""Benchmark: tokenization MB/s per chip on the mixed-German workload.

Prints ONE JSON line with the headline metric plus secondary numbers:

  value        — uniform-batch device throughput (MB/s/chip): every
                 lane carries the reference's 1022-char mixed-German
                 bench text; conformance-guarded (device output must
                 equal the oracle's)
  hetero_mbps  — heterogeneous worst case: the SAME text rotated by a
                 per-lane offset, so lane speeds diverge and cold
                 transitions de-synchronize (the adversarial case for
                 batched FSA execution; real corpora sit between this
                 and uniform)
  e2e_mbps     — end-to-end host pipeline (UTF-8 str in RAM → native
                 encode → device machine → compacted-event fetch →
                 native wave formatting → output bytes) via the
                 overlapped pipeline.  CAVEAT: on this dev setup the
                 device↔host link is an ~25-40 MB/s network tunnel and
                 the event fetch is tunnel-bound; e2e_stage_mbps
                 reports each stage's standalone rate — on production
                 PCIe the pipeline runs at min(encode, device,
                 decode+format) of those.

Baseline: the reference's best logged single-core matrix transduce
rate on the same text — 23,678 ns for 758 bytes ≈ 32 MB/s
(BASELINE.md; datok_test.go:1396).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MBPS = 32.0

# The reference's benchmark text (matrix_test.go:13-21).
BENCH_TEXT = """Der Vorsitzende der Abk. hat gewählt. Gefunden auf wikipedia.org. Ich bin unter korap@ids-mannheim.de erreichbar.
Unsere Website ist https://korap.ids-mannheim.de/?q=Baum. Unser Server ist 10.0.10.51. Zu 50.4% ist es sicher.
Der Termin ist am 5.9.2018.
Ich habe die readme.txt heruntergeladen.
Ausschalten!!! Hast Du nicht gehört???
Ich wohne in der Weststr. und Du? Kupietz und Schmidt [2018]: Korpuslinguistik. Dieses verf***** Kleid! Ich habe die readme.txt heruntergeladen.
Er sagte: \"Es geht mir gut!\", daraufhin ging er. &quot;Das ist von C&A!&quot; Früher bzw. später ... Sie erreichte den 1. Platz!
Archive:  Ich bin kein zip. D'dorf Ku'damm Lu'hafen M'gladbach W'schaft.
Mach's macht's was'n ist's haste willste kannste biste kriegste."""


def _timed_device(eng, meta_d, lengths_d, reps):
    import jax

    times = []
    bad_total = 0
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(eng.run_raw_device(meta_d, lengths_d))
        times.append(time.time() - t0)
        bad_total += int(np.asarray(out[1]).sum())
    return float(np.median(times)), bad_total


def main():
    B = int(os.environ.get("BENCH_LANES", "32768"))
    L = int(os.environ.get("BENCH_LEN", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "7"))

    import jax
    import jax.numpy as jnp

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    eng = BatchEngine(tok)

    doc = (BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2] + ".\x04"
    texts = [doc] * B
    meta, lengths, _ = eng.encoder.encode_batch(texts)
    nbytes = sum(len(t.encode()) for t in texts)

    # single compile at the bench shape: warmup + conformance guard
    from datok_tpu.runtime.events import format_events
    from datok_tpu.runtime.jax_engine import decode_events_batch

    ys, bad, steps, state = jax.block_until_ready(
        eng.run_raw_device(meta, lengths)
    )
    n_steps = int(steps)
    assert int(np.asarray(bad).sum()) == 0, "fallback lanes in bench run"
    lane0 = np.asarray(ys[:n_steps, :1])
    evs = decode_events_batch(lane0, n_steps)[0]
    got = format_events(evs, doc)
    want = tok.tokenize(doc)
    assert got == want, "device/oracle mismatch on bench doc"

    # ---- uniform: device-complete throughput with pre-staged input
    # (the dev tunnel's host↔device link is ~30 MB/s and not part of
    # the chip's work; production hosts stream input/results over
    # PCIe, overlapped with compute) ---------------------------------
    meta_d = jax.block_until_ready(jnp.asarray(meta))
    lengths_d = jax.block_until_ready(jnp.asarray(lengths))
    dt_s, _ = _timed_device(eng, meta_d, lengths_d, reps)
    uniform_mbps = nbytes / dt_s / 1e6

    # ---- heterogeneous: same text rotated per lane -----------------
    het = [
        (doc[(i * 131) % (L - 2):-2] + doc[: (i * 131) % (L - 2)]) + ".\x04"
        for i in range(B)
    ]
    meta_h, lengths_h, _ = eng.encoder.encode_batch(het)
    nbytes_h = sum(len(t.encode()) for t in het)
    meta_hd = jax.block_until_ready(jnp.asarray(meta_h))
    lengths_hd = jax.block_until_ready(jnp.asarray(lengths_h))
    out = jax.block_until_ready(eng.run_raw_device(meta_hd, lengths_hd))
    assert int(np.asarray(out[1]).sum()) == 0, "fallback lanes (hetero)"
    dt_h, _ = _timed_device(eng, meta_hd, lengths_hd, max(3, reps - 2))
    hetero_mbps = nbytes_h / dt_h / 1e6

    # ---- end-to-end host pipeline ----------------------------------
    from datok_tpu.runtime.overlap import tokenize_stream_pipelined

    try:
        from datok_tpu.utils.native import NativeWriter

        writer_factory = lambda: NativeWriter(dt.SIMPLE)  # noqa: E731
    except Exception:
        writer_factory = lambda: dt.TokenWriter(dt.SIMPLE)  # noqa: E731

    e2e_mb = int(os.environ.get("BENCH_E2E_MB", "48"))
    n_docs = (e2e_mb << 20) // len(doc.encode())
    text = doc * n_docs
    e2e_bytes = len(text.encode())
    # warmup compile at the pipeline wave shape
    tokenize_stream_pipelined(
        tok, doc * 2048, engine=eng, writer=writer_factory(), lanes=16384
    )
    best = None
    stages = None
    for _ in range(2):
        st = {}
        w = writer_factory()
        t0 = time.time()
        tokenize_stream_pipelined(
            tok, text, engine=eng, writer=w, lanes=16384, stats=st
        )
        wall = time.time() - t0
        if best is None or wall < best:
            best, stages = wall, st
    e2e_mbps = e2e_bytes / best / 1e6
    stage_mbps = {
        k: round(e2e_bytes / max(stages[k], 1e-9) / 1e6, 1)
        for k in ("encode", "dispatch", "fetch", "decode", "format")
    }

    print(
        json.dumps(
            {
                "metric": "tokenize_de_matrix_throughput",
                "value": round(uniform_mbps, 2),
                "unit": "MB/s/chip",
                "vs_baseline": round(uniform_mbps / BASELINE_MBPS, 2),
                "hetero_mbps": round(hetero_mbps, 2),
                "e2e_mbps": round(e2e_mbps, 2),
                "e2e_stage_mbps": stage_mbps,
                "e2e_note": (
                    "dev-tunnel d2h (~25-40 MB/s) bounds the fetch "
                    "stage; production PCIe runs at min of the other "
                    "stages"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
