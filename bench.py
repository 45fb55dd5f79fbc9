#!/usr/bin/env python
"""Benchmark: tokenization MB/s per chip on the mixed-German workload.

Prints ONE JSON line with the headline metric plus secondary numbers:

  value        — uniform-batch device throughput (MB/s/chip) on the
                 PRODUCTION path (census-built per-wave hot spec, H
                 ladder): every lane carries the reference's 1022-char
                 mixed-German bench text; conformance-guarded (device
                 output must equal the oracle's).  uniform_base_mbps
                 keeps the engine-profile-spec A/B
  hetero_mbps  — heterogeneous worst case: the SAME text rotated by a
                 per-lane offset, so lane speeds diverge and cold
                 transitions de-synchronize (the adversarial case for
                 batched FSA execution; real corpora sit between this
                 and uniform)
  mixed_mbps   — mixed-length real text (conformance corpus cycled,
                 length-sorted lanes L/4..L): the realistic-corpus
                 number
  en_mbps      — EN model, uniform English bench text (same B, L)
  datok_mbps   — the committed `.datok` double-array model riding the
                 fused engine via the behavior-preserving to_matrix
  e2e_mbps     — end-to-end host pipeline (UTF-8 str in RAM → native
                 encode → device machine → compacted-event fetch →
                 native wave formatting → output bytes) via the
                 overlapped pipeline.  CAVEAT: on this dev setup the
                 device↔host link is an ~25-40 MB/s network tunnel and
                 the event fetch is tunnel-bound; e2e_stage_mbps
                 reports each stage's standalone rate — on production
                 PCIe the pipeline runs at min(encode, device,
                 decode+format) of those.
  host_scaling — per-stage host MB/s at worker counts MEASURED on
                 this box ([median, min, max] cells over N reps, plus
                 a forked-process A/B at the widest W);
                 e2e_measured_w{W} at each measured point, and
                 e2e_projected_mbps extrapolated only from the widest
                 measured per-worker rate (flagged when extrapolated)
  device_time_mbps — bytes over the profiler's device-timeline time
                 (kernel rounds + XLA glue, excluding the dev
                 tunnel's per-call dispatch that PCIe hosts don't
                 pay) — the production-host projection, emitted every
                 round
  hetero_mbps / mixed_mbps — production path: census-built per-wave
                 hot spec (jax_engine.wave_spec); *_base_mbps rows
                 keep the engine-profile-spec A/B

Flags (env/argv):
  --profile      capture a jax.profiler trace of one uniform run,
                 print kernel-body ns/lane-step vs the analytic VPU/
                 MXU speed-of-light (BENCH_LOG.md roofline) — the
                 one-command re-verification of the SOL claim
  BENCH_FAST=1   headline + hetero only (skip secondary models/e2e)

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

# persistent XLA compile cache: fresh-process compiles of the big
# machines drop 554 s -> 18-60 s through the dev tunnel (BENCH_LOG r5)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
)

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

# English bench text: EN-model machinery (clitics, months, honorifics,
# URLs) cycled like BENCH_TEXT; compiled from src/en/tokenizer.xfst
# constructs — original text, not copied from the reference.
BENCH_TEXT_EN = (
    "Don't you think they're ready? We'll see it by Jan. 3rd, won't we. "
    "I'm sure it's Mr. Smith's car -- he can't park there. "
    "Visit https://en.wikipedia.org/wiki/Token or mail info@example.org. "
    "Prof. Jones et al. published on Feb. 29, 2016 at www.example.com. "
    "The U.S.A. isn't the U.K.; approx. 50.4% agreed vs. 23% who didn't. "
    "Cats, dogs etc. cost $4.50 apiece in Oct. -- quite a lot, isn't it? "
)


def _timed_device(eng, meta_d, lengths_d, reps, spec=None):
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = eng.run_raw_device(meta_d, lengths_d, spec=spec)
        # sync via a host fetch of the bad-lane count: through the dev
        # tunnel, block_until_ready can return before the while-loop
        # computation finishes (observed: sub-ms "completions" of
        # 160 ms runs), so a D2H of a result scalar is the only
        # reliable completion barrier — and doubles as the
        # conformance guard
        nbad = int(np.asarray(out[1]).sum())
        times.append(time.time() - t0)
        assert nbad == 0, "fallback lanes"
    return float(np.median(times))


def _stage_device(eng, texts, encoder=None):
    """Pre-stage encoded inputs on device; return (meta_d, lengths_d,
    n_bytes).  ``encoder``: per-wave spec's encoder when set."""
    import jax
    import jax.numpy as jnp

    meta, lengths, _ = (encoder or eng.encoder).encode_batch(texts)
    meta_d = jax.block_until_ready(jnp.asarray(meta))
    lengths_d = jax.block_until_ready(jnp.asarray(lengths))
    nbytes = sum(len(t.encode()) for t in texts)
    return meta_d, lengths_d, nbytes


def _guard(eng, tok, doc):
    """Conformance guard: device output on ``doc`` == oracle."""
    import jax

    from datok_tpu.runtime.events import format_events
    from datok_tpu.runtime.jax_engine import decode_events_batch

    meta, lengths, _ = eng.encoder.encode_batch([doc] * eng.kernel_bl)
    ys, bad, steps, state = jax.block_until_ready(
        eng.run_raw_device(meta, lengths)
    )
    n_steps = int(steps)
    assert int(np.asarray(bad).sum()) == 0, "fallback lanes in guard"
    lane0 = np.asarray(ys[:n_steps, :1])
    evs = decode_events_batch(lane0, n_steps)[0]
    got = format_events(evs, doc)
    want = tok.tokenize(doc)
    assert got == want, "device/oracle mismatch on bench doc"
    return n_steps


def _bench_uniform(eng, tok, doc, B, reps):
    texts = [doc] * B
    meta_d, lengths_d, nbytes = _stage_device(eng, texts)
    dt_s = _timed_device(eng, meta_d, lengths_d, reps)
    return nbytes / dt_s / 1e6, (meta_d, lengths_d)


def _host_scaling(eng, doc, n_docs, device_mbps):
    """Per-stage host rates at MEASURED worker counts only, with
    stated spread, plus a process-isolation A/B.

    encode: dt_encode_batch (row-threaded C); decode:
    dt_decode_events (lane-threaded C); format:
    dt_writer_feed_wave_mt (chunk-threaded C at clean writer
    boundaries).  Every cell is a median of N timed runs after a
    warm-up, reported as [median, min, max] MB/s — round 4's single-
    shot cells showed 5× non-monotonic swings (decode W=2 = 292 vs
    W=1 = 950) that were pure scheduler noise on this 2-core box.
    W is capped at the CPU count: nothing here extrapolates.  The
    ``*_procs`` rows re-measure the widest W with forked PROCESSES
    (one chunk each, zero-copy fork inheritance) — evidence that the
    thread-mode numbers are not GIL artifacts (the C stages release
    the GIL; processes sidestep it entirely).

    ``e2e_measured_w{W}`` = min(encode[W], device, decode+format[W])
    at each MEASURED W.  ``e2e_projected_mbps`` extrapolates ONLY
    from the widest measured W's per-worker rate (which already
    embeds measured scaling efficiency) and is flagged
    ``projection_extrapolated`` when the chosen W exceeds what this
    box can measure.
    """
    from datok_tpu.utils.native import (NativeWriter, native_decode_events,
                                        native_encode_wave)

    import datok_tpu as dt

    docs = [doc] * n_docs
    nbytes = sum(len(d.encode()) for d in docs)
    cores = os.cpu_count() or 1
    ws = [w for w in (1, 2, 4, 8, 16) if w <= cores]

    # one device wave supplies realistic decode/format inputs
    ev, counts, bad, _state = eng.run_events_compact(
        *eng.encoder.encode_batch(docs)[:2]
    )
    assert not bad.any()
    scratch = {}
    native_encode_wave(eng.encoder, docs, scratch=scratch)  # warm scratch
    cps_flat = scratch["cps"]
    cps_offs = scratch["cps_offs"]
    cps_lens = scratch["cps_lens"]

    N = int(os.environ.get("BENCH_HOST_REPS", "9"))

    def rate(fn):
        fn()  # warm-up: thread-pool spin-up, page faults
        ts = []
        for _ in range(N):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        return [round(nbytes / t / 1e6, 1) for t in (med, ts[-1], ts[0])]

    out = {"cores": cores, "workers": ws, "reps": N,
           "cell": "[median, min, max] MB/s over reps",
           "encode": {}, "decode": {}, "format": {}}
    tri = native_decode_events(ev, counts, workers=cores)
    wtr = NativeWriter(dt.SIMPLE)
    for w in ws:
        out["encode"][str(w)] = rate(
            lambda: native_encode_wave(
                eng.encoder, docs, threads=w, scratch=scratch
            )
        )
        out["decode"][str(w)] = rate(
            lambda: native_decode_events(ev, counts, workers=w)
        )

        def fmt():
            # time the formatting C call only — the output stays in the
            # writer's C buffer (getvalue's UTF-8 decode is a consumer
            # concern and would swamp the stage rate)
            wtr.lib.dt_writer_reset_output(wtr.h)
            wtr.feed_wave(tri, counts, cps_flat, cps_offs, cps_lens,
                          workers=w)

        out["format"][str(w)] = rate(fmt)

    # ---- process-isolation A/B at the widest measured W ------------
    wmax = ws[-1]

    def in_procs(target):
        """Wall-time `target(chunk_index, n_chunks)` across wmax forked
        processes (zero-copy COW inheritance; children never touch
        jax)."""
        t0 = time.time()
        pids = []
        for i in range(wmax):
            pid = os.fork()
            if pid == 0:
                try:
                    target(i, wmax)
                finally:
                    os._exit(0)
            pids.append(pid)
        for pid in pids:
            os.waitpid(pid, 0)
        return time.time() - t0

    def rate_procs(target):
        in_procs(target)  # warm-up
        ts = sorted(in_procs(target) for _ in range(max(3, N // 2)))
        med = ts[len(ts) // 2]
        return [round(nbytes / t / 1e6, 1)
                for t in (med, ts[-1], ts[0])]

    def enc_chunk(i, n):
        sl = docs[i * len(docs) // n:(i + 1) * len(docs) // n]
        native_encode_wave(eng.encoder, sl, threads=1)

    def dec_chunk(i, n):
        B = len(counts)
        sl = slice(i * B // n, (i + 1) * B // n)
        native_decode_events(ev[sl], counts[sl], workers=1)

    try:
        out["encode_procs"] = {str(wmax): rate_procs(enc_chunk)}
        out["decode_procs"] = {str(wmax): rate_procs(dec_chunk)}
    except OSError as e:  # fork unavailable in some sandboxes
        out["procs_error"] = str(e)[:120]

    # ---- e2e at measured points only -------------------------------
    for w in ws:
        enc = out["encode"][str(w)][0]
        df = 1.0 / (1.0 / out["decode"][str(w)][0]
                    + 1.0 / out["format"][str(w)][0])
        out[f"e2e_measured_w{w}"] = round(min(enc, device_mbps, df), 1)

    # extrapolation from the widest MEASURED per-worker rates (embeds
    # the measured W=1→wmax scaling efficiency), clearly flagged
    encw = out["encode"][str(wmax)][0] / wmax
    dfw = 1.0 / (1.0 / out["decode"][str(wmax)][0]
                 + 1.0 / out["format"][str(wmax)][0]) / wmax
    chosen_w, proj = wmax, out[f"e2e_measured_w{wmax}"]
    for w in (1, 2, 4, 8, 16, 32):
        p = min(encw * w, device_mbps, dfw * w)
        chosen_w, proj = w, p
        if p >= 0.8 * device_mbps:
            break
    out["projected_w"] = chosen_w
    out["e2e_projected_mbps"] = round(proj, 1)
    out["projection_extrapolated"] = chosen_w > wmax
    out["note"] = (
        f"cells measured at W<={wmax} on this {cores}-core host; "
        "e2e_projected extrapolates linearly from the W="
        f"{wmax} per-worker rate and is marked extrapolated"
    )
    return out


def _profile(eng, meta_d, lengths_d, B, n_steps, nbytes, spec=None):
    """jax.profiler trace of one uniform run → kernel ns/lane-step vs
    the analytic speed-of-light (BENCH_LOG.md roofline)."""
    import glob
    import gzip

    import jax

    out_dir = "/tmp/datok_prof_bench"
    with jax.profiler.trace(out_dir):
        jax.block_until_ready(
            eng.run_raw_device(meta_d, lengths_d, spec=spec)
        )

    # The dev-tunnel profiler exposes device time at XLA-op
    # granularity: the machine's outer `while.N` (whole loop) and
    # `body.N` (sum of iterations: kernel rounds + per-round glue).
    # Mosaic custom-call granularity is not surfaced, so the roofline
    # uses body time — an UPPER bound on kernel-body ns/lane-step
    # (it includes ring build, pack/unpack, and injection gathers).
    body_us = 0.0
    while_us = 0.0
    device_us = 0.0
    traces = sorted(
        glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
    )
    if traces:
        with gzip.open(traces[-1], "rt") as f:
            data = json.load(f)
        dev_pids = {
            e["pid"]
            for e in data.get("traceEvents", [])
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))
        }
        for evt in data.get("traceEvents", []):
            if evt.get("ph") != "X" or "dur" not in evt:
                continue
            if evt.get("pid") not in dev_pids:
                continue
            name = evt.get("name", "")
            if name.startswith("body."):
                body_us += evt["dur"]
            elif name.startswith("while."):
                while_us += evt["dur"]
            elif name.startswith("jit_"):
                device_us += evt["dur"]

    spec = spec if spec is not None else eng.spec
    H = spec.H
    W = spec.C_pad if spec.cls_tab is not None else spec.A_pad
    if eng.kernel_pring:
        pring = eng.kernel_pring
    else:
        from datok_tpu.runtime.pallas_engine import PRING as pring
    # VPU-elem-op model (BENCH_LOG.md): one-hot build ~2H, ring tree
    # pring-1, two column trees 2(W-1), ~150 rows of step logic, at
    # ~0.96 T elem-ops/s; MXU 2·H·W int8 MACs at ~394 TOPS
    vpu_ops = 2 * H + (pring - 1) + 2 * (W - 1) + 150
    sol_ns = max(2 * H * W / 394e3, vpu_ops / 960.0)
    lane_steps = float(n_steps) * B
    meas_ns = (body_us * 1e3) / lane_steps if lane_steps else 0.0
    # device-time throughput: wall MB/s pays the dev tunnel's per-call
    # dispatch+sync (~20-25 ms/run); a production PCIe host pays ~none,
    # so bytes / device-time is the production-side projection
    dev_mbps = (
        round(nbytes / (device_us / 1e6) / 1e6, 2) if device_us else None
    )
    return {
        "device_mbps": dev_mbps,
        "trace_dir": out_dir,
        "device_ms": round(device_us / 1e3, 2),
        "while_ms": round(while_us / 1e3, 2),
        "body_ms": round(body_us / 1e3, 2),
        "steps": int(n_steps),
        "lanes": int(B),
        "ns_per_lane_step_upper": round(meas_ns, 3),
        "sol_ns_per_lane_step": round(sol_ns, 3),
        "pct_of_sol": round(100 * sol_ns / meas_ns, 1) if meas_ns else 0,
        "model": {"H": H, "W": W, "pring": pring,
                  "vpu_ops": int(vpu_ops)},
    }


def main():
    B = int(os.environ.get("BENCH_LANES", "32768"))
    L = int(os.environ.get("BENCH_LEN", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "7"))
    fast = os.environ.get("BENCH_FAST") == "1"
    do_profile = "--profile" in sys.argv

    import jax

    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    eng = BatchEngine(tok)

    doc = (BENCH_TEXT * (L // len(BENCH_TEXT) + 1))[: L - 2] + ".\x04"
    n_steps = _guard(eng, tok, doc)

    # ---- uniform: device-complete throughput with pre-staged input
    # (the dev tunnel's host↔device link is ~30 MB/s and not part of
    # the chip's work; production hosts stream input/results over
    # PCIe, overlapped with compute) ---------------------------------
    uniform_base, (meta_d, lengths_d) = _bench_uniform(
        eng, tok, doc, B, reps
    )
    # headline = the production path: census-built per-wave hot spec
    # (H ladder routes the uniform text to the narrow rung)
    texts_u = [doc] * B
    wsp_u = eng.wave_spec(texts_u)
    meta_w, lengths_w, nbytes_u = _stage_device(
        eng, texts_u, encoder=eng.encoder_for(wsp_u)
    )
    dt_u = _timed_device(eng, meta_w, lengths_w, reps, spec=wsp_u)
    uniform_mbps = nbytes_u / dt_u / 1e6
    result = {
        "metric": "tokenize_de_matrix_throughput",
        "value": round(uniform_mbps, 2),
        "unit": "MB/s/chip",
        "vs_baseline": round(uniform_mbps / BASELINE_MBPS, 2),
        "uniform_base_mbps": round(uniform_base, 2),
        "wave_rung_h": int(wsp_u.H),
    }

    # device-timeline rate (kernel rounds + XLA glue, excluding the
    # dev tunnel's per-call dispatch/sync that PCIe hosts don't pay):
    # machine-checked every round next to the wall number, and
    # measured on the SAME per-wave configuration as the headline
    prof = _profile(
        eng, meta_w, lengths_w, B, n_steps, nbytes_u, spec=wsp_u,
    )
    result["device_time_mbps"] = prof["device_mbps"]
    if do_profile:
        result["profile"] = prof
    del meta_w, lengths_w

    # ---- heterogeneous: same text rotated per lane -----------------
    # headline rows run the production path (census-built per-wave
    # hot spec); *_base rows keep the engine-spec A/B
    het = [
        (doc[(i * 131) % (L - 2):-2] + doc[: (i * 131) % (L - 2)]) + ".\x04"
        for i in range(B)
    ]
    meta_hd, lengths_hd, nbytes_h = _stage_device(eng, het)
    dt_h = _timed_device(eng, meta_hd, lengths_hd, max(3, reps - 2))
    result["hetero_base_mbps"] = round(nbytes_h / dt_h / 1e6, 2)
    del meta_hd, lengths_hd
    wsp_h = eng.wave_spec(het)
    meta_hd, lengths_hd, nbytes_h = _stage_device(
        eng, het, encoder=eng.encoder_for(wsp_h)
    )
    dt_h = _timed_device(eng, meta_hd, lengths_hd, max(3, reps - 2),
                         spec=wsp_h)
    result["hetero_mbps"] = round(nbytes_h / dt_h / 1e6, 2)
    del meta_hd, lengths_hd

    if not fast:
        # ---- mixed-length real text (conformance corpus cycled) ----
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_micro")
        )
        try:
            from probe_hetero_mixed import hetero_texts

            mixed = sorted(hetero_texts(B, L), key=len)
            meta_md, lengths_md, nbytes_m = _stage_device(eng, mixed)
            dt_m = _timed_device(eng, meta_md, lengths_md,
                                 max(3, reps - 2))
            result["mixed_base_mbps"] = round(nbytes_m / dt_m / 1e6, 2)
            del meta_md, lengths_md
            wsp_m = eng.wave_spec(mixed)
            meta_md, lengths_md, nbytes_m = _stage_device(
                eng, mixed, encoder=eng.encoder_for(wsp_m)
            )
            dt_m = _timed_device(eng, meta_md, lengths_md,
                                 max(3, reps - 2), spec=wsp_m)
            result["mixed_mbps"] = round(nbytes_m / dt_m / 1e6, 2)
            del meta_md, lengths_md
        except Exception as e:  # mixed probe is auxiliary
            result["mixed_mbps_error"] = str(e)[:200]

        # ---- mixed corpus through the WAVE PIPELINE ----------------
        # the raw-batch mixed number above dispatches lanes as given;
        # real corpora flow through waves_pipelined, whose lane
        # packing + length sorting recovers a large part of the gap —
        # the dispatch-stage rate is the device-side system number
        try:
            from datok_tpu.runtime.overlap import (
                tokenize_stream_pipelined,
            )
            from datok_tpu.utils.native import NativeWriter as _NW

            # doc count a multiple of the lane count and pack_len=0 so
            # every wave compiles at the same (16384, 1024) shape
            mtext = "".join(hetero_texts(32768, L))
            # warm the wave-shape compiles (L buckets × full lanes)
            tokenize_stream_pipelined(
                tok, "".join(hetero_texts(16384, L)), engine=eng,
                writer=_NW(dt.SIMPLE), lanes=16384, pack_len=0,
            )
            stt = {}
            tokenize_stream_pipelined(
                tok, mtext, engine=eng, writer=_NW(dt.SIMPLE),
                lanes=16384, stats=stt, pack_len=0,
            )
            result["mixed_pipeline"] = {
                "dispatch_mbps": round(
                    len(mtext.encode())
                    / max(stt["dispatch"], 1e-9) / 1e6, 1,
                ),
                "repairs": stt["repairs"],
                "docs": stt["docs"],
            }
        except Exception as e:
            result["mixed_pipeline_error"] = str(e)[:200]

        # ---- EN model ---------------------------------------------
        tok_en = dt.load_matrix_file(
            "/root/reference/testdata/tokenizer_en.matok"
        )
        eng_en = BatchEngine(tok_en)
        doc_en = (BENCH_TEXT_EN * (L // len(BENCH_TEXT_EN) + 1))[: L - 2] \
            + ".\x04"
        _guard(eng_en, tok_en, doc_en)
        texts_en = [doc_en] * B
        wsp_en = eng_en.wave_spec(texts_en)
        meta_e, lengths_e, nbytes_e = _stage_device(
            eng_en, texts_en, encoder=eng_en.encoder_for(wsp_en)
        )
        dt_e = _timed_device(eng_en, meta_e, lengths_e,
                             max(3, reps - 2), spec=wsp_en)
        result["en_mbps"] = round(nbytes_e / dt_e / 1e6, 2)
        del eng_en, meta_e, lengths_e

        # ---- .datok double array via to_matrix ---------------------
        tok_da = dt.load_datok_file(
            "/root/reference/testdata/tokenizer_de.datok"
        )
        eng_da = BatchEngine(tok_da)  # converts to the dense layout
        _guard(eng_da, eng_da.tok, doc)
        da_mbps, _ = _bench_uniform(eng_da, eng_da.tok, doc, B,
                                    max(3, reps - 2))
        result["datok_mbps"] = round(da_mbps, 2)
        del eng_da

        # ---- host-stage scaling + projected e2e --------------------
        # the device term of the projection is the device-TIMELINE
        # rate (production PCIe hosts don't pay the dev tunnel's
        # per-call dispatch, which dominates today's wall number)
        dev_term = result.get("device_time_mbps") or uniform_mbps
        result["host_scaling"] = _host_scaling(
            eng, doc, min(16384, B), dev_term
        )
        result["host_scaling"]["device_term"] = round(dev_term, 1)

        # ---- end-to-end host pipeline ------------------------------
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
        tokenize_stream_pipelined(
            tok, doc * 2048, engine=eng, writer=writer_factory(),
            lanes=16384,
        )
        best = None
        stages = None
        for _ in range(2):
            stt = {}
            w = writer_factory()
            t0 = time.time()
            tokenize_stream_pipelined(
                tok, text, engine=eng, writer=w, lanes=16384, stats=stt
            )
            wall = time.time() - t0
            if best is None or wall < best:
                best, stages = wall, stt
        result["e2e_mbps"] = round(e2e_bytes / best / 1e6, 2)
        result["e2e_stage_mbps"] = {
            k: round(e2e_bytes / max(stages[k], 1e-9) / 1e6, 1)
            for k in ("encode", "dispatch", "fetch", "decode", "format")
        }
        result["e2e_note"] = (
            "dev-tunnel d2h (~25-40 MB/s) bounds the fetch stage; "
            "production PCIe runs at min of the other stages — see "
            "host_scaling.e2e_projected_mbps"
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
