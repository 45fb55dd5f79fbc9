"""Overlapped end-to-end pipeline: encode ∥ device ∥ format.

The reference is a single synchronous loop (matrix.go:348-698); the
repo's wave pipeline (pipeline.py) was synchronous too — encode →
device → decode → format, stage by stage, so end-to-end throughput was
the *sum* of the stage times.  This module overlaps them:

* a **prep thread** assembles waves of documents, encodes them with
  the internally-threaded native encoder (GIL released), stages the
  wave on device and *dispatches* the machine + event compaction —
  JAX dispatch is asynchronous, so the device crunches wave N while
  the host encodes wave N+1;
* the **consumer** (the generator's caller) fetches wave N−1's
  compacted events (the only device→host traffic), verifies the
  entry-state chain, and formats — concurrently with both.

Steady-state end-to-end throughput is max(stage), not sum(stages).
Backpressure and buffer reuse come from a fixed ring of scratch
slots: a wave's encode buffers are reused only after its results are
consumed, so the 100+ MB meta arrays are page-faulted once per run,
not once per wave.

Exactness: every document is dispatched speculatively from the root
context (the reference semantics after an EOT, matrix.go:593-605).
For models where EOT provably returns to the root
(``eot_split_safe``) no verification is needed; otherwise the
consumer replays the chain — any document whose true entry context
(the previous document's exit) differs from the dispatched root is
re-transduced exactly on the host (native scalar loop), and the chain
continues from its corrected exit.  Device-reported fallback lanes
(``bad``) take the same host path.  This mirrors the speculation +
repair design of ``pipeline._run_docs`` with the verification moved
off the dispatch path.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

from .jax_engine import MAX_SEGMENT, BatchEngine, decode_events_compact
from .oracle import transduce_events_fast
from .writer import SIMPLE, TokenWriter


class _Wave:
    __slots__ = ("tags", "docs", "cps", "handles", "slot", "events",
                 "exits", "entries")

    def __init__(self, tags, docs, cps, handles, slot, entries,
                 events=None, exits=None):
        self.tags = tags
        self.docs = docs
        self.cps = cps
        self.handles = handles  # (ev_T, counts, bad, state) device arrays
        self.slot = slot
        self.entries = entries  # dispatched (predicted) entry contexts
        self.events = events  # precomputed (long-doc path)
        self.exits = exits  # precomputed exit contexts (long-doc path)


def _assemble(items, lanes, max_wave_chars):
    """Group (tag, doc) items into waves; oversize docs go alone."""
    batch: List = []
    chars = 0
    for tag, doc in items:
        if len(doc) > MAX_SEGMENT:
            if batch:
                yield ("wave", batch)
                batch, chars = [], 0
            yield ("long", [(tag, doc)])
            continue
        batch.append((tag, doc))
        chars += max(len(doc), 1)
        if len(batch) >= lanes or chars >= max_wave_chars:
            yield ("wave", batch)
            batch, chars = [], 0
    if batch:
        yield ("wave", batch)


def events_pipelined(
    engine: BatchEngine,
    items: Iterable[Tuple[object, str]],
    *,
    lanes: int = 8192,
    slots: int = 3,
    max_wave_chars: int = 32 << 20,
    long_seg_len: int = 8192,
) -> Iterator[Tuple[object, str, np.ndarray]]:
    """Yield ``(tag, doc, events[N,3] int32)`` in input order.

    ``items`` yields ``(tag, doc)`` pairs (the tag is passed through —
    callers use it to route output, e.g. a corpus file index).  Event
    positions are document-relative.  The generator owns a prep
    thread; closing it (``.close()``) or exhausting it joins the
    thread.
    """
    import jax
    import jax.numpy as jnp

    from .jax_engine import _compact_ys
    from .pipeline import events_speculative_batch, predict_entries

    try:
        from ..utils.native import native_encode_wave
    except ImportError:
        native_encode_wave = None

    q: "queue.Queue" = queue.Queue()
    free = queue.Queue()
    for i in range(max(2, slots)):
        free.put({})  # scratch dict per slot
    stop = threading.Event()
    err: List[BaseException] = []

    def prep():
        pred = 1  # prep-side predicted entry chain (host, cheap)
        try:
            for kind, batch in _assemble(items, lanes, max_wave_chars):
                if stop.is_set():
                    return
                tags = [t for t, _ in batch]
                docs = [d for _, d in batch]
                entries, pred = predict_entries(
                    engine.encoder, docs, entry=pred
                )
                if kind == "long":
                    # giant document: exact speculative segmentation
                    # (its own device waves + host cut verification)
                    evs, exits = events_speculative_batch(
                        engine, docs, seg_len=long_seg_len,
                        entries=entries,
                    )
                    evs = [
                        np.asarray(e, dtype=np.int32).reshape(-1, 3)
                        for e in evs
                    ]
                    q.put(_Wave(tags, docs, None, None, None, entries,
                                events=evs, exits=exits))
                    continue
                slot = free.get()  # backpressure: ring of reusable slots
                if stop.is_set():
                    return
                r = (
                    native_encode_wave(
                        engine.encoder, docs, scratch=slot
                    )
                    if native_encode_wave is not None
                    else None
                )
                if r is None:
                    r = engine.encoder.encode_batch(docs)
                meta, lengths, cps = r
                meta_d = jnp.asarray(meta)
                ys, bad, steps, state = engine.run_raw_device(
                    meta_d, lengths, entries=entries
                )
                n_steps = int(steps)
                S = 256
                while S < n_steps:
                    S *= 2
                S = min(S, ys.shape[0])
                ev_T, counts = _compact_ys(ys, S)
                q.put(
                    _Wave(tags, docs, cps, (ev_T, counts, bad, state),
                          slot, entries)
                )
        except BaseException as e:  # surfaced by the consumer
            err.append(e)
        finally:
            q.put(None)

    t = threading.Thread(target=prep, name="datok-prep", daemon=True)
    t.start()

    entry = 1  # TRUE packed entry context for the next document
    wave = None
    try:
        while True:
            wave = q.get()
            if wave is None:
                if err:
                    raise err[0]
                break
            if wave.events is not None:  # precomputed long docs
                for k, (tag, doc) in enumerate(zip(wave.tags, wave.docs)):
                    evs = wave.events[k]
                    if entry != int(wave.entries[k]):
                        box: List[int] = []
                        ev_l = transduce_events_fast(
                            engine.tok, doc, entry_state=int(entry),
                            exit_box=box,
                        )
                        evs = np.asarray(ev_l, dtype=np.int32).reshape(-1, 3)
                        entry = box[0] if box else 1
                    else:
                        entry = int(wave.exits[k])
                    yield tag, doc, evs
                continue
            ev_T, counts_d, bad_d, state_d = wave.handles
            counts = np.asarray(counts_d)
            cmax = int(counts.max()) if counts.size else 0
            E = 32
            while E < cmax:
                E *= 2
            E = min(E, ev_T.shape[1])
            ev = np.asarray(ev_T[:, :E])
            bad = np.asarray(bad_d)
            state = np.asarray(state_d)
            decoded = decode_events_compact(ev, counts, as_arrays=True)
            for k, (tag, doc) in enumerate(zip(wave.tags, wave.docs)):
                # the prediction dispatched for this doc must equal the
                # TRUE entry (previous doc's actual exit); mismatches
                # (rare: models whose EOT arcs leave the root) replay
                # exactly on the host and realign the chain
                if bad[k] or entry != int(wave.entries[k]):
                    box = []
                    ev_l = transduce_events_fast(
                        engine.tok, doc, entry_state=int(entry),
                        exit_box=box,
                    )
                    evs = np.asarray(ev_l, dtype=np.int32).reshape(-1, 3)
                    entry = box[0] if box else 1
                else:
                    evs = decoded[k]
                    entry = int(state[k, 0])
                yield tag, doc, evs
            free.put(wave.slot)  # buffers reusable from here on
            wave = None
    finally:
        stop.set()
        # drain so the prep thread can't block on a full slot ring
        if wave is not None and wave.slot is not None:
            free.put(wave.slot)
        try:
            while True:
                w = q.get_nowait()
                if w is not None and w.slot is not None:
                    free.put(w.slot)
        except queue.Empty:
            pass
        t.join(timeout=30)


def tokenize_stream_pipelined(
    tok,
    text: str,
    writer: Optional[TokenWriter] = None,
    *,
    engine: Optional[BatchEngine] = None,
    lanes: int = 8192,
    flags: Optional[int] = None,
) -> TokenWriter:
    """Overlapped-pipeline twin of :func:`pipeline.tokenize_stream`.

    Byte-identical output (parity pinned by tests); use for large
    streams where end-to-end wall clock matters.
    """
    from .encode import text_to_codepoints
    from .events import replay_events
    from .pipeline import split_documents

    w = writer if writer is not None else TokenWriter(
        SIMPLE if flags is None else flags
    )
    if engine is None:
        engine = BatchEngine(tok)
    docs = split_documents(text)
    feed = getattr(w, "feed", None)
    for _tag, doc, evs in events_pipelined(
        engine, ((None, d) for d in docs), lanes=lanes
    ):
        if feed is not None:
            feed(evs, text_to_codepoints(doc))
        else:
            replay_events([tuple(r) for r in evs.tolist()], doc, w)
    w.flush()
    return w
