"""Host orchestration: stream → lanes → events → formatted output.

The reference processes one stream with one goroutine (SURVEY.md §2.3);
production parallelism was "run many processes".  Here a stream is
split into documents at ``\\x04`` (EOT) boundaries — exact, because a
conforming tokenizer grammar returns to the root state after EOT
(verified per model: every EOT arc reachable in the table targets the
root) — and documents are transduced as parallel device lanes.  Events
are replayed in order through one TokenWriter, which reproduces the
reference's single-stream output byte for byte (including position
counters that persist across texts).

Documents longer than the packed-event segment limit fall back to the
scalar oracle (the segmentation/stitching layer handles them on
device in a later milestone).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..fsa.io import FIRSTBIT
from .events import replay_events
from .jax_engine import MAX_SEGMENT, BatchEngine
from .oracle import transduce_events_fast
from .writer import SIMPLE, TokenWriter


def split_documents(text: str) -> List[str]:
    """Split a stream into chunks, each ending just after an EOT."""
    out = []
    start = 0
    while True:
        i = text.find("\x04", start)
        if i < 0:
            break
        out.append(text[start : i + 1])
        start = i + 1
    if start < len(text) or not out:
        out.append(text[start:])
    return out


def eot_split_safe(tok) -> bool:
    """True if every EOT arc in the model targets the root state.

    This is the property that makes document splitting exact: after a
    chunk ending in ``\\x04`` the machine is in the same state a fresh
    chunk starts in.
    """
    cached = getattr(tok, "_eot_split_safe", None)
    if cached is not None:
        return cached
    safe = False
    if tok.type() == "MATOK":
        a = int(tok.sigma_ascii[4])
        if a > 0:
            S = tok.state_count
            col = np.asarray(tok.array[(a - 1) * S : (a - 1) * S + S + 1])
            targets = np.unique(col[col != 0] & ~np.uint32(FIRSTBIT))
            # every EOT arc targets the root, and the root accepts EOT
            # (so the never-fail retry path also converges to the root)
            safe = col[1] != 0 and set(targets.tolist()) <= {1}
    else:
        # double array: check every *reachable* state's EOT target
        # (unreachable cells can alias valid-looking transitions).
        from ..fsa.io import RESTBIT

        a = int(tok.sigma_ascii[4])
        if a > 0:
            base = np.asarray(tok.base, dtype=np.int64)
            check = np.asarray(tok.check, dtype=np.int64)
            size = int(check[1] & RESTBIT)
            n = len(base)
            A = max(max(tok.sigma.values(), default=0), tok.final) + 1
            sym = np.arange(1, A, dtype=np.int64)
            # the 'final' pseudo-symbol marks finality and is never a
            # runtime input — its cells are not states
            sym = sym[sym != tok.final]
            eot_pos = int(np.searchsorted(sym, a))

            seen = np.zeros(n, dtype=bool)
            seen[1] = True
            frontier = [1]
            finals = set()
            while frontier:
                nxt = []
                for s in frontier:
                    tc = (base[s] & RESTBIT) + sym
                    ok = (tc <= size) & (tc < n)
                    tcc = np.clip(tc, 0, n - 1)
                    valid = ok & ((check[tcc] & RESTBIT) == s)
                    tgts = tcc[valid]
                    sep = (base[tgts] & (1 << 31)) != 0
                    reps = np.where(sep, base[tgts] & RESTBIT, tgts)
                    if valid[eot_pos]:  # EOT arc from this state
                        te = int(tcc[eot_pos])
                        if base[te] & (1 << 31):
                            te = int(base[te] & RESTBIT)
                        finals.add(te)
                    for t in np.unique(reps):
                        t = int(t)
                        if 0 < t < n and not seen[t]:
                            seen[t] = True
                            nxt.append(t)
                frontier = nxt
            root_tc = (base[1] & RESTBIT) + a
            root_ok = (
                root_tc <= size
                and root_tc < n
                and (check[root_tc] & RESTBIT) == 1
            )
            safe = root_ok and finals <= {1}
    tok._eot_split_safe = safe
    return safe


def tokenize_stream(
    tok,
    text: str,
    writer: Optional[TokenWriter] = None,
    *,
    engine: Optional[BatchEngine] = None,
    accelerated: bool = True,
    max_lanes: int = 4096,
) -> TokenWriter:
    """Tokenize one stream through the batched device engine.

    The stream is split at EOT boundaries and transduced as parallel
    lanes *speculatively* (each chunk assumes root entry).  Exit states
    are verified against the next chunk's assumed entry: if a model
    ever leaves a non-root state after an EOT (possible — e.g. EOT can
    be consumed as an ignorable character), the affected chunks are
    re-run with the exact chained entry state until the chain is
    consistent.  This makes splitting exact for *any* model, with the
    statically-verified root-return property (``eot_split_safe``) as
    the fast path that skips verification entirely.

    Returns the writer (creating a ``SIMPLE`` one if none given).
    """
    w = writer if writer is not None else TokenWriter(SIMPLE)

    if engine is None:
        engine = BatchEngine(tok, accelerated=accelerated)

    docs = split_documents(text)
    n = len(docs)
    verified_safe = eot_split_safe(tok)

    entries = np.ones(n, dtype=np.int32)
    events: List = [None] * n
    exits = np.ones(n, dtype=np.int32)
    have = [False] * n
    rounds = 0

    while not all(have):
        rounds += 1
        if rounds > n + 2:  # defensive: should converge in <= n rounds
            for k in range(n):
                if not have[k]:
                    box: List[int] = []
                    events[k] = transduce_events_fast(
                        tok, docs[k], entry_state=int(entries[k]), exit_box=box
                    )
                    exits[k] = box[0] if box else 1
                    have[k] = True
            break
        todo = [k for k in range(n) if not have[k]]
        for gi in range(0, len(todo), max_lanes):
            group = todo[gi : gi + max_lanes]
            small = [k for k in group if len(docs[k]) <= MAX_SEGMENT]
            large = [k for k in group if len(docs[k]) > MAX_SEGMENT]
            if small:
                evs, exs = engine.events_batch(
                    [docs[k] for k in small],
                    entries=entries[small],
                    return_exits=True,
                )
                for k, ev, ex in zip(small, evs, exs):
                    events[k] = ev
                    exits[k] = ex
                    have[k] = True
            for k in large:
                box = []
                events[k] = transduce_events_fast(
                    tok, docs[k], entry_state=int(entries[k]), exit_box=box
                )
                exits[k] = box[0] if box else 1
                have[k] = True
        if verified_safe:
            break  # exits provably return to root; no chaining needed
        # verify the chain: a mismatched entry invalidates the successor
        for k in range(n - 1):
            if have[k] and exits[k] != entries[k + 1]:
                entries[k + 1] = exits[k]
                have[k + 1] = False

    for doc, evs in zip(docs, events):
        replay_events(evs, doc, w)
    return w
