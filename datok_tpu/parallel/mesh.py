"""Mesh-sharded batch tokenization.

The reference scales by running one OS process per file (SURVEY.md
§2.3 — no in-process parallelism at all).  The TPU-native design
replaces that with SPMD over a ``jax.sharding.Mesh``:

  * corpus lanes are **data-parallel** across devices (the ``data``
    mesh axis) — each device transduces its shard of the segment batch;
  * the transition table is **replicated** (12.6 MB for the DE matrix —
    trivial HBM cost, no tensor parallelism needed, matching
    BASELINE.json's design);
  * per-shard token/sentence/text/byte counters reduce with ``psum``
    over ICI — the only collective this workload needs (the model is
    read-only, so there is no parameter synchronization at all).

Device placement uses ``NamedSharding``; the jitted state machine is
partitioned by GSPMD along the lane axis (every per-lane register is a
``(B,)`` array, so the partition is trivial and communication-free
until the final counter reduction).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime.encode import SymbolEncoder
from ..runtime.events import EV_SENT, EV_TEXT, EV_TOKEN
from ..runtime.jax_engine import _run_machine, decode_events_batch, make_rep


@functools.partial(jax.jit, static_argnames=("eps", "unknown", "identity", "rep", "max_steps"))
def _run_with_stats(tables, meta, length, *, eps, unknown, identity, rep, max_steps):
    ys, bad, steps, state = _run_machine(
        tables, meta, length, jnp.ones(meta.shape[0], jnp.int32),
        eps=eps, unknown=unknown, identity=identity,
        rep=rep, max_steps=max_steps,
    )
    # Global corpus statistics — with sharded inputs these sums are
    # all-reduced over ICI by GSPMD (the psum analog of SURVEY §5).
    kinds = ys & 3
    tokens = jnp.sum(kinds == EV_TOKEN)
    sents = jnp.sum(kinds == EV_SENT)
    texts = jnp.sum(kinds == EV_TEXT)
    chars = jnp.sum(length)
    return ys, bad, steps, jnp.stack([tokens, sents, texts, chars]), state


class ShardedEngine:
    """Data-parallel tokenization over a device mesh.

    Drop-in equivalent of :class:`BatchEngine` that shards the lane
    dimension over ``mesh`` and replicates the transition table.
    """

    def __init__(self, tok, mesh: Optional[Mesh] = None, steps_factor: float = 2.0):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("data",))
        self.mesh = mesh
        self.tok = tok
        self.rep = make_rep(tok)
        self.encoder = SymbolEncoder(tok)
        self.steps_factor = steps_factor
        self.n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

        repl = NamedSharding(mesh, P())
        self.tables = tuple(jax.device_put(t, repl) for t in self.rep.tables)
        self.lane_sharding = NamedSharding(mesh, P("data"))
        self.batch_sharding = NamedSharding(mesh, P("data", None))

    def pad_batch(self, meta: np.ndarray, lengths: np.ndarray):
        """Pad the lane count to a multiple of the shard count."""
        B = meta.shape[0]
        rem = (-B) % self.n_shards
        if rem:
            meta = np.pad(meta, ((0, rem), (0, 0)))
            lengths = np.pad(lengths, (0, rem))
        return meta, lengths, B

    def run_raw(self, meta: np.ndarray, lengths: np.ndarray):
        meta, lengths, B = self.pad_batch(meta, lengths)
        L = meta.shape[1]
        max_steps = int(self.steps_factor * L) + 64
        meta_d = jax.device_put(jnp.asarray(meta), self.batch_sharding)
        len_d = jax.device_put(jnp.asarray(lengths), self.lane_sharding)
        ys, bad, steps, stats, state = _run_with_stats(
            self.tables, meta_d, len_d,
            eps=self.rep.eps, unknown=self.rep.unknown,
            identity=self.rep.identity, rep=self.rep,
            max_steps=max_steps,
        )
        self._last_state = np.asarray(state)[:B]
        return (
            np.asarray(ys)[:, :B],
            np.asarray(bad)[:B],
            int(steps),
            np.asarray(stats),
        )

    def events_batch(self, texts: Sequence[str]):
        from ..runtime.oracle import transduce_events_fast

        if not texts:
            return []
        meta, lengths, _ = self.encoder.encode_batch(texts)
        ys, bad, n_steps, _stats = self.run_raw(meta, lengths)
        decoded = decode_events_batch(ys, n_steps)
        out = []
        for i, text in enumerate(texts):
            if bad[i]:
                out.append(transduce_events_fast(self.tok, text))
            else:
                out.append(decoded[i])
        return out

    def tokenize_batch(self, texts: Sequence[str], flags: Optional[int] = None) -> List[str]:
        from ..runtime.events import format_events
        from ..runtime.writer import SIMPLE

        fl = SIMPLE if flags is None else flags
        return [
            format_events(evs, text, fl)
            for text, evs in zip(texts, self.events_batch(texts))
        ]

    def corpus_stats(self, texts: Sequence[str]) -> dict:
        """Tokenize a corpus and return globally-reduced counters."""
        meta, lengths, _ = self.encoder.encode_batch(texts)
        _ys, bad, _n, stats = self.run_raw(meta, lengths)
        state = self._last_state
        # Padding lanes are empty texts and emit one sentence-end and
        # one text-end each; discount them from the global counters.
        pad = (-len(texts)) % self.n_shards
        return {
            "tokens": int(stats[0]),
            "sentences": int(stats[1]) - pad,
            "texts": int(stats[2]) - pad,
            "chars": int(stats[3]),
            "backtracks": int(state[:, 4].sum()),
            "force_emits": int(state[:, 5].sum()),
            "fallback_lanes": int(bad.sum()),
            "shards": self.n_shards,
        }
