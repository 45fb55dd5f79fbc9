"""Batched TPU transduce engine (XLA state machine).

Runs the reference's greedy single-backtrack transduce loop
(/root/reference matrix.go:383-697, datok.go:830-1135) as a *masked,
branchless* state machine over B independent input lanes:

  * one ``lax.while_loop`` iteration executes exactly one iteration of
    the reference's per-character loop for every lane in parallel —
    divergence (backtracks, retries, force-emits, epilogue) is handled
    with masks, not branches;
  * the transition table lives in HBM as a flat ``uint32`` array; the
    per-step work is two dependent gathers (transition + ε-probe), one
    gather of precomputed symbol metadata, and ~50 fused elementwise
    ops;
  * boundary events are emitted **scatter-free**: each lane emits at
    most one packed int32 event per step (``kind | start<<2 |
    end<<17``), written as one contiguous row into a step-indexed
    buffer via ``dynamic_update_slice`` — TPU scatters serialize per
    row on the scalar core and were 100×+ slower.  The rare steps that
    produce 2–3 events (EOT, epilogue flush) queue the extras in a
    2-deep pending register and drain them on following steps.

The host decodes the (steps, B) event buffer with vectorized numpy and
replays events through :class:`TokenWriter` for byte-identical output
(see :mod:`datok_tpu.runtime.events`).

Lanes that exceed the step budget are flagged and transparently re-run
through the scalar oracle by the pipeline — a correctness safety valve
that keeps the device kernel fixed-shape.  Packed positions carry 15
bits, so one engine call handles segments up to 32 K chars; longer
streams go through the segmentation layer.

Both runtime representations are supported: the dense matrix (validity
``cell != 0``, nontoken bit on the cell) and the double array
(validity ``t <= check(1) && check(t) == t0``, separate-state
representative hop), each as a small ``Rep`` adapter around the same
step function.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..fsa.io import FIRSTBIT, RESTBIT
from .encode import META_A_MASK, META_EOT, META_FOUND, META_NONASCII, SymbolEncoder
from .events import EV_SENT, EV_TEXT, EV_TOKEN

I32 = jnp.int32
U32 = jnp.uint32

# Packed-event layout: kind(2) | start(15) | end(15)
PACK_POS_BITS = 15
PACK_POS_MASK = (1 << PACK_POS_BITS) - 1
MAX_SEGMENT = PACK_POS_MASK - 2


class MatrixRep:
    """Dense-matrix transition semantics (matrix.go:442-463, 629)."""

    def __init__(self, tok):
        self.S = int(tok.state_count)
        self.eps = int(tok.epsilon)
        self.unknown = int(tok.unknown)
        self.identity = int(tok.identity)
        self.n_cells = len(tok.array)
        self.max_sym = self.n_cells // (self.S + 1) if self.S else 0
        self.tables = (np.asarray(tok.array, dtype=np.uint32),)

    def eps_avail(self, tables, t):
        (table,) = tables
        idx = (self.eps - 1) * self.S + t
        return jnp.take(table, idx, mode="fill", fill_value=0) != 0

    def transition(self, tables, t0, a):
        (table,) = tables
        a_ok = (a > 0) & (a <= self.max_sym)
        idx = (jnp.clip(a, 1, self.max_sym) - 1) * self.S + t0
        traw = jnp.take(table, idx, mode="fill", fill_value=0)
        traw = jnp.where(a_ok, traw, jnp.uint32(0))
        valid = traw != 0
        nontok = (traw & jnp.uint32(FIRSTBIT)) != 0
        t_next = (traw & jnp.uint32(RESTBIT | (1 << 30))).astype(I32)
        return valid, nontok, t_next


class DoubleArrayRep:
    """Base/check transition semantics (datok.go:876-901, 988-1063)."""

    def __init__(self, tok):
        self.eps = int(tok.epsilon)
        self.unknown = int(tok.unknown)
        self.identity = int(tok.identity)
        self.size = int(tok.check[1] & RESTBIT)
        self.n_cells = len(tok.base)
        self.tables = (
            np.asarray(tok.base, dtype=np.uint32),
            np.asarray(tok.check, dtype=np.uint32),
        )

    def eps_avail(self, tables, t):
        base, check = tables
        b0 = (jnp.take(base, t, mode="fill", fill_value=0) & jnp.uint32(RESTBIT)).astype(I32)
        tc = b0 + self.eps
        chk = (jnp.take(check, tc, mode="fill", fill_value=0) & jnp.uint32(RESTBIT)).astype(I32)
        return (tc < self.n_cells) & (chk == t)

    def transition(self, tables, t0, a):
        base, check = tables
        b0 = (jnp.take(base, t0, mode="fill", fill_value=0) & jnp.uint32(RESTBIT)).astype(I32)
        tc = b0 + a  # NOTE: no a==0 guard — bug-compatible with the reference
        in_rng = (tc >= 0) & (tc < self.n_cells)
        tc_c = jnp.clip(tc, 0, self.n_cells - 1)
        chk_raw = jnp.take(check, tc_c, mode="clip")
        chk_raw = jnp.where(in_rng, chk_raw, jnp.uint32(0))
        valid = (tc <= self.size) & in_rng & (
            (chk_raw & jnp.uint32(RESTBIT)).astype(I32) == t0
        )
        nontok = (chk_raw & jnp.uint32(FIRSTBIT)) != 0
        # separate-state hop to the representative (datok.go:1056-1063)
        b_t = jnp.take(base, tc_c, mode="clip")
        sep = (b_t & jnp.uint32(FIRSTBIT)) != 0
        t_next = jnp.where(sep, (b_t & jnp.uint32(RESTBIT)).astype(I32), tc)
        return valid, nontok, t_next


def make_rep(tok):
    return MatrixRep(tok) if tok.type() == "MATOK" else DoubleArrayRep(tok)


def _pack(kind, start, end):
    return kind | (start << 2) | (end << (2 + PACK_POS_BITS))


@functools.partial(
    jax.jit,
    static_argnames=("eps", "unknown", "identity", "rep", "max_steps"),
)
def _run_machine(tables, meta, length, *, eps, unknown, identity, rep, max_steps):
    """Run the masked transduce machine until all lanes finish.

    meta: (B, L) int32 packed symbol metadata; length: (B,) int32.
    Returns (ys (max_steps, B) int32 packed events, bad (B,) bool,
    steps used).
    """
    B, L = meta.shape

    def cond(carry):
        return (carry["steps"] < max_steps) & jnp.any(
            (carry["phase"] == 0) | (carry["pend"] != 0)
        )

    def step(carry):
        t = carry["t"]
        t0 = carry["t0"]
        a = carry["a"]
        ok = carry["ok"]
        eot = carry["eot"]
        newchar = carry["newchar"]
        eps_s = carry["eps_s"]
        eps_o = carry["eps_o"]
        c = carry["c"]
        b = carry["b"]
        ft = carry["ft"]
        sflag = carry["sflag"]
        tflag = carry["tflag"]
        phase = carry["phase"]
        pend = carry["pend"]
        pend2 = carry["pend2"]
        ys = carry["ys"]

        # Lanes with queued events drain one per step and do nothing else.
        m_drain = pend != 0
        run = (phase == 0) & ~m_drain
        m_new = run & newchar
        m_eof = m_new & (c >= length)
        m_read = m_new & ~m_eof
        m_old = run & ~newchar

        # ---- newchar: fetch precomputed symbol metadata ----------------
        cc = jnp.clip(c, 0, L - 1)
        m = jnp.take_along_axis(meta, cc[:, None], axis=1)[:, 0]
        a_new = m & META_A_MASK
        found_new = (m & META_FOUND) != 0
        nonascii_new = (m & META_NONASCII) != 0
        eot_new = (m & META_EOT) != 0

        # stale-ok: only the non-ASCII path reassigns ok (matrix.go:426-434)
        ok = jnp.where(m_read, jnp.where(nonascii_new, found_new, ok), ok)
        a = jnp.where(m_read, a_new, a)
        eot = jnp.where(m_read, eot_new, eot)
        t0 = jnp.where(m_read, t, t0)

        # ε availability probe / epilogue chase share one lookup on t
        eps_here = rep.eps_avail(tables, t)
        probe = m_read & eps_here
        eps_s = jnp.where(probe, t, eps_s)
        eps_o = jnp.where(probe, c, eps_o)

        # ---- transition attempt ---------------------------------------
        m_trans = m_read | m_old
        valid, nontok, t_succ = rep.transition(tables, t0, a)

        m_fail = m_trans & ~valid
        f1 = m_fail & ~ok & (a == identity)
        f2 = m_fail & ~f1 & (a != eps) & (eps_s != 0)
        f3 = m_fail & ~f1 & ~f2

        m_succ = m_trans & valid
        is_eps = a == eps
        has_pending = (c - b) > ft
        flush = m_succ & is_eps & has_pending
        sent = m_succ & is_eps & ~has_pending
        cons = m_succ & ~is_eps

        c_cons = jnp.where(cons, c + 1, c)
        f3_bump = f3 & ((c - b) - ft <= 0)
        c_f3 = jnp.where(f3_bump, c + 1, c)

        # leading nontoken drop (matrix.go:579-591)
        lead = cons & ((c_cons - b) - ft == 1) & nontok
        ft_cons = jnp.where(lead, ft + 1, ft)

        # EOT handling after the consume/eps branch (matrix.go:593-605)
        sflag1 = jnp.where(flush, False, jnp.where(sent, True, sflag))
        tflag1 = jnp.where(flush, False, tflag)
        e_m = m_succ & eot
        sent2 = e_m & ~sflag1
        sflag2 = sflag1 | sent2
        tflag2 = jnp.where(e_m, True, tflag1)
        rewind = flush | e_m

        # ---- epilogue entry (EOF break, matrix.go:637-697) -------------
        echase = m_eof & eps_here
        ebt = m_eof & ~eps_here & (eps_s != 0)
        efin = m_eof & ~eps_here & (eps_s == 0)
        resid = efin & has_pending
        sflag_e = jnp.where(resid, False, sflag)
        tflag_e = jnp.where(resid, False, tflag)
        efin_sent = efin & ~sflag_e
        efin_text = efin & ~tflag_e

        # ---- event emission (candidates are always ordered T, S, X) ----
        w_tok = flush | f3 | resid
        w_sent = sent | sent2 | efin_sent
        w_text = e_m | efin_text
        tok_start = b + ft
        tok_end = jnp.where(f3, c_f3, c)
        sent_pos = jnp.where(sent2, c_cons, c)
        text_pos = jnp.where(e_m, c_cons, c)

        v_tok = _pack(EV_TOKEN, tok_start, tok_end)
        v_sent = _pack(EV_SENT, sent_pos, sent_pos)
        v_text = _pack(EV_TEXT, text_pos, text_pos)

        first = jnp.where(
            w_tok, v_tok, jnp.where(w_sent, v_sent, jnp.where(w_text, v_text, 0))
        )
        second = jnp.where(
            w_tok & w_sent, v_sent, jnp.where((w_tok | w_sent) & w_text, v_text, 0)
        )
        third = jnp.where(w_tok & w_sent & w_text, v_text, 0)

        emit = jnp.where(m_drain, pend, first)
        pend_new = jnp.where(m_drain, pend2, jnp.where(run, second, pend))
        pend2_new = jnp.where(m_drain, 0, jnp.where(run, third, pend2))

        ys = jax.lax.dynamic_update_slice(
            ys, emit.astype(I32)[None, :], (carry["steps"], 0)
        )

        # ---- merge state updates (paths are disjoint) -------------------
        # NB: f2/ebt read the post-probe backtrack register, like the
        # reference (the probe and the failing transition share an
        # iteration, matrix.go:442-497).
        bt_state = eps_s
        bt_off = eps_o

        t_new = jnp.where(f3, 1, jnp.where(m_succ, t_succ, t))
        t0_new = jnp.where(f2 | ebt, bt_state, jnp.where(echase, t, t0))
        a_new2 = jnp.where(f1, unknown, jnp.where(f2 | f3 | echase | ebt, eps, a))
        c_new = jnp.where(
            f2 | ebt, bt_off, jnp.where(f3, c_f3, jnp.where(m_succ, c_cons, c))
        )
        b_new = jnp.where(f3, c_f3, jnp.where(m_succ & rewind, c_cons, b))
        ft_new = jnp.where(f3 | (m_succ & rewind), 0, jnp.where(cons, ft_cons, ft))
        eps_s_new = jnp.where(f2 | f3 | ebt | (m_succ & rewind), 0, eps_s)
        eps_o_new = jnp.where(m_succ & rewind, 0, eps_o)
        newchar_new = jnp.where(
            f1 | f2 | echase | ebt, False, jnp.where(f3 | m_succ, True, newchar)
        )
        eot_new2 = jnp.where(f1 | f2 | m_succ, False, eot)
        sflag_new = jnp.where(f3, False, jnp.where(m_succ, sflag2, sflag))
        tflag_new = jnp.where(f3, False, jnp.where(m_succ, tflag2, tflag))
        phase_new = jnp.where(efin, 1, phase)

        return {
            "t": t_new,
            "t0": t0_new,
            "a": a_new2,
            "ok": ok,
            "eot": eot_new2,
            "newchar": newchar_new,
            "eps_s": eps_s_new,
            "eps_o": eps_o_new,
            "c": c_new,
            "b": b_new,
            "ft": ft_new,
            "sflag": sflag_new,
            "tflag": tflag_new,
            "phase": phase_new,
            "pend": pend_new,
            "pend2": pend2_new,
            "ys": ys,
            "steps": carry["steps"] + 1,
        }

    zeros = jnp.zeros(B, I32)
    fb = jnp.zeros(B, bool)
    init = {
        "t": jnp.ones(B, I32),
        "t0": jnp.ones(B, I32),
        "a": zeros,
        "ok": fb,
        "eot": fb,
        "newchar": jnp.ones(B, bool),
        "eps_s": zeros,
        "eps_o": zeros,
        "c": zeros,
        "b": zeros,
        "ft": zeros,
        "sflag": fb,
        "tflag": fb,
        "phase": zeros,
        "pend": zeros,
        "pend2": zeros,
        "ys": jnp.zeros((max_steps, B), I32),
        "steps": jnp.int32(0),
    }
    out = jax.lax.while_loop(cond, step, init)
    bad = (out["phase"] == 0) | (out["pend"] != 0)
    return out["ys"], bad, out["steps"]


def decode_events(ys: np.ndarray, n_steps: int, lane: int) -> List[Tuple[int, int, int]]:
    """Decode one lane's packed events (host side, numpy)."""
    col = ys[:n_steps, lane]
    nz = col[col != 0].astype(np.uint32)
    kinds = (nz & 3).astype(int)
    starts = ((nz >> 2) & PACK_POS_MASK).astype(int)
    ends = ((nz >> (2 + PACK_POS_BITS)) & PACK_POS_MASK).astype(int)
    return list(zip(kinds.tolist(), starts.tolist(), ends.tolist()))


def decode_events_batch(ys: np.ndarray, n_steps: int) -> List[List[Tuple[int, int, int]]]:
    """Vectorized decode of all lanes' packed event streams."""
    sub = ys[:n_steps].T  # (B, steps) — row-major per lane, step order
    mask = sub != 0
    counts = mask.sum(axis=1)
    flat = sub[mask].astype(np.uint32)
    kinds = (flat & 3).astype(int)
    starts = ((flat >> 2) & PACK_POS_MASK).astype(int)
    ends = ((flat >> (2 + PACK_POS_BITS)) & PACK_POS_MASK).astype(int)
    triples = list(zip(kinds.tolist(), starts.tolist(), ends.tolist()))
    out = []
    off = 0
    for n in counts.tolist():
        out.append(triples[off : off + n])
        off += n
    return out


class BatchEngine:
    """Host-facing batched tokenization engine.

    Wraps a tokenizer (matrix or double array) into a jitted device
    state machine plus host-side formatting with oracle fallback.
    """

    def __init__(self, tok, steps_factor: float = 2.0):
        self.tok = tok
        self.rep = make_rep(tok)
        self.encoder = SymbolEncoder(tok)
        self.steps_factor = steps_factor
        self.tables = tuple(jnp.asarray(t) for t in self.rep.tables)

    def max_steps_for(self, L: int) -> int:
        return int(self.steps_factor * L) + 64

    def run_raw(self, meta: np.ndarray, lengths: np.ndarray):
        """Run the device machine; returns (ys, bad, n_steps) numpy."""
        B, L = meta.shape
        if L > MAX_SEGMENT:
            raise ValueError(
                f"segment length {L} exceeds packed-event limit {MAX_SEGMENT}; "
                "use the segmentation pipeline for longer streams"
            )
        ys, bad, steps = _run_machine(
            self.tables,
            jnp.asarray(meta),
            jnp.asarray(lengths),
            eps=self.rep.eps,
            unknown=self.rep.unknown,
            identity=self.rep.identity,
            rep=self.rep,
            max_steps=self.max_steps_for(L),
        )
        return np.asarray(ys), np.asarray(bad), int(steps)

    def events_batch(self, texts: Sequence[str]) -> List[List[Tuple[int, int, int]]]:
        """Boundary events per text (device path, oracle fallback)."""
        from .oracle import transduce_events

        if not texts:
            return []
        meta, lengths, _cps = self.encoder.encode_batch(texts)
        ys, bad, n_steps = self.run_raw(meta, lengths)
        decoded = decode_events_batch(ys, n_steps)
        out = []
        for i, text in enumerate(texts):
            if bad[i]:
                out.append(transduce_events(self.tok, text))
            else:
                out.append(decoded[i])
        return out

    def tokenize_batch(self, texts: Sequence[str], flags: Optional[int] = None) -> List[str]:
        from .events import format_events
        from .writer import SIMPLE

        fl = SIMPLE if flags is None else flags
        return [
            format_events(evs, text, fl)
            for text, evs in zip(texts, self.events_batch(texts))
        ]
