"""Batched TPU transduce engine (XLA state machines).

Runs the reference's greedy single-backtrack transduce loop
(/root/reference matrix.go:383-697, datok.go:830-1135) as a *masked,
branchless* state machine over B independent input lanes: one loop
iteration executes exactly one iteration of the reference's
per-character loop for every lane in parallel — divergence
(backtracks, retries, force-emits, epilogue) is handled with masks,
not branches.

Two machines share one step-semantics factory:

**General machine** — transition/probe/meta fetched with ``jnp.take``.
TPU lowers dynamic gathers to a *serial* scalar-core loop (~40 ns per
element, measured), so this path is correct for any model but slow;
it is used for the double-array representation and as the *service
step* of the hot machine.

**Hot machine** (matrix representation) — exploits the measured fact
that the dynamic state working set of a tokenizer FST is tiny
(hundreds of states even on mixed corpus text).  Transitions through a
profiled hot set of H states are computed entirely on the MXU/VPU with
zero gathers:

  * the hot transition table is stored as three bf16 byte planes
    ``(A_pad, 3H)``; a one-hot of the input symbol row-selects via
    matmul (exact: byte values ≤ 255 are exact in bf16, accumulation
    in f32), and a mask-reduce over H selects the current state's
    column — no gather anywhere;
  * packed entries carry target (hot id or full state id), the
    nontoken flag, and the ε-availability of the *target*, so the
    per-char ε-probe becomes a carried register instead of a lookup;
  * per-lane input symbols come from a ring window of the transposed
    meta array refreshed by contiguous ``dynamic_slice`` — lanes that
    leave the window or reach a cold state simply *stall*;
  * every K steps (or when too many lanes stall) one general step runs
    with full serial gathers, advancing every lane exactly per the
    reference semantics and re-deriving hot ids — cold transitions are
    therefore exact, just amortized.

Boundary events are emitted **scatter-free** (TPU scatters serialize
per row; measured 100×+ cost): each lane emits at most one packed
int32 event per step (``kind | start<<2 | end<<17``) written as one
contiguous row into a step-indexed buffer, with a 2-deep pending queue
draining the rare multi-event steps.  The host decodes lanes with
vectorized numpy and replays events through :class:`TokenWriter` for
byte-identical output (see :mod:`datok_tpu.runtime.events`).

Lanes that exceed the step budget are flagged and transparently re-run
through the scalar oracle by the pipeline.  Packed positions carry 15
bits, so one engine call handles segments up to 32 K chars; longer
streams go through the segmentation layer.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..fsa.io import FIRSTBIT, RESTBIT
from .encode import (META_A_MASK, META_CLS_MASK, META_CLS_SHIFT, META_EOT,
                     META_FOUND, META_NONASCII, META_RUN_MASK,
                     META_RUN_SHIFT, SymbolEncoder, text_to_codepoints)
from .events import EV_SENT, EV_TEXT, EV_TOKEN

I32 = jnp.int32

# Packed-event layout: kind(2) | start(15) | end(15)
PACK_POS_BITS = 15
PACK_POS_MASK = (1 << PACK_POS_BITS) - 1
MAX_SEGMENT = PACK_POS_MASK - 2

# Hot-entry layout (3 byte planes = 24 bits):
#   bit0 valid | bit1 hot-target | bit2 nontoken | bit3 eps-at-target |
#   bit4 lowercase-self-loop-at-target |
#   bits5.. payload (hot id if hot-target else full state id)
_HE_VALID = 1
_HE_HOT = 2
_HE_NONTOK = 4
_HE_EPS = 8
_HE_LC = 16

# Tagged state encoding of the fused (Pallas) machine: registers hold
# TAG_HOT|hot_id or TAG_COLD|cold_id instead of full state ids, decoded
# only at service boundaries and machine exit.  TAG_EPSOF|hot_id is a
# *lazy* tag written by fused boundary steps: "the ε-target of hot
# state hot_id" — consuming it (a later backtrack, a segmentation
# resume) is rare and already routes through the service step / exit
# decode, where full tables resolve it exactly.
TAG_HOT = 1 << 24
TAG_COLD = 1 << 25
TAG_EPSOF = 1 << 26
TAG_MASK = TAG_HOT | TAG_COLD | TAG_EPSOF
PAYLOAD_MASK = 0x7FF

RING = 128  # meta ring window rows


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
        self.S = 0
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


def _bsel(c, x, y):
    """``jnp.where`` for *boolean-valued* operands.

    Mosaic cannot lower selects whose value operands are i1 vectors
    (it stores them as i8 masks and hits an unsupported i8→i1
    truncation), so boolean registers are updated with mask logic
    instead.  ``x`` may be a Python bool constant.
    """
    if x is True:
        return c | y
    if x is False:
        return ~c & y
    return (c & x) | (~c & y)


def _tree_select(x, idx):
    """out[b] = x[b, idx[b]] via a log2 select tree (no gather).

    XLA pattern-matches ``reduce(where(iota == idx, x, 0))`` over a
    loop-invariant operand into a dynamic-slice/gather, which TPUs
    execute serially per lane (~40 ns each, measured).  A binary select
    tree stays on the VPU.  ``x``: (B, n) with n a power of two.
    """
    n = x.shape[1]
    assert (n & (n - 1)) == 0, "tree select needs a power-of-two width"
    k = n // 2
    while k >= 1:
        bit = (idx & k) != 0
        x = jnp.where(bit[:, None], x[:, k : 2 * k], x[:, :k])
        k //= 2
    return x[:, 0]


def _tree_select_shared(vec, idx):
    """out[b] = vec[idx[b]] for a shared (n,) vector (power-of-two n)."""
    n = vec.shape[0]
    assert (n & (n - 1)) == 0
    k = n // 2
    bit = (idx & k) != 0
    x = jnp.where(bit[:, None], vec[None, k : 2 * k], vec[None, :k])
    k //= 2
    while k >= 1:
        bit = (idx & k) != 0
        x = jnp.where(bit[:, None], x[:, k : 2 * k], x[:, :k])
        k //= 2
    return x[:, 0]


def _make_step(
    *,
    eps,
    unknown,
    identity,
    fetch_meta,
    probe_fn,
    fetch_trans,
    aux_update,
    eps1,
    hid1,
    lc1=False,
    enable_skip=False,
    root_t=1,
    emit_fn=None,
    track_counts=True,
    unknown_cls=0,
    eps_cls=0,
):
    """Build one masked step of the reference loop.

    ``fetch_meta(carry) -> (meta int32 (B,), can (B,) bool)``
    ``probe_fn(carry) -> (B,) bool`` — ε availability at carry["t"]
    ``fetch_trans(carry, t0, t0_hid, a, a_cls) ->
        (can, valid, nontok, t_next, t_next_hid, eps_tgt)``
    ``aux_update(carry) -> carry`` — refresh hot-id/ε registers (service)
    ``eps1``/``hid1`` — ε-availability and hot id of the root state.
    ``root_t`` — encoding of the root state in the ``t`` register (the
    Pallas machine uses a tagged hot-id encoding, see pallas_engine).
    ``emit_fn(carry, emit) -> carry`` — event sink; the default writes
    row ``carry["steps"]`` of the carried ``ys`` buffer.
    ``unknown_cls``/``eps_cls`` — symbol-class ids of the unknown and ε
    symbols (HotSpec.cls_tab); the ``a_cls`` register shadows ``a``
    class-wise so the fused kernel can fetch by class (see encode.py
    META_CLS_*).  Machines without class compression leave them 0.
    """

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
        ckpt = carry["ckpt"]
        nbt = carry["n_backtrack"]
        nfe = carry["n_force"]
        hid = carry["hid"]
        t0_hid = carry["t0_hid"]
        eps_s_hid = carry["eps_s_hid"]
        length = carry["length"]

        # Lanes with queued events drain one per step and do nothing else.
        m_drain = pend != 0
        running = (phase == 0) & ~m_drain
        m_new0 = running & newchar
        m_end = m_new0 & (c >= length)
        # chained segmentation: cut lanes stop cleanly before the
        # epilogue — their full machine state is handed to the next
        # segment instead of flushing (SURVEY.md §5 long-context)
        m_cut = m_end & carry["stop"]
        m_eof = m_end & ~carry["stop"]
        m_read0 = m_new0 & ~m_end
        m_old0 = running & ~newchar

        # ---- newchar: fetch symbol metadata -----------------------------
        meta_v, can_meta = fetch_meta(carry)
        a_new = meta_v & META_A_MASK
        cls_new = (meta_v >> META_CLS_SHIFT) & META_CLS_MASK
        found_new = (meta_v & META_FOUND) != 0
        nonascii_new = (meta_v & META_NONASCII) != 0
        eot_new = (meta_v & META_EOT) != 0

        # tentative read-phase registers feed the transition fetch
        a_t = jnp.where(m_read0, a_new, a)
        acls_t = jnp.where(m_read0, cls_new, carry["a_cls"])
        t0_t = jnp.where(m_read0, t, t0)
        t0_hid_t = jnp.where(m_read0, hid, t0_hid)

        _ft_res = fetch_trans(carry, t0_t, t0_hid_t, a_t, acls_t)
        can_tr, valid, nontok, t_succ, t_succ_hid, eps_tgt, lc_tgt = _ft_res[:7]
        # optional 8th element: fused-boundary entry fields (see the
        # m_bf path below; only the Pallas kernel fetch provides it)
        fus = _ft_res[7] if len(_ft_res) > 7 else None

        # run skipping: a lowercase-absorbing state consumes the whole
        # [a-z] run in one step (each skipped char would take the same
        # self-arc and probe the same ε bit; ASCII chars leave the
        # stale-ok flag untouched; the leading-char drop only applies
        # to the first pending char, which is excluded)
        rl = (meta_v >> META_RUN_SHIFT) & META_RUN_MASK
        if enable_skip:
            m_skip = (
                m_read0
                & can_meta
                & carry["lc_t"]
                & (rl >= 2)
                & ((c - b) - ft >= 1)
            )
        else:
            m_skip = jnp.zeros_like(m_read0)

        # stall: lane cannot proceed this step (hot machine only);
        # read phase is idempotent, so re-running it later is safe.
        cold_stall = ((m_read0 & ~m_skip) | m_old0) & ~can_tr
        stall = (m_read0 & ~can_meta) | cold_stall
        m_read = m_read0 & ~stall
        m_old = m_old0 & ~stall

        # commit read-phase registers
        # stale-ok: only the non-ASCII path reassigns ok (matrix.go:426-434)
        ok = _bsel(m_read, _bsel(nonascii_new, found_new, ok), ok)
        a = jnp.where(m_read, a_new, a)
        a_cls = jnp.where(m_read, cls_new, carry["a_cls"])
        eot = _bsel(m_read, eot_new, eot)
        t0 = jnp.where(m_read, t, t0)
        t0_hid = jnp.where(m_read, hid, t0_hid)

        # ε availability probe / epilogue chase share one predicate on t
        eps_here = probe_fn(carry)
        probe = m_read & eps_here
        eps_s = jnp.where(probe, t, eps_s)
        eps_s_hid = jnp.where(probe, hid, eps_s_hid)
        # a skipped run probes at every char; the final register holds
        # the last run position
        eps_o = jnp.where(probe, jnp.where(m_skip, c + rl - 1, c), eps_o)

        # ---- fused boundary (kernel only) ---------------------------------
        # One step for the static composition "no direct arc → backtrack
        # → ε token flush (rewind) → re-read consume" (matrix.go:442-591).
        # Runtime gates keep every excluded corner on the exact slow
        # path: a pending token must exist (else the ε is a sentence
        # end), EOT keeps its special handling, and a stale-ok identity
        # symbol must take the identity→unknown retry first.
        if fus is not None:
            _bf_base = (
                m_read
                & ~m_skip
                & ~valid
                & fus["have"]
                & ~eot
                & (ok | (a != identity))
            )
            m_bf = _bf_base & ((c - b) > ft)
            # fused SENTENCE end: same fail→backtrack→ε→re-read-consume
            # composition but with no pending token, so the ε emits a
            # sentence end WITHOUT rewinding (matrix.go:573-576) and
            # the consume continues the unflushed buffer
            m_bs = _bf_base & ((c - b) <= ft)
        else:
            m_bf = jnp.zeros_like(m_read)
            m_bs = m_bf

        # ---- transition outcome -----------------------------------------
        m_trans = ((m_read & ~m_skip) | m_old) & ~m_bf & ~m_bs
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
        sflag1 = _bsel(flush, False, _bsel(sent, True, sflag))
        tflag1 = _bsel(flush, False, tflag)
        e_m = m_succ & eot
        sent2 = e_m & ~sflag1
        sflag2 = sflag1 | sent2
        tflag2 = _bsel(e_m, True, tflag1)
        rewind = flush | e_m

        # ---- epilogue entry (EOF break, matrix.go:637-697) ---------------
        echase = m_eof & eps_here
        ebt = m_eof & ~eps_here & (eps_s != 0)
        efin = m_eof & ~eps_here & (eps_s == 0)
        resid = efin & has_pending
        sflag_e = _bsel(resid, False, sflag)
        tflag_e = _bsel(resid, False, tflag)
        efin_sent = efin & ~sflag_e
        efin_text = efin & ~tflag_e

        # ---- event emission (candidates are always ordered T, S, X) ------
        w_tok = flush | f3 | resid | m_bf
        w_sent = sent | sent2 | efin_sent | m_bs
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

        act = running & ~stall
        emit = jnp.where(m_drain, pend, jnp.where(act, first, 0))
        pend_new = jnp.where(m_drain, pend2, jnp.where(act, second, pend))
        pend2_new = jnp.where(m_drain, 0, jnp.where(act, third, pend2))

        # ---- merge state updates (paths are disjoint) ---------------------
        # NB: f2/ebt read the post-probe backtrack register, like the
        # reference (probe and failing transition share an iteration,
        # matrix.go:442-497).
        bt_state = eps_s
        bt_hid = eps_s_hid
        bt_off = eps_o

        t_new = jnp.where(f3, root_t, jnp.where(m_succ, t_succ, t))
        hid_new = jnp.where(f3, hid1, jnp.where(m_succ, t_succ_hid, hid))
        eps_t_new = _bsel(f3, eps1, _bsel(m_succ, eps_tgt, carry["eps_t"]))
        lc_new = _bsel(f3, lc1, _bsel(m_succ, lc_tgt, carry["lc_t"]))
        t0_new = jnp.where(f2 | ebt, bt_state, jnp.where(echase, t, t0))
        t0_hid_new = jnp.where(f2 | ebt, bt_hid, jnp.where(echase, hid, t0_hid))
        a_new2 = jnp.where(f1, unknown, jnp.where(f2 | f3 | echase | ebt, eps, a))
        acls_new2 = jnp.where(
            f1, unknown_cls, jnp.where(f2 | f3 | echase | ebt, eps_cls, a_cls)
        )
        c_new = jnp.where(
            m_skip,
            c + rl,
            jnp.where(
                f2 | ebt, bt_off, jnp.where(f3, c_f3, jnp.where(m_succ, c_cons, c))
            ),
        )
        b_new = jnp.where(f3, c_f3, jnp.where(m_succ & rewind, c_cons, b))
        ft_new = jnp.where(f3 | (m_succ & rewind), 0, jnp.where(cons, ft_cons, ft))
        eps_s_new = jnp.where(f2 | f3 | ebt | (m_succ & rewind), 0, eps_s)
        eps_s_hid_new = jnp.where(
            f2 | f3 | ebt | (m_succ & rewind), -1, eps_s_hid
        )
        eps_o_new = jnp.where(m_succ & rewind, 0, eps_o)
        newchar_new = _bsel(f1 | f2 | echase | ebt, False, _bsel(f3 | m_succ, True, newchar))
        eot_new2 = _bsel(f1 | f2 | m_succ, False, eot)
        sflag_new = _bsel(f3, False, _bsel(m_succ, sflag2, sflag))
        tflag_new = _bsel(f3, False, _bsel(m_succ, tflag2, tflag))
        phase_new = jnp.where(efin | m_cut, 1, phase)
        # checkpoint the machine context at rewinds: the buffer base b
        # restarts here with zeroed registers, so a later segment can
        # resume exactly by re-reading text from b in this context
        ckpt_new = jnp.where(
            f3 | (m_succ & rewind),
            t_new
            | (sflag_new.astype(I32) << 28)
            | (tflag_new.astype(I32) << 29)
            | (ok.astype(I32) << 30),
            ckpt,
        )

        if fus is not None:
            # Fused-path register updates, replicating the exact final
            # registers of the three composed steps: token emitted
            # (handled via w_tok above), rewind at c, consume to c+1
            # with the leading-nontoken drop, machine at the fused
            # entry's final target, backtrack register = ε-target (as
            # the lazy TAG_EPSOF sentinel) iff ε is available there,
            # checkpoint = ε-target context at the rewind position.
            # The sentence variant (m_bs) differs only where the
            # reference's sent path differs from flush: SENT emitted
            # (w_sent above), no rewind (b/ckpt keep), ft grows by the
            # leading-nontoken drop, sflag set instead of cleared.
            m_bb = m_bf | m_bs
            t_new = jnp.where(m_bb, fus["t"], t_new)
            hid_new = jnp.where(m_bb, fus["hid"], hid_new)
            eps_t_new = _bsel(m_bb, fus["epst"], eps_t_new)
            lc_new = _bsel(m_bb, fus["lct"], lc_new)
            c_new = jnp.where(m_bb, c + 1, c_new)
            b_new = jnp.where(m_bf, c, b_new)
            ft_new = jnp.where(
                m_bf,
                fus["nontok"].astype(I32),
                jnp.where(m_bs, ft + fus["nontok"].astype(I32), ft_new),
            )
            eps_s_new = jnp.where(
                m_bb,
                jnp.where(fus["avail_e"], fus["bt"], 0),
                eps_s_new,
            )
            eps_s_hid_new = jnp.where(m_bb, -1, eps_s_hid_new)
            eps_o_new = jnp.where(m_bb, c, eps_o_new)
            newchar_new = _bsel(m_bb, True, newchar_new)
            sflag_new = _bsel(m_bf, False, _bsel(m_bs, True, sflag_new))
            tflag_new = _bsel(m_bf, False, tflag_new)
            ckpt_new = jnp.where(
                m_bf, fus["bt"] | (ok.astype(I32) << 30), ckpt_new
            )

        out = dict(carry)
        if emit_fn is None:
            out["ys"] = jax.lax.dynamic_update_slice(
                carry["ys"], emit.astype(I32)[None, :], (carry["steps"], 0)
            )
        else:
            out = emit_fn(out, emit)
        out.update(
            t=t_new,
            t0=t0_new,
            a=a_new2,
            a_cls=acls_new2,
            ok=ok,
            eot=eot_new2,
            newchar=newchar_new,
            eps_s=eps_s_new,
            eps_o=eps_o_new,
            c=c_new,
            b=b_new,
            ft=ft_new,
            sflag=sflag_new,
            tflag=tflag_new,
            phase=phase_new,
            pend=pend_new,
            pend2=pend2_new,
            ckpt=ckpt_new,
            hid=hid_new,
            t0_hid=t0_hid_new,
            lc_t=lc_new,
            eps_s_hid=eps_s_hid_new,
            eps_t=eps_t_new,
            steps=carry["steps"] + 1,
        )
        if track_counts:
            # scalar reductions every step are cheap in XLA but cost a
            # vector→scalar round-trip per iteration inside Mosaic —
            # the fused kernel turns them off
            out["stalls"] = jnp.sum(stall.astype(I32))
            out["cold"] = jnp.sum(cold_stall.astype(I32))
        if "req_t0" in carry and track_counts:
            # cold-stall fetch requests for the injection round trip
            # (pallas_engine): record the exact (state, symbol) pair
            # this lane's pending fetch needs.  Written on tracking
            # steps only (chunk ends, in-kernel) — a stalled lane
            # re-runs its read phase idempotently, so the pair is the
            # same at the chunk end as at the stall — keeping the
            # common step free of the two extra row-selects.  A lane
            # that progressed leaves no stale request, and its stale
            # ``inj`` self-invalidates by fingerprint mismatch.
            out["req_t0"] = jnp.where(cold_stall, t0_t, 0)
            out["req_a"] = jnp.where(cold_stall, a_t, 0)
        out["n_backtrack"] = nbt + (f2 | m_bf | m_bs).astype(I32)
        out["n_force"] = nfe + f3.astype(I32)
        return aux_update(out) if aux_update is not None else out

    return step


# ---------------------------------------------------------------------------
# General machine: serial-gather fetches (any representation)
# ---------------------------------------------------------------------------


def _general_fetches(rep, tables, meta):
    L = meta.shape[1]

    def fetch_meta(carry):
        cc = jnp.clip(carry["c"], 0, L - 1)
        m = jnp.take_along_axis(meta, cc[:, None], axis=1)[:, 0]
        return m, jnp.ones_like(carry["phase"], bool)

    def probe_fn(carry):
        return rep.eps_avail(tables, carry["t"])

    def fetch_trans(carry, t0, t0_hid, a, a_cls):
        valid, nontok, t_next = rep.transition(tables, t0, a)
        can = jnp.ones_like(valid)
        false = jnp.zeros_like(valid)
        return can, valid, nontok, t_next, jnp.full_like(t_next, -1), false, false

    return fetch_meta, probe_fn, fetch_trans


def _init_carry(B, max_steps, length, eps1, hid1, ctx_init=None, hid_init=None,
                epst_init=None, lc_init=None, stop_flags=None):
    zeros = jnp.zeros(B, I32)
    fb = jnp.zeros(B, bool)
    if ctx_init is None:
        ctx_init = jnp.ones(B, I32)
    if stop_flags is None:
        stop_flags = fb
    # packed entry context: t | sflag<<28 | tflag<<29 | ok<<30 (1 = root)
    t_init = ctx_init & 0x0FFFFFFF
    sflag_init = ((ctx_init >> 28) & 1) != 0
    tflag_init = ((ctx_init >> 29) & 1) != 0
    ok_init = ((ctx_init >> 30) & 1) != 0
    if hid_init is None:
        hid_init = jnp.full(B, hid1, I32)
    if epst_init is None:
        epst_init = jnp.full(B, eps1, bool)
    if lc_init is None:
        lc_init = fb
    return {
        "t": t_init,
        "t0": t_init,
        "a": zeros,
        "a_cls": zeros,
        "ok": ok_init,
        "eot": fb,
        "newchar": jnp.ones(B, bool),
        "eps_s": zeros,
        "eps_o": zeros,
        "c": zeros,
        "b": zeros,
        "ft": zeros,
        "sflag": sflag_init,
        "tflag": tflag_init,
        "phase": zeros,
        "pend": zeros,
        "pend2": zeros,
        "hid": hid_init,
        "t0_hid": hid_init,
        "eps_s_hid": jnp.full(B, -1, I32),
        "eps_t": epst_init,
        "lc_t": lc_init,
        "ys": jnp.zeros((max_steps, B), I32),
        "steps": jnp.int32(0),
        "stalls": jnp.int32(0),
        "cold": jnp.int32(0),
        "sref": jnp.int32(0),
        "need_srv": jnp.array(False),
        "since": jnp.int32(0),
        "length": length,
        "stop": stop_flags,
        "ckpt": ctx_init,
        "n_backtrack": zeros,
        "n_force": zeros,
    }


def _finish(out):
    bad = (out["phase"] == 0) | (out["pend"] != 0)
    ctx = (
        out["t"]
        | (out["sflag"].astype(I32) << 28)
        | (out["tflag"].astype(I32) << 29)
        | (out["ok"].astype(I32) << 30)
    )
    state = jnp.stack(
        [ctx, out["ckpt"], out["b"], out["c"], out["n_backtrack"], out["n_force"]],
        axis=-1,
    )
    return out["ys"], bad, out["steps"], state


@functools.partial(
    jax.jit, static_argnames=("eps", "unknown", "identity", "rep", "max_steps")
)
def _run_machine(tables, meta, length, ctx_init, stop_flags=None,
                 *, eps, unknown, identity, rep, max_steps):
    """General machine: run until all lanes finish (or step budget)."""
    B, L = meta.shape
    fm, pf, ft_ = _general_fetches(rep, tables, meta)
    step = _make_step(
        eps=eps,
        unknown=unknown,
        identity=identity,
        fetch_meta=fm,
        probe_fn=pf,
        fetch_trans=ft_,
        aux_update=None,
        eps1=False,
        hid1=-1,
    )

    def cond(carry):
        return (carry["steps"] < max_steps) & jnp.any(
            (carry["phase"] == 0) | (carry["pend"] != 0)
        )

    out = jax.lax.while_loop(
        cond,
        step,
        _init_carry(
            B, max_steps, length, False, -1, ctx_init=ctx_init,
            stop_flags=stop_flags,
        ),
    )
    return _finish(out)


# ---------------------------------------------------------------------------
# Hot machine: MXU one-hot transitions over a profiled hot state set
# ---------------------------------------------------------------------------


def sample_texts(texts, budget: int = 262144):
    """Round-robin document sample for native statistics walks
    (census, cold rate): prefixes of ≤256 docs joined by newlines —
    the '\n' re-grounds the walk at a boundary symbol; long documents
    contribute an interior slice too (their vocabulary is not all in
    the prefix).  Returns the joined str, or None for empty input."""
    n = len(texts)
    if n == 0:
        return None
    take = max(256, budget // max(1, min(n, 256)))
    step = max(1, n // 256)
    parts = []
    got = 0
    for i in range(0, n, step):
        t = texts[i]
        if len(t) > 2 * take:
            mid = len(t) // 2
            parts.append(t[: take // 2])
            parts.append(t[mid : mid + take - take // 2])
        else:
            parts.append(t[:take])
        got += min(len(t), take)
        if got >= budget:
            break
    return "\n".join(parts)


def _tok_static(tok):
    """Hot-set-INDEPENDENT precomputations, cached on the tokenizer.

    Everything here depends only on the transition table, so per-wave
    hot specs (:meth:`HotSpec.for_wave`) reuse it and pay only the
    (A, H)-sized hot-dependent work — measured ~5 ms per spec vs
    ~100 ms for a cold build dominated by these S-sized passes.
    """
    st = getattr(tok, "_hotspec_static", None)
    if st is not None:
        return st
    rep = MatrixRep(tok)
    S, A = rep.S, rep.max_sym
    arr = np.asarray(tok.array, dtype=np.uint32)
    eps = rep.eps

    # ε availability per state (probe semantics, matrix.go:442)
    states = np.arange(S + 1, dtype=np.int64)
    eps_cells = arr[(eps - 1) * S + states]
    eps_avail = eps_cells != 0
    eps_avail[0] = False
    eps_avail = eps_avail.astype(np.uint8)

    # letter-absorbing states: self-loop (no nontoken flag) on every
    # letter of an adaptively chosen skip class — these consume
    # whole letter runs in one step (semantically exact: each
    # skipped char would probe the same ε bit and take the same
    # self-arc).  The class starts as ASCII [a-z] and greedily
    # drops letters that break many otherwise-absorbing states
    # (e.g. the DE grammar routes 's' through genitive machinery,
    # so the word-interior state loops on everything but 's').
    letters = [cp for cp in range(ord("a"), ord("z") + 1) if cp in tok.sigma]
    lc_avail = np.zeros(S + 1, dtype=np.uint8)
    lc_mask = np.zeros(128, dtype=bool)
    if letters:
        syms = np.array([tok.sigma[cp] for cp in letters], dtype=np.int64)
        cells_lc = arr[((syms[:, None] - 1) * S + states[None, :])]
        ok_lc = (
            (cells_lc != 0)
            & ((cells_lc & ~np.uint32(FIRSTBIT)) == states[None, :])
            & ((cells_lc >> 31) == 0)
        )  # (len(letters), S+1)
        counts = ok_lc.sum(axis=0)
        cand = counts >= max(1, int(len(letters) * 0.75))  # absorbing-ish
        keep = np.ones(len(letters), dtype=bool)
        for _ in range(6):  # drop at most a few run-splitting letters
            flagged = ok_lc[keep].all(axis=0) & cand
            best_gain, best_i = 0, -1
            for i in np.flatnonzero(keep):
                k2 = keep.copy()
                k2[i] = False
                gain = int((ok_lc[k2].all(axis=0) & cand).sum()) - int(
                    flagged.sum()
                )
                if gain > best_gain:
                    best_gain, best_i = gain, i
            if best_i < 0 or best_gain < max(4, int(cand.sum() * 0.1)):
                break
            keep[best_i] = False
        lc_avail = (ok_lc[keep].all(axis=0)).astype(np.uint8)
        lc_avail[0] = 0
        for i in np.flatnonzero(keep):
            lc_mask[letters[i]] = True

    # packed service-fetch static table (hot-set-independent part):
    # target (18 b) | nontoken (1) | ε-avail (1) | lc-avail (1).  The
    # per-hot-set hot id (bits 21..30) is composed ON DEVICE at the
    # dedup-gather's unique stage from the spec's hot_index — keeping
    # this 4·A·S-byte table constant across per-wave hot specs (a
    # per-wave rebuild would re-upload ~12.5 MB per wave for the DE
    # model; hot_index is 73 KB).
    svc_static = None
    if (S + 1) <= (1 << 18):
        tgt_all = (arr & ~np.uint32(FIRSTBIT)).astype(np.int64)
        nt_all = (arr >> 31).astype(np.int64)
        svc_static = np.where(
            arr == 0,
            0,
            tgt_all
            | (nt_all << 18)
            | (eps_avail[tgt_all].astype(np.int64) << 19)
            | (lc_avail[tgt_all].astype(np.int64) << 20),
        ).astype(np.int32)

    st = dict(
        rep=rep, S=S, A=A, arr=arr, eps=eps,
        eps_cells=eps_cells, eps_avail=eps_avail,
        lc_avail=lc_avail, lc_mask=lc_mask, svc_static=svc_static,
    )
    tok._hotspec_static = st
    return st


class HotSpec:
    """Precomputed hot-set tables for the matrix representation.

    Two specs with equal :attr:`sig` (hash/eq below) are interchangeable
    as the jitted machines' static argument: every scalar the tracers
    bake in (shapes H/A_pad/C_pad, the cold-table width, state-1
    properties, pinned ε/unknown class ids, capability flags) is in the
    signature, and every ARRAY flows through traced arguments — so
    per-wave hot specs (:meth:`for_wave`) reuse one compiled machine
    and swap only table data.
    """

    def __init__(self, tok, hot_states: np.ndarray, *, cold_p2=None):
        st = _tok_static(tok)
        rep = st["rep"]
        S, A = st["S"], st["A"]
        arr = st["arr"]
        eps = st["eps"]
        eps_cells = st["eps_cells"]
        eps_avail = st["eps_avail"].astype(bool)
        lc_avail = st["lc_avail"]
        states = np.arange(S + 1, dtype=np.int64)

        hot_states = np.asarray(hot_states, dtype=np.int64)
        # state 1 rides slot 0 in every spec (hid1=0), so specs built
        # from different hot sets share one static signature — and one
        # compiled machine (sig doc above)
        hot_states = np.concatenate([[1], hot_states[hot_states != 1]])
        H = len(hot_states)
        self.H = H
        self.A_pad = ((A + 1 + 127) // 128) * 128

        hot_index = np.full(S + 1, -1, dtype=np.int32)
        hot_index[hot_states] = np.arange(H, dtype=np.int32)
        self.hot_index = hot_index
        self.hot_full = hot_states.astype(np.int32)
        self.hid1 = int(hot_index[1])

        self.eps_avail = st["eps_avail"]
        self.eps1 = bool(eps_avail[1])
        self.lc_mask = st["lc_mask"]
        self.lc_avail = lc_avail
        self.lc1 = bool(lc_avail[1])

        # hot entries: (A_pad, H) packed 24-bit values
        aa = np.arange(1, A + 1, dtype=np.int64)
        cells = arr[((aa[:, None] - 1) * S + hot_states[None, :])]  # (A, H)
        tgt = (cells & ~np.uint32(FIRSTBIT)).astype(np.int64)
        nt = (cells >> 31).astype(np.int64)
        valid = cells != 0
        tgt_hid = hot_index[tgt]
        is_hot = tgt_hid >= 0
        payload = np.where(is_hot, tgt_hid, tgt)
        entry = np.where(
            valid,
            _HE_VALID
            | np.where(is_hot, _HE_HOT, 0)
            | nt * _HE_NONTOK
            | eps_avail[tgt] * _HE_EPS
            | lc_avail[tgt].astype(np.int64) * _HE_LC
            | (payload << 5),
            0,
        ).astype(np.int64)
        full = np.zeros((self.A_pad, H), dtype=np.int64)
        full[1 : A + 1, :] = entry
        self.planes = np.concatenate(
            [(full & 0xFF), (full >> 8) & 0xFF, (full >> 16) & 0xFF], axis=1
        ).astype(np.float32)  # (A_pad, 3H), bf16-exact byte values

        # ---- fused-kernel tables (pallas_engine) -------------------------
        # 16-bit entries in two transposed int8 planes; cold targets go
        # through a small side table and states travel *tagged* (decoded
        # only at service boundaries):  bits 0..4 flags as above, bits
        # 5..15 payload = hot id, or cold-side-table id.
        cold_targets = np.unique(tgt[valid & ~is_hot])
        self.n_cold = len(cold_targets)
        self.pallas_ok = (H <= 2047) and (self.n_cold <= 2047)
        self.fused_ok = False
        self.hot_eps_full = np.zeros(H, dtype=np.int32)
        if self.pallas_ok:
            cold_index = {int(s): i for i, s in enumerate(cold_targets)}
            cold_id = np.zeros_like(tgt)
            if self.n_cold:
                flat = np.array(
                    [cold_index.get(int(s), 0) for s in tgt.ravel()], dtype=np.int64
                ).reshape(tgt.shape)
                cold_id = flat
            payload16 = np.where(is_hot, tgt_hid, cold_id)
            entry16 = np.where(
                valid,
                _HE_VALID
                | np.where(is_hot, _HE_HOT, 0)
                | nt * _HE_NONTOK
                | eps_avail[tgt] * _HE_EPS
                | lc_avail[tgt].astype(np.int64) * _HE_LC
                | (payload16 << 5),
                0,
            ).astype(np.int64)
            # Fused boundary entries (see _make_step's m_bf path):
            # every inter-token boundary costs three machine steps —
            # read-fail, backtrack + ε token flush, re-read consume
            # (matrix.go:442-591) — but the composition is static per
            # (state, symbol): no direct arc, ε arc present, consume
            # from the ε-target valid.  Encoded as bit0=0 bit1=1 (an
            # impossible combination for plain entries), consume-arc
            # flags in bits 2-4, the *final* target's hot id in bits
            # 5-14 (10 bits → requires H ≤ 1023 and a hot final
            # target; anything else stays on the exact slow path), and
            # ε-availability at the ε-target in bit 15 (needed for the
            # backtrack register).  The ε-target itself is not encoded:
            # registers that need it get the lazy TAG_EPSOF sentinel.
            eps_tgt_all = (eps_cells & ~np.uint32(FIRSTBIT)).astype(np.int64)
            self.fused_ok = H <= 1023
            if self.fused_ok:
                e_of = eps_tgt_all[hot_states]  # (H,)
                has_e = eps_avail[hot_states].astype(bool)
                cells_e = np.where(
                    has_e[None, :],
                    arr[((aa[:, None] - 1) * S + e_of[None, :])],
                    np.uint32(0),
                )  # (A, H)
                f_tgt = (cells_e & ~np.uint32(FIRSTBIT)).astype(np.int64)
                f_hid = hot_index[f_tgt].astype(np.int64)
                fusable = (~valid) & (cells_e != 0) & (f_hid >= 0)
                fusable[eps - 1, :] = False  # ε is never an input symbol
                fentry = np.where(
                    fusable,
                    _HE_HOT
                    | (cells_e >> 31).astype(np.int64) * _HE_NONTOK
                    | eps_avail[f_tgt] * _HE_EPS
                    | lc_avail[f_tgt].astype(np.int64) * _HE_LC
                    | (np.maximum(f_hid, 0) << 5)
                    | (eps_avail[e_of].astype(np.int64)[None, :] << 15),
                    0,
                )
                entry16 = entry16 | fentry  # disjoint: fentry!=0 ⇒ entry16==0
                self.hot_eps_full = np.where(has_e, e_of, 0).astype(np.int32)
            else:
                self.hot_eps_full = np.zeros(H, dtype=np.int32)
            full16 = np.zeros((self.A_pad, H), dtype=np.int64)
            full16[1 : A + 1, :] = entry16
            # (2H, A_pad): rows [0,H) = low byte, [H,2H) = high byte
            self.planes_kT = (
                np.concatenate([full16 & 0xFF, (full16 >> 8) & 0xFF], axis=1).T
                - 128
            ).astype(np.int8)
            # Symbol-class compression: the per-step matmul cost is
            # 2H × width × BL MACs, and many symbols have IDENTICAL
            # packed columns over the hot subtable (measured DE model:
            # 107 distinct of 256 padded — letters inside words, digit
            # variants, punctuation families collapse).  The kernel
            # matmuls against one column per *class* and gathers by the
            # class id the encoder stamps into meta bits 24..30
            # (encode.py META_CLS_*, carried step-to-step in the
            # ``a_cls`` register); the entry integers are exactly equal
            # by construction.  Class ids must fit 7 bits, so the
            # compressed width is the 128-lane tile exactly.
            uq, inv = np.unique(full16, axis=0, return_inverse=True)
            inv = inv.reshape(-1)
            # pin the ε and unknown class ids (ε→0, unknown→next):
            # the service step bakes them into the compiled machine as
            # Python constants, so pinning keeps the static signature
            # identical across per-wave hot specs (class numbering is
            # otherwise arbitrary)
            ce, cu = int(inv[eps]), int(inv[rep.unknown])
            head = [ce] + ([cu] if cu != ce else [])
            order = np.array(
                head + [c for c in range(len(uq)) if c not in (ce, cu)],
                dtype=np.int64,
            )
            rank = np.empty(len(uq), dtype=np.int64)
            rank[order] = np.arange(len(uq))
            uq, inv = uq[order], rank[inv]
            if len(uq) <= 128 and self.A_pad > 128:
                self.C_pad = 128
                self.cls_tab = inv.astype(np.int32)
                fc = np.zeros((self.C_pad, H), dtype=np.int64)
                fc[: len(uq)] = uq
                self.planes_cls_kT = (
                    np.concatenate([fc & 0xFF, (fc >> 8) & 0xFF], axis=1).T
                    - 128
                ).astype(np.int8)
            else:  # no compression win; kernel gathers by raw symbol
                self.C_pad = self.A_pad
                self.cls_tab = None
                self.planes_cls_kT = self.planes_kT
            cp2 = 1
            while cp2 < max(2, self.n_cold):
                cp2 *= 2
            if cold_p2 is not None:
                # pinned cold-table width: per-wave specs share the
                # decode-plane shape (and the compiled machine) even
                # as their cold-target counts vary
                if self.n_cold > cold_p2:
                    self.pallas_ok = False
                cp2 = max(cp2, int(cold_p2))
            cf = np.zeros(cp2, dtype=np.int32)
            cf[: self.n_cold] = cold_targets.astype(np.int32)
            self.cold_full_p2 = cf

        # ---- packed service-fetch table ---------------------------------
        # The XLA service step between kernel rounds pays THREE serial
        # per-lane gathers (meta, transition, aux hid/ε/lc refresh) at
        # ~40 ns/lane each — ~18% of a bench run at B=32K.  The static
        # table (see _tok_static) packs target + nontoken + ε/lc-avail
        # into ONE int32 per (symbol, state) cell, same indexing as the
        # raw matrix (matrix.go:463); the hot id (bits 21..30,
        # hot_index+1) is composed on device from this spec's
        # hot_index at the gather's unique stage, so the table itself
        # is shared across per-wave hot specs.  One gather replaces
        # transition+aux; the meta gather is replaced by a windowed
        # ring tree-select (pallas_engine service fetches).
        self.svc_ok = st["svc_static"] is not None and H <= 1022
        if self.svc_ok:
            self.svc_static = st["svc_static"]

        # static signature: every scalar the jitted machines bake in.
        # Equal sig ⇒ interchangeable as the static `spec` argument
        # (arrays travel as traced args); see class docstring.
        ct = getattr(self, "cls_tab", None)
        self.sig = (
            self.H,
            self.A_pad,
            getattr(self, "C_pad", 0),
            len(getattr(self, "cold_full_p2", ())),
            self.hid1,
            self.eps1,
            self.lc1,
            self.pallas_ok,
            self.fused_ok,
            self.svc_ok,
            ct is not None,
            0 if ct is None else int(ct[rep.unknown]),
            0 if ct is None else int(ct[eps]),
        )

    def __hash__(self):
        return hash(self.sig)

    def __eq__(self, other):
        return isinstance(other, HotSpec) and self.sig == other.sig

    @classmethod
    def for_wave(cls, base: "HotSpec", tok, hot_states: np.ndarray):
        """Per-wave hot spec shaped to share ``base``'s compiled
        machine: same H (trimmed or filled from ``base``'s profile
        states), same pinned cold-table width.

        Returns the new spec, or ``base`` itself when the wave spec
        cannot share the signature (cold-target overflow, class-count
        overflow past 128) — the caller never has to special-case.
        Cost: ~5 ms (tok-level passes are cached, see _tok_static).
        """
        if not getattr(base, "pallas_ok", False) or not hasattr(
            base, "cold_full_p2"
        ):
            return base
        H = base.H
        hs = np.asarray(hot_states, dtype=np.int64)
        hs = hs[(hs != 1) & (hs > 0)]
        if len(hs) >= H - 1:
            hs = hs[: H - 1]
        else:
            fill = base.hot_full[
                ~np.isin(base.hot_full, hs) & (base.hot_full != 1)
            ]
            hs = np.concatenate([hs, fill[: H - 1 - len(hs)]])
        spec = cls(tok, hs, cold_p2=len(base.cold_full_p2))
        if spec.sig != base.sig:
            return base
        return spec

    def device_tables(self):
        # hot_full padded to a power of two for the select tree
        p2 = 1
        while p2 < max(2, self.H):
            p2 *= 2
        hf = np.zeros(p2, dtype=np.int32)
        hf[: self.H] = self.hot_full
        return (
            jnp.asarray(self.planes, dtype=jnp.bfloat16),
            jnp.asarray(hf),
            jnp.asarray(self.hot_index),
            jnp.asarray(self.eps_avail),
            jnp.asarray(self.lc_avail),
        )


def _hot_fetches(spec: HotSpec, hot_tables):
    planes, hot_full_p2, _hot_index, _eps_avail, _lc_avail = hot_tables
    H = spec.H
    A_pad = spec.A_pad
    P2 = hot_full_p2.shape[0]
    iota_A = jnp.arange(A_pad, dtype=I32)
    iota_H = jnp.arange(H, dtype=I32)

    def fetch_meta(carry):
        w = carry["w"]
        ring = carry["ring"]  # (B, RING)
        off = carry["c"] - w
        can = (off >= 0) & (off < RING)
        v = _tree_select(ring, jnp.clip(off, 0, RING - 1))
        return v, can

    def probe_fn(carry):
        return carry["eps_t"]

    def fetch_trans(carry, t0, t0_hid, a, a_cls):
        oh = ((a[:, None] == iota_A[None, :]) & (a > 0)[:, None]).astype(jnp.bfloat16)
        rows = jnp.dot(oh, planes, preferred_element_type=jnp.float32)  # (B, 3H)
        # rows is loop-variant (fresh matmul output), so this mask-reduce
        # stays vectorized — only invariant operands get gather-matched.
        msel = iota_H[None, :] == t0_hid[:, None]
        lo = jnp.sum(jnp.where(msel, rows[:, :H], 0.0), axis=1).astype(I32)
        mid = jnp.sum(jnp.where(msel, rows[:, H : 2 * H], 0.0), axis=1).astype(I32)
        hi = jnp.sum(jnp.where(msel, rows[:, 2 * H :], 0.0), axis=1).astype(I32)
        entry = lo | (mid << 8) | (hi << 16)
        valid = (entry & _HE_VALID) != 0
        hot_t = (entry & _HE_HOT) != 0
        nontok = (entry & _HE_NONTOK) != 0
        eps_tgt = (entry & _HE_EPS) != 0
        lc_tgt = (entry & _HE_LC) != 0
        payload = entry >> 5
        full_hot = _tree_select_shared(hot_full_p2, jnp.clip(payload, 0, P2 - 1))
        t_next = jnp.where(hot_t, full_hot, payload)
        t_next_hid = jnp.where(hot_t, payload, -1)
        can = t0_hid >= 0
        return can, valid, nontok, t_next, t_next_hid, eps_tgt, lc_tgt

    return fetch_meta, probe_fn, fetch_trans


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps",
        "unknown",
        "identity",
        "rep",
        "spec",
        "max_steps",
        "service_k",
    ),
)
def _run_machine_hot(
    tables,
    hot_tables,
    meta,
    length,
    ctx_init,
    hid_init,
    epst_init,
    lc_init,
    stop_flags=None,
    *,
    eps,
    unknown,
    identity,
    rep,
    spec,
    max_steps,
    service_k,
):
    """Hot machine: MXU hot steps + periodic general service steps."""
    B, L = meta.shape
    planes, hot_full, hot_index, eps_avail, lc_avail = hot_tables

    fm_g, _pf_g, ft_g = _general_fetches(rep, tables, meta)
    fm_h, pf_h, ft_h = _hot_fetches(spec, hot_tables)

    # Combined auxiliary per-state map: (hot_index + 1) | eps_avail << 20
    # | lc_avail << 21 — one serial take refreshes the hot registers in
    # the service step.
    aux_map = (
        (hot_index.astype(jnp.int32) + 1)
        | (eps_avail.astype(jnp.int32) << 20)
        | (lc_avail.astype(jnp.int32) << 21)
    )

    def aux(carry):
        out = dict(carry)
        v = jnp.take(aux_map, jnp.clip(carry["t"], 0, aux_map.shape[0] - 1))
        out["hid"] = (v & 0xFFFFF) - 1
        out["eps_t"] = ((v >> 20) & 1) != 0
        out["lc_t"] = ((v >> 21) & 1) != 0
        out["since"] = jnp.int32(0)
        return out

    # The service step uses the carried ε register as its probe too —
    # the invariant eps_t == eps_avail[t] holds at every step entry
    # (hot steps carry it from entries; aux refreshes it after service).
    step_general = _make_step(
        eps=eps,
        unknown=unknown,
        identity=identity,
        fetch_meta=fm_g,
        probe_fn=pf_h,
        fetch_trans=ft_g,
        aux_update=aux,
        eps1=spec.eps1,
        hid1=spec.hid1,
        lc1=spec.lc1,
    )

    def hot_aux(carry):
        out = dict(carry)
        out["since"] = carry["since"] + 1
        out["sref"] = carry["sref"] + 1
        return out

    step_hot = _make_step(
        eps=eps,
        unknown=unknown,
        identity=identity,
        fetch_meta=fm_h,
        probe_fn=pf_h,
        fetch_trans=ft_h,
        aux_update=hot_aux,
        eps1=spec.eps1,
        hid1=spec.hid1,
        lc1=spec.lc1,
        enable_skip=True,
    )

    def live_mask(carry):
        return (carry["phase"] == 0) | (carry["pend"] != 0)

    def refresh_ring(carry):
        # window follows the slowest live lane
        live = live_mask(carry)
        c_live = jnp.where(live, carry["c"], jnp.int32(1 << 28))
        w_new = jnp.clip(jnp.min(c_live), 0, max(0, L - RING))
        out = dict(carry)
        out["w"] = w_new
        out["ring"] = jax.lax.dynamic_slice(meta, (0, w_new), (B, RING))
        out["sref"] = jnp.int32(0)
        # stale stall counts would keep the inner loop from re-entering
        out["stalls"] = jnp.int32(0)
        return out

    # NB: lax.cond inside a while body is executed as both-branches-plus-
    # select by XLA TPU, which would pay the serial service cost every
    # step.  Nested while loops guarantee real branching: the inner loop
    # runs pure hot steps until the ring window goes stale or lanes
    # stall; the outer loop refreshes the window and runs one exact
    # general (serial-gather) service step ONLY when cold lanes need it
    # (or the heartbeat fires) — expressed as a single-iteration
    # while_loop, which XLA executes as a real branch.
    def inner_cond(carry):
        live = jnp.any(live_mask(carry))
        n_live = jnp.sum(live_mask(carry).astype(I32))
        # Stall exit relative to *live* lanes: stalled lanes idle until
        # the next service, so in sparse batches (few live lanes, e.g.
        # the long-document pipeline) waiting for `stalls == n_live`
        # lets each cold character cost a stalled lane up to a full
        # round of idle steps and blows the step budget.  A quarter of
        # the live lanes stalled is the break-even for paying the
        # serial service step; full blocks keep the absolute B/8 bound
        # (it binds first there, preserving big-batch behavior).
        ok_stalls = (carry["stalls"] * 8 <= B) & (
            carry["stalls"] * 4 < n_live
        )
        return (
            (carry["steps"] < max_steps)
            & live
            & (carry["sref"] < RING // 2)
            & (carry["since"] < service_k)
            & ok_stalls
        )

    def service_cond(carry):
        return carry["need_srv"]

    def service_body(carry):
        out = step_general(carry)
        out["need_srv"] = jnp.array(False)
        return out

    def outer_body(carry):
        carry = refresh_ring(carry)
        carry = jax.lax.while_loop(inner_cond, step_hot, carry)
        need = jnp.any(live_mask(carry)) & (
            (carry["cold"] > 0) | (carry["since"] >= service_k)
        )
        carry["need_srv"] = need
        return jax.lax.while_loop(service_cond, service_body, carry)

    def outer_cond(carry):
        return (carry["steps"] < max_steps) & jnp.any(live_mask(carry))

    init = _init_carry(
        B, max_steps, length, spec.eps1, spec.hid1,
        ctx_init=ctx_init, hid_init=hid_init, epst_init=epst_init,
        lc_init=lc_init, stop_flags=stop_flags,
    )
    init["w"] = jnp.int32(0)
    init["ring"] = jnp.zeros((B, RING), I32)
    init["since"] = jnp.int32(0)
    out = jax.lax.while_loop(outer_cond, outer_body, init)
    return _finish(out)


# ---------------------------------------------------------------------------
# Host-side decode + engine classes
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def _compact_ys(ys, S):
    """Device-side event compaction: (max_steps, B) → (B, S) dense.

    The step-indexed event buffer is mostly zeros (one slot per machine
    step, ~0.3 events/char emitted); a stable sort per lane moves the
    events to the front *in step order*, so only ``counts.max()`` rows
    ever cross the device↔host link — on the dev tunnel (and on PCIe at
    production scale) that link is the end-to-end bottleneck, and this
    cuts its traffic ~4× (SURVEY.md §7.3 item 5: variable-length output
    from fixed-shape compute).
    """
    sub = ys[:S]
    key = (sub == 0).astype(jnp.int32)  # events first, zeros last
    _, srt = jax.lax.sort((key, sub), dimension=0, is_stable=True,
                          num_keys=1)
    counts = (sub != 0).sum(axis=0, dtype=jnp.int32)
    return jnp.transpose(srt), counts


def decode_events_flat(ev, counts):
    """Decode compacted (B, E) event rows to ONE flat (N, 3) array.

    Lane i's events are the ``counts[i]`` consecutive triples starting
    at ``counts[:i].sum()`` — the zero-copy wave layout the native
    writer replays in a single call (``dt_writer_feed_wave``).  Rides
    the threaded native decoder when available (parity pinned by
    tests); the numpy path below is the fallback and oracle."""
    ev = np.asarray(ev)
    counts = np.asarray(counts)
    try:
        from ..utils.native import native_decode_events

        tri = native_decode_events(ev, counts)
        if tri is not None:
            return tri, counts
    except ImportError:
        pass
    E = ev.shape[1]
    mask = np.arange(E, dtype=np.int32)[None, :] < counts[:, None]
    flat = ev[mask].astype(np.uint32)  # row-major → per-lane step order
    tri = np.empty((len(flat), 3), dtype=np.int32)
    tri[:, 0] = flat & 3
    tri[:, 1] = (flat >> 2) & PACK_POS_MASK
    tri[:, 2] = (flat >> (2 + PACK_POS_BITS)) & PACK_POS_MASK
    return tri, counts


def decode_events_compact(ev, counts, as_arrays: bool = False) -> List:
    """Decode compacted (B, E) event rows (see ``_compact_ys``)."""
    tri, counts = decode_events_flat(ev, counts)
    out = []
    off = 0
    if as_arrays:
        for n in counts.tolist():
            out.append(tri[off : off + n])
            off += n
        return out
    trl = [tuple(r) for r in tri.tolist()]
    for n in counts.tolist():
        out.append(trl[off : off + n])
        off += n
    return out


def decode_events_batch(
    ys: np.ndarray, n_steps: int, as_arrays: bool = False
) -> List:
    """Vectorized decode of all lanes' packed event streams.

    ``as_arrays=True`` returns per-lane (N, 3) int32 arrays instead of
    tuple lists — the zero-copy shape the native C++ writer feeds at
    hundreds of MB/s (list-of-tuples conversion alone caps the host
    formatting path at ~5 MB/s)."""
    sub = ys[:n_steps].T  # (B, steps) — row-major per lane, step order
    mask = sub != 0
    counts = mask.sum(axis=1)
    flat = sub[mask].astype(np.uint32)
    if as_arrays:
        tri = np.empty((len(flat), 3), dtype=np.int32)
        tri[:, 0] = flat & 3
        tri[:, 1] = (flat >> 2) & PACK_POS_MASK
        tri[:, 2] = (flat >> (2 + PACK_POS_BITS)) & PACK_POS_MASK
        out = []
        off = 0
        for n in counts.tolist():
            out.append(tri[off : off + n])
            off += n
        return out
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


# Small built-in calibration sample for hot-state profiling (mixed
# German/English with URLs, abbreviations, numbers, EOT, punctuation).
_CALIBRATION = (
    "Der Vorsitzende der Abk. hat z.B. gewählt und bzw. verlor. "
    'Sie sagte: "Es geht mir gut!", daraufhin ging sie zur Weststr. 3. '
    "Gefunden auf https://korap.ids-mannheim.de/?q=Baum und www.wikipedia.org. "
    "Ich bin unter korap@ids-mannheim.de erreichbar, auch am 5.9.2018 um 14:30 Uhr. "
    "Die Preise lagen bei 3,50 Euro bzw. 50.4% — toll!!! Oder etwa nicht??? "
    "Don't they're we'll it's I'm isn't a test? Mr. Smith paid $4.50 on Jan. 3rd. "
    "Dieses verf***** Kleid kostet 3,5 Mio. Euro ... D'dorf Ku'damm M'gladbach.\x04\n"
    "Emoticons ;) :-) T__T und Emojis 😀 sowie Pfeile → und <b>XML</b> &quot; "
    "eine readme.txt zum Herunterladen via ftp://files.example.org/pub/a.zip. "
    "Kupietz und Schmidt (2018): Korpuslinguistik. [2018] war super, oder?\x04"
)


# English-centric calibration twin of _CALIBRATION: clitic splitting
# (n't/'ll/'ve/'re/'s), months, ordinals, honorifics — the EN model's
# hot machinery (src/en/tokenizer.xfst:1-131).
_CALIBRATION_EN = (
    "Don't you think they're ready? We'll've seen it by Jan. 3rd, won't we. "
    "I'm sure it's Mr. Smith's car — he can't park there, shan't he move it? "
    "She'd said: \"You mustn't worry\", but we weren't worried at all. "
    "Prof. Jones et al. published on Feb. 29, 2016 at www.example.com. "
    "The U.S.A. isn't the U.K.; approx. 50.4% agreed vs. 23% who didn't.\x04\n"
    "Visit https://en.wikipedia.org/wiki/Token or mail info@example.org asap. "
    "Cats, dogs etc. cost $4.50 apiece in Oct. — that's a lot, isn't it?\x04"
)


def default_profile_texts(tok) -> List[str]:
    """Calibration corpus for hot-state profiling.

    The built-in sample alone under-covers word-list machinery (the
    abbreviation/URL tries): measured 7% cold transitions on the bench
    text with a sample-profiled hot set.  The conformance scenarios
    (extracted from the reference's test suite) plus the word-list
    fixtures exercise exactly the state machinery real corpora hit.
    """
    import json
    import os

    texts = [_CALIBRATION]
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    scen = os.path.join(root, "conformance", "scenarios.json")
    try:
        with open(scen, encoding="utf-8") as fh:
            data = json.load(fh)
        texts.extend(
            s["input"] for s in data if isinstance(s.get("input"), str)
        )
    except OSError:
        pass
    for p in (
        "/root/reference/testdata/de/dontsplit.txt",
        "/root/reference/testdata/de/split.txt",
        # EN abbreviation list (346 entries, src/en/tokenizer.xfst) —
        # without it the EN model's abbreviation trie profiles cold
        "/root/reference/src/en/abbrv.txt",
    ):
        try:
            with open(p, encoding="utf-8") as fh:
                words = [w.strip() for w in fh if w.strip() and not w.startswith("#")]
            texts.append(" ".join(words))
        except OSError:
            pass
    texts.append(_CALIBRATION_EN)
    return texts


def profile_hot_states(tok, texts: Sequence[str], limit) -> np.ndarray:
    """Rank states by transition-time occupancy over sample texts.

    ``limit`` may be an int or ``"auto"``: auto sizes the hot set to
    cover ≥99.9% of profiled transitions (plus headroom), rounded so
    the padded plane width stays MXU-friendly — the hot-table matmul
    cost is linear in H, so a tight hot set directly buys throughput.
    """
    from .oracle import transduce_events

    counter = {}
    for text in texts:
        transduce_events(tok, text, state_counter=counter)
    ranked = [s for s, _ in sorted(counter.items(), key=lambda kv: -kv[1])]
    if limit == "auto":
        total = sum(counter.values()) or 1
        cum = 0
        need = len(ranked)
        for i, st in enumerate(ranked):
            cum += counter[st]
            if cum >= 0.985 * total:
                need = i + 1
                break
        # Round to a multiple of 128 — the fused kernel's matmul cost
        # is linear in H, so a tight hot set buys throughput directly —
        # and cap at 640: the per-step one-hot build (2H rows) is the
        # largest VPU term, and with cold-entry INJECTION a cold char
        # costs one ROUND (not a pooled service), so coverage matters
        # doubly on heterogeneous real text.  Measured on v5e (round 4,
        # DE, B=32K, pring=128): uniform 383/375/347, rotated-hetero
        # 277/270/245, mixed-real 131/143/199, EN 251/261/239 at
        # H=512/640/768 — 640 is the balance point (the round-2
        # "98.5% knee" predates injection and had let the hot set grow
        # to 768 with the profile corpus).
        limit = max(384, min(640, ((need + 127) // 128) * 128))
    hot = [1] + [s for s in ranked if s != 1]
    if len(hot) < limit:
        # structural fill: breadth-first from the root
        arr = np.asarray(tok.array, dtype=np.uint32).reshape(-1)
        S = tok.state_count
        seen = set(hot)
        queue = list(hot)
        qi = 0
        A = len(arr) // (S + 1)
        while qi < len(queue) and len(hot) < limit:
            s = queue[qi]
            qi += 1
            cells = arr[np.arange(A) * S + s]
            for cell in cells[cells != 0]:
                tgt = int(cell & ~np.uint32(FIRSTBIT))
                if tgt and tgt not in seen:
                    seen.add(tgt)
                    hot.append(tgt)
                    queue.append(tgt)
                    if len(hot) >= limit:
                        break
    return np.array(hot[:limit], dtype=np.int64)


class BatchEngine:
    """Host-facing batched tokenization engine.

    ``engine`` selects the device machine:
      - ``"pallas"``: fused K-step Pallas kernel + XLA service steps
        (fastest; matrix representation on TPU);
      - ``"hot"``: XLA MXU hot machine with periodic service steps;
      - ``"general"``: serial-gather machine (any representation);
      - ``"auto"`` (default): pallas on TPU for matrix models, hot on
        other backends for matrix models, general otherwise.

    ``accelerated=False`` is a legacy alias for ``engine="general"``.
    """

    def __init__(
        self,
        tok,
        steps_factor: float = 2.0,
        accelerated: Optional[bool] = None,
        hot_size="auto",
        service_k: Optional[int] = None,
        profile_texts: Optional[Sequence[str]] = None,
        engine: str = "auto",
        # round-4 re-tune with the scalar-fetch timing fix (v5e, DE,
        # B=32K): H=512 (auto cap) / pring=128 / K=96 / CH=8 measured
        # 380-387 uniform and 277-280 rotated-hetero MB/s/chip vs
        # 347/245 for the round-3 config (H=768/pring=256/K=128) —
        # smaller hot-set one-hots and a smaller ring tree beat their
        # extra stalls now that cold entries arrive by injection
        kernel_k: int = 96,
        kernel_bl: int = 2048,
        kernel_early_exit: bool = True,
        kernel_ch: int = 8,
        kernel_pring: int = 0,
        kernel_pool: int = 32,
        kernel_wgrp: int = 0,
        kernel_svc_ns: int = -1,
        kernel_injq: int = 0,
        kernel_inj_budget: float = 2.0,
        pallas_interpret: bool = False,
        per_wave: bool = True,
    ):
        if accelerated is False:
            engine = "general"
        if tok.type() == "DATOK" and engine in ("auto", "pallas", "hot"):
            # the fused kernel wants the dense layout; the conversion
            # is runtime-equivalent (transduce parity pinned by tests),
            # so double-array models get full TPU speed transparently
            try:
                tok = tok.to_matrix()
            except Exception as e:
                # an explicitly requested accelerated engine must not
                # silently downgrade to the serial-gather machine
                if engine in ("pallas", "hot"):
                    raise RuntimeError(
                        f"engine={engine!r} requires the dense matrix "
                        f"layout but to_matrix() failed: {e}"
                    ) from e
                import warnings

                warnings.warn(
                    f"double-array → matrix conversion failed ({e}); "
                    "falling back to the serial-gather engine",
                    RuntimeWarning,
                    stacklevel=2,
                )
        self.tok = tok
        self.rep = make_rep(tok)
        self.steps_factor = steps_factor
        self.tables = tuple(jnp.asarray(t) for t in self.rep.tables)
        if engine == "auto":
            if tok.type() == "MATOK":
                engine = "pallas" if jax.default_backend() == "tpu" else "hot"
            else:
                engine = "general"
        if tok.type() != "MATOK" and engine != "general":
            engine = "general"
        if service_k is None:
            # the fused kernel services on cold demand; the heartbeat
            # is only a safety net there. The XLA hot machine relies on
            # the heartbeat to bound ring staleness.
            service_k = 1024 if engine == "pallas" else 128
        self.service_k = service_k
        self.kernel_k = kernel_k
        self.kernel_bl = kernel_bl
        self.kernel_early_exit = kernel_early_exit
        self.kernel_ch = kernel_ch
        self.kernel_pring = kernel_pring
        self.kernel_pool = kernel_pool
        self.kernel_wgrp = kernel_wgrp
        self.kernel_svc_ns = kernel_svc_ns
        self.kernel_injq = kernel_injq  # 0 = pallas_engine default
        self.kernel_inj_budget = kernel_inj_budget
        self.pallas_interpret = pallas_interpret
        self.accelerated = engine in ("hot", "pallas")
        if self.accelerated:
            hot = profile_hot_states(
                tok, profile_texts or default_profile_texts(tok), hot_size
            )
            # cold-table width pinned to the pallas_ok maximum so
            # per-wave hot specs (HotSpec.for_wave) always share this
            # spec's static signature — and its compiled machine
            self.spec = HotSpec(tok, hot, cold_p2=2048)
            if engine == "pallas" and not self.spec.pallas_ok:
                engine = "hot"
            if engine == "pallas":
                from .pallas_engine import PallasSpec

                self.pallas_spec = PallasSpec(self.spec)
            # mirror of _run_machine_pallas's inj_mode condition: the
            # injected entry carries the full target id in 15 bits, so
            # models with ≥ 2^15 states fall back to pooled service
            # steps — surfaced, not silent, because injection is the
            # main heterogeneous-batch optimization
            self.inj_enabled = bool(
                engine == "pallas"
                and self.spec.svc_ok
                and kernel_svc_ns != 0
                and self.rep.S < (1 << 15)
                # the injection fingerprint packs the symbol id at
                # bit 18 of an int32 (13 usable bits): larger sigmas
                # would alias (state, symbol) pairs and consume the
                # WRONG injected transition — silently
                and self.rep.max_sym < (1 << 13)
            )
            if (
                engine == "pallas"
                and self.spec.svc_ok
                and kernel_svc_ns != 0
                and not self.inj_enabled
            ):
                import logging

                logging.getLogger("datok_tpu").warning(
                    "cold-entry injection disabled: model has %d states "
                    "(>= 2^15 limit of the 15-bit injected target "
                    "field); heterogeneous batches use pooled service "
                    "steps instead",
                    self.rep.S,
                )
            self.hot_tables = self.spec.device_tables()
            # run marking must use the spec's adaptive skip class; the
            # symbol-class bits feed the fused kernel's compressed fetch
            self.encoder = SymbolEncoder(
                tok,
                lc_mask=self.spec.lc_mask,
                cls_tab=getattr(self.spec, "cls_tab", None),
            )
        else:
            self.encoder = SymbolEncoder(tok)
        self.engine = engine
        # per-wave hot specs (census-built; see wave_spec): opt-in —
        # the fused kernel only, and only when the packed service path
        # exists (the safety net for census misses)
        self.per_wave = bool(
            per_wave and engine == "pallas" and self.spec.svc_ok
        )
        # (rounds, services, since) after a pallas run; None otherwise
        self.last_stats = None

    def max_steps_for(self, L: int) -> int:
        return int(self.steps_factor * L) + 64

    # -- per-wave hot specs -------------------------------------------
    # One static hot set cannot serve every workload: the committed
    # profile corpus covers its own vocabulary (uniform DE bench 0.3%
    # cold) but runs 4-7% cold on novel prose, and every cold
    # transition stalls its lane for ~one kernel round (BENCH_LOG r4).
    # A wave's OWN fetch working set, by contrast, is tiny (measured
    # 458 states at 99.95% self-coverage on the novel-prose probe) —
    # so each wave gets a hot spec census-built from a sample of its
    # documents by the exact native walk, shaped (HotSpec.for_wave) to
    # share the engine spec's compiled machine: selecting a spec swaps
    # ~250 KB of table data under the same jit cache entry.

    def census_states(self, texts, sample_chars: int = 262144):
        """Fetch-frequency state census of a document sample (exact
        native walk), or None when unavailable.  Samples are document
        prefixes round-robin across ≤256 docs, joined by newlines."""
        from ..utils.native import native_state_census

        sample = sample_texts(texts, sample_chars)
        if sample is None:
            return None
        metas = self.encoder.encode(text_to_codepoints(sample))
        r = native_state_census(self.tok, np.asarray(metas, np.int32))
        if r is None:
            return None
        counts, _fetches = r
        return counts

    # hot-set size ladder for per-wave specs: the census tells us the
    # wave's working-set size, so each wave runs at the SMALLEST rung
    # that covers ≥99.9% of its fetches — the one-hot build (2H VPU
    # ops) is the largest speed-of-light term, and one static H cannot
    # serve every workload (measured r5, v5e DE per-wave: uniform
    # 369/351/342 at H=384/512/640; mixed needs 640 — 208 vs 132 at
    # 512 where its ~600-state working set overflows).  One compiled
    # machine per rung, shared across waves at that rung.
    WAVE_H_LADDER = (384, 512)

    def _rung_base(self, H: int) -> "HotSpec":
        """Engine-profile spec reshaped to ladder rung ``H`` — the sig
        anchor and fill pool for that rung's wave specs."""
        if H >= self.spec.H:
            return self.spec
        cache = getattr(self, "_rung_cache", None)
        if cache is None:
            cache = self._rung_cache = {}
        b = cache.get(H)
        if b is None:
            b = HotSpec(
                self.tok, self.spec.hot_full[1:H],
                cold_p2=len(self.spec.cold_full_p2),
            )
            if not (b.pallas_ok and b.svc_ok):
                # a narrow rung can overflow the packed-entry format
                # (e.g. cold targets > 2047 from a small hot set on a
                # big model) — fall back to the engine spec rather
                # than crash the pipeline prep thread
                b = self.spec
            cache[H] = b
        return b

    def wave_spec(self, texts, sample_chars: int = 262144):
        """Per-wave hot spec for ``texts`` (see block comment above);
        returns ``self.spec`` unchanged when the engine is not the
        fused kernel, the native census is unavailable, or the wave
        spec cannot share a compiled machine."""
        if self.engine != "pallas" or not self.spec.svc_ok:
            return getattr(self, "spec", None)
        counts = self.census_states(texts, sample_chars)
        if counts is None:
            return self.spec
        states = np.flatnonzero(counts)
        order = np.argsort(-counts[states], kind="stable")
        cum = np.cumsum(counts[states][order])
        n999 = (
            int(np.searchsorted(cum, 0.999 * cum[-1]) + 1)
            if len(cum)
            else 1
        )
        H = self.spec.H
        for rung in self.WAVE_H_LADDER:
            if rung < H and n999 <= rung - 1:
                H = rung
                break
        base = self._rung_base(H)
        if len(states) > H - 1:
            states = states[order][: H - 1]
        states = np.sort(states)
        key = (H, states.tobytes())
        cache = getattr(self, "_wave_spec_cache", None)
        if cache is None:
            cache = self._wave_spec_cache = {}
        spec = cache.get(key)
        if spec is None:
            if len(cache) > 16:
                cache.clear()
            spec = HotSpec.for_wave(base, self.tok, states)
            cache[key] = spec
        return spec

    def _wave_parts(self, spec):
        """(PallasSpec, encoder) for a per-wave spec, cached by spec
        identity — repeated hot sets (wave_spec's key cache returns
        the same object) reuse the device tables and encoder."""
        if spec is self.spec:
            return self.pallas_spec, self.encoder
        cache = getattr(self, "_wave_parts_cache", None)
        if cache is None:
            cache = self._wave_parts_cache = {}
        v = cache.get(id(spec))
        if v is None or v[0] is not spec:
            from .pallas_engine import PallasSpec

            if len(cache) > 16:
                cache.clear()
            v = (spec, PallasSpec(spec),
                 self.encoder.with_cls(spec.cls_tab))
            cache[id(spec)] = v
        return v[1], v[2]

    def _pallas_spec_for(self, spec):
        return self._wave_parts(spec)[0]

    def encoder_for(self, spec):
        return self._wave_parts(spec)[1]

    def run_raw_device(
        self,
        meta: np.ndarray,
        lengths: np.ndarray,
        entries: Optional[np.ndarray] = None,
        stops: Optional[np.ndarray] = None,
        spec: Optional[HotSpec] = None,
    ):
        """Run the device machine; returns *device* arrays.

        ``spec``: optional per-wave hot spec (:meth:`wave_spec`) — used
        by the fused-kernel engine only; it must share ``self.spec``'s
        static signature (HotSpec.for_wave guarantees this), so the
        call swaps table DATA under the already-compiled machine.

        Benchmarks time this with ``jax.block_until_ready``: through
        the development TPU tunnel the device→host copy of the event
        buffer dominates wall clock ~20×, while on production hardware
        it rides PCIe.
        """
        B, L = meta.shape
        if L > MAX_SEGMENT:
            raise ValueError(
                f"segment length {L} exceeds packed-event limit {MAX_SEGMENT}; "
                "use the segmentation pipeline for longer streams"
            )
        if entries is None:
            entries = np.ones(B, dtype=np.int32)
        entries = np.asarray(entries, dtype=np.int32)
        t_part = entries & 0x0FFFFFFF
        stop_flags = None if stops is None else jnp.asarray(
            np.asarray(stops, dtype=bool)
        )
        if self.engine == "pallas":
            return self._run_pallas(meta, lengths, entries, t_part, stops,
                                    spec=spec)
        if self.accelerated:
            if L < RING:  # ring window needs at least RING meta rows
                meta = np.pad(meta, ((0, 0), (0, RING - L)))
                L = RING
            hid_init = self.spec.hot_index[np.clip(t_part, 0, len(self.spec.hot_index) - 1)]
            epst_init = self.spec.eps_avail[
                np.clip(t_part, 0, len(self.spec.eps_avail) - 1)
            ].astype(bool)
            lc_init = self.spec.lc_avail[
                np.clip(t_part, 0, len(self.spec.lc_avail) - 1)
            ].astype(bool)
            ys, bad, steps, state = _run_machine_hot(
                self.tables,
                self.hot_tables,
                jnp.asarray(meta),
                jnp.asarray(lengths),
                jnp.asarray(entries),
                jnp.asarray(hid_init.astype(np.int32)),
                jnp.asarray(epst_init),
                jnp.asarray(lc_init),
                stop_flags,
                eps=self.rep.eps,
                unknown=self.rep.unknown,
                identity=self.rep.identity,
                rep=self.rep,
                spec=self.spec,
                max_steps=self.max_steps_for(L),
                service_k=self.service_k,
            )
        else:
            ys, bad, steps, state = _run_machine(
                self.tables,
                jnp.asarray(meta),
                jnp.asarray(lengths),
                jnp.asarray(entries),
                stop_flags,
                eps=self.rep.eps,
                unknown=self.rep.unknown,
                identity=self.rep.identity,
                rep=self.rep,
                max_steps=self.max_steps_for(L),
            )
        return ys, bad, steps, state

    def _run_pallas(self, meta, lengths, entries, t_part, stops,
                    spec=None):
        from .pallas_engine import _run_machine_pallas

        if spec is None or spec is self.spec:
            spec, pspec = self.spec, self.pallas_spec
        else:
            pspec = self._pallas_spec_for(spec)
        B, L = meta.shape
        BL = self.kernel_bl
        on_device = isinstance(meta, jax.Array)
        if not on_device:
            meta = np.asarray(meta)
        if L < RING:
            meta = (jnp if on_device else np).pad(
                meta, ((0, 0), (0, RING - L))
            )
            L = RING
        B_pad = ((B + BL - 1) // BL) * BL
        if isinstance(lengths, jax.Array) and B_pad == B:
            # device-resident lengths pass straight through — an
            # np.asarray here would round-trip ~128 KB over the dev
            # tunnel (download + re-upload ≈ 8 ms/call)
            lengths_d = lengths.astype(jnp.int32)
        else:
            lengths_d = None
            lengths = np.asarray(lengths, dtype=np.int32)
        stops_a = None if stops is None else np.asarray(stops, dtype=bool)
        if B_pad != B:
            meta = (jnp if on_device else np).pad(
                meta, ((0, B_pad - B), (0, 0))
            )
            lengths = np.pad(lengths, (0, B_pad - B))
            entries = np.pad(entries, (0, B_pad - B), constant_values=1)
            if stops_a is not None:
                stops_a = np.pad(stops_a, (0, B_pad - B))
            t_part = entries & 0x0FFFFFFF
        # the transpose of a device-resident meta runs on device — a
        # host round-trip through the dev tunnel costs ~600 ms at the
        # bench shape (measured via the profiler)
        meta_T = (
            jnp.transpose(meta) if on_device else np.ascontiguousarray(meta.T)
        )
        all_root = bool(np.all(entries == 1))
        cache = getattr(self, "_root_init_cache", None)
        # hid1 in the key: the all-root hid_init row is full(hid1);
        # ε/lc-avail are tok-level, so the cache is valid across
        # per-wave specs as long as state 1 keeps its slot
        if all_root and cache is not None and cache[0] == (B_pad, spec.hid1):
            # all-root entry batches (the common path: every fresh
            # document) reuse device-resident init arrays — the
            # ~300 KB of per-call host→device init traffic costs
            # ~10 ms/call through the ~30 MB/s dev tunnel
            entries_d, hid_d, epst_d, lc_d = cache[1]
        else:
            hid_init = spec.hot_index[
                np.clip(t_part, 0, len(spec.hot_index) - 1)
            ]
            epst_init = spec.eps_avail[
                np.clip(t_part, 0, len(spec.eps_avail) - 1)
            ].astype(bool)
            lc_init = spec.lc_avail[
                np.clip(t_part, 0, len(spec.lc_avail) - 1)
            ].astype(bool)
            entries_d = jnp.asarray(entries)
            hid_d = jnp.asarray(hid_init.astype(np.int32))
            epst_d = jnp.asarray(epst_init)
            lc_d = jnp.asarray(lc_init)
            if all_root:
                self._root_init_cache = (
                    (B_pad, spec.hid1), (entries_d, hid_d, epst_d, lc_d)
                )
        stop_flags = None if stops_a is None else jnp.asarray(stops_a)
        # one call: _pring_effective consumes the pending feedback pair
        # (state-mutating) — evaluating it twice would rely on replay
        # idempotence
        pring_eff = self._pring_effective()
        ys, bad, steps, state, stats = _run_machine_pallas(
            self.tables,
            pspec.tables,
            jnp.asarray(meta_T),
            lengths_d if lengths_d is not None else jnp.asarray(lengths),
            entries_d,
            hid_d,
            epst_d,
            lc_d,
            stop_flags,
            eps=self.rep.eps,
            unknown=self.rep.unknown,
            identity=self.rep.identity,
            rep=self.rep,
            spec=spec,
            max_steps=self.max_steps_for(L),
            service_k=self.service_k,
            K=self.kernel_k,
            BL=BL,
            early_exit=self.kernel_early_exit,
            interpret=self.pallas_interpret,
            **(
                {"pring": pring_eff} if pring_eff else {}
            ),
            ch=self.kernel_ch,
            pool=self.kernel_pool,
            wgrp=self.kernel_wgrp,
            svc_ns=self.kernel_svc_ns,
            **(
                {"injq": self.kernel_injq} if self.kernel_injq else {}
            ),
            inj_budget=self.kernel_inj_budget,
        )
        if B_pad != B:
            ys = ys[:, :B]
            bad = bad[:B]
            state = state[:B]
        self.last_stats = stats  # (rounds, services, since) — observability
        # feedback is LAZY: stats/steps are device scalars here, and a
        # host read would sync the (possibly pipelined) caller on this
        # run; the pending pair is evaluated at the next call's entry,
        # when the run has long completed
        self._pring_pending = (stats, steps)
        return ys, bad, steps, state

    def _pring_effective(self):
        """Ring-window rows for the next fused run: the explicit knob
        when set, else the feedback choice (see _pring_feedback)."""
        if self.kernel_pring:
            return self.kernel_pring
        pend = getattr(self, "_pring_pending", None)
        if pend is not None:
            self._pring_pending = None
            self._pring_feedback(*pend)
        return getattr(self, "_pring_auto", 0)

    def _pring_feedback(self, stats, steps):
        """Content-desync feedback: rounds that exit early without
        cold stalls mean lanes outran the meta ring window, so the
        NEXT run gets the wide ring.  Round efficiency = steps /
        (rounds × K); measured r5 (v5e DE, per-wave specs): uniform
        0.86, novel 0.89, mixed 0.62 — healthy at pring=128 — vs
        rotated-phase lanes 0.52, which the wide window fixes
        (pring 128 → 256: 290.5 → 316.9 MB/s; steps 1456 → 1204).
        Hysteresis: widen below 0.55, narrow back above 0.75 (a
        rotated-style batch holds ~0.50 wide, never flapping).  Each
        flip is one compiled-machine switch, persistent-cached."""
        if self.kernel_pring or stats is None:
            return
        try:
            rounds = int(np.asarray(stats)[0])
            n = int(steps)
        except Exception:
            return
        if rounds <= 2:
            return
        eff = n / max(rounds * self.kernel_k, 1)
        cur = getattr(self, "_pring_auto", 0)
        if not cur and eff < 0.55:
            self._pring_auto = 256
        elif cur and eff > 0.75:
            self._pring_auto = 0

    def run_raw(
        self,
        meta: np.ndarray,
        lengths: np.ndarray,
        entries: Optional[np.ndarray] = None,
        stops: Optional[np.ndarray] = None,
        spec: Optional[HotSpec] = None,
    ):
        """Run the device machine.

        Returns (ys, bad, n_steps, state) numpy arrays where ``state``
        is (B, 4): packed exit ctx, rewind-checkpoint ctx, b (pending
        token start), c (cursor).  ``entries`` optionally sets per-lane
        packed entry contexts; ``stops`` marks lanes that cut at
        segment end instead of running the EOF epilogue.
        """
        ys, bad, steps, state = self.run_raw_device(
            meta, lengths, entries, stops, spec=spec
        )
        n_steps = int(steps)
        return (
            np.asarray(ys[:n_steps]),
            np.asarray(bad),
            n_steps,
            np.asarray(state),
        )

    def run_events_compact(
        self,
        meta,
        lengths,
        entries: Optional[np.ndarray] = None,
        stops: Optional[np.ndarray] = None,
        spec: Optional[HotSpec] = None,
    ):
        """Run the device machine and fetch *compacted* events.

        Returns ``(ev[B, E] u32, counts[B], bad[B], state)`` numpy
        arrays, with ``E`` the smallest power-of-two bucket holding the
        fullest lane (bucketing bounds recompiles of the compaction
        jit).  The device→host link moves only the compacted rows —
        the honest end-to-end path (overlap.py) and any PCIe-bound
        production host want this, not the raw (steps, B) buffer.
        """
        ys, bad, steps, state = self.run_raw_device(
            meta, lengths, entries, stops, spec=spec
        )
        n_steps = int(steps)
        # static step bucket for the compaction jit
        S = 256
        while S < n_steps:
            S *= 2
        S = min(S, ys.shape[0])
        ev_T, counts_d = _compact_ys(ys, S)
        counts = np.asarray(counts_d)
        cmax = int(counts.max()) if counts.size else 0
        E = 32
        while E < cmax:
            E *= 2
        E = min(E, S)
        ev = np.asarray(ev_T[:, :E])
        return ev, counts, np.asarray(bad), np.asarray(state)

    def events_batch(
        self,
        texts: Sequence[str],
        entries: Optional[np.ndarray] = None,
        return_exits: bool = False,
        as_arrays: bool = False,
        stops: Optional[np.ndarray] = None,
    ):
        """Boundary events per text (device path, oracle fallback).

        ``as_arrays=True`` yields per-text (N, 3) int32 arrays — the
        shape the native writer feeds without per-tuple conversion.
        ``stops[i]`` runs lane i as a *cut* (stop at segment end, no
        EOF epilogue) — the stream-exact dispatch for chunks ending in
        an interior EOT (see pipeline.transduce_doc_exact)."""
        if not texts:
            return ([], np.zeros(0, np.int32)) if return_exits else []
        base = getattr(self, "spec", None)  # general engine: no spec
        wspec = self.wave_spec(texts) if self.per_wave else base
        enc = (
            self.encoder
            if wspec is None or wspec is base
            else self.encoder_for(wspec)
        )
        meta, lengths, _cps = enc.encode_batch(texts)
        ys, bad, n_steps, state = self.run_raw(
            meta, lengths, entries, stops, spec=wspec
        )
        decoded = decode_events_batch(ys, n_steps, as_arrays=as_arrays)
        exits = state[:, 0].copy()
        out = []
        for i, text in enumerate(texts):
            if bad[i]:
                from .pipeline import transduce_doc_exact

                e0 = int(entries[i]) if entries is not None else 1
                ev, ex = transduce_doc_exact(
                    self.tok, text, e0,
                    bool(stops[i]) if stops is not None else False,
                    encoder=self.encoder,
                )
                if as_arrays:
                    ev = np.asarray(ev, dtype=np.int32).reshape(-1, 3)
                out.append(ev)
                exits[i] = ex
            else:
                out.append(decoded[i])
        if return_exits:
            return out, exits
        return out

    def tokenize_batch(self, texts: Sequence[str], flags: Optional[int] = None) -> List[str]:
        from .events import format_events
        from .writer import SIMPLE

        fl = SIMPLE if flags is None else flags
        return [
            format_events(evs, text, fl)
            for text, evs in zip(texts, self.events_batch(texts))
        ]
