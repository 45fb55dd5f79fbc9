"""Fused Pallas inner-loop engine (matrix representation).

The XLA hot machine (:mod:`jax_engine`) pays three per-step costs that
are invisible to op-level reasoning but dominate on real hardware
(measured through the dev tunnel, see BENCH_LOG.md):

  1. the one-hot matmul's ``rows`` intermediate round-trips HBM every
     step — XLA cannot fuse a dot's consumer into the dot;
  2. every `while` iteration carries a fixed XLA overhead (~25 μs at
     B=16K, measured with a no-op body);
  3. three byte planes of matmul FLOPs.

This module runs K consecutive hot steps inside ONE Pallas kernel:
transition entries are fetched with a *transposed* one-hot int8 matmul
``planes (2H, A) @ onehot (A, BL) -> (2H, BL)`` whose output lives in
VMEM only; the column select, ring meta fetch, and all step logic are
VPU ops on (1, BL) rows; events are written as rows of a (K, BL) VMEM
block. Measured core loop: ~1.2–1.6 ns/lane-step vs ~10 ns for the
XLA machine.

Exact-semantics strategy — identical step code, different fetches:
the kernel body calls the SAME :func:`jax_engine._make_step` factory
as the XLA machines, so the reference semantics
(/root/reference matrix.go:383-697) exist in exactly one place.  Two
representation changes make the step kernel-friendly:

  * **Packed 16-bit entries, two int8 planes.** 5 flag bits + 11-bit
    payload. Hot targets carry their hot id; cold targets an id into a
    small side table (DE model: 1536 cold targets from the hot set).
  * **Tagged states.** The ``t``/``eps_s``/``ckpt`` registers hold
    ``TAG_HOT|hid`` or ``TAG_COLD|cid`` instead of full state ids —
    the full-id decode (a 512–2048-wide select tree) runs only at
    service boundaries and machine exit, not per step.

Cold transitions, identity→unknown retries beyond the hot set, and the
heartbeat run as exact XLA *service steps* between kernel calls, as in
the hot machine.  Stalled lanes re-run their read phase idempotently.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode import META_A_MASK, META_EOT, META_FOUND, META_NONASCII, \
    META_RUN_MASK, META_RUN_SHIFT
from .jax_engine import (HotSpec, I32, PAYLOAD_MASK, TAG_COLD,
                         TAG_EPSOF, TAG_HOT, TAG_MASK, _init_carry,
                         _make_step, _tree_select_shared)

# Default kernel meta ring rows.  A lane more than PRING chars ahead
# of its block's slowest live lane meta-stalls (idempotent re-read), so
# bigger windows absorb more heterogeneous cursor spread — but the
# per-step ring select tree costs PRING−1 VPU row-ops, one of the
# largest SOL terms.  Measured on v5e (round 4, DE, B=32K, H=512):
# pring=128 → 389.7 uniform / 279 rotated-hetero vs pring=256 →
# 378.6/256.6 — the tree savings beat the extra stalls even on the
# adversarial rotated batch (injection absorbs cold stalls; window
# stalls refill next round).  Overridable per machine via ``pring``.
PRING = 128

# carry rows shipped through the kernel, in order.  The ``req*`` rows
# carry cold-stall fetch requests back out and the ``inj_fp{q}`` /
# ``inj_e{q}`` slot pairs carry memoized exact cold fetches INTO the
# kernel (see the injection design note in _run_machine_pallas): a slot
# answers exactly the (state, symbol) fetch whose compressed
# fingerprint it records — a stale slot self-invalidates because the
# lane's current fetch no longer matches that fingerprint, and because
# a transition entry is a pure function of its (state, symbol) pair,
# re-applying a matching slot at ANY later step is exact.  That purity
# is what lets the outer loop inject predicted cold CHAINS (slot q =
# the q-th predicted fetch of a stalled lane's cold walk) consumed over
# consecutive in-kernel steps, instead of one entry per round.
ROWS_BASE = (
    "t", "t0", "a", "a_cls", "ok", "eot", "newchar", "eps_s", "eps_o",
    "c", "b", "ft", "sflag", "tflag", "phase", "pend", "pend2", "ckpt",
    "n_backtrack", "n_force", "hid", "t0_hid", "eps_s_hid", "eps_t",
    "lc_t", "length", "stop", "req_t0", "req_a",
)
BOOL_ROWS = frozenset(
    ("ok", "eot", "newchar", "sflag", "tflag", "eps_t", "lc_t", "stop")
)

# Default injection-queue depth (chain slots per lane); override per
# machine via BatchEngine(kernel_injq=...).  Measured r5 (v5e, DE):
# chain prediction (Q≥4) cuts steps/char on cold-chain workloads
# (novel prose 1.5 → 1.11) but each extra slot costs one dedup gather
# of glue per round, which measured net-negative on every workload
# (mixed 121→98 at Q=8; novel 53→20 — the glue per round exceeds the
# rounds saved), so the default keeps one slot: exactly the answered
# stall request, now consumable at ANY step of the round.  The real
# cold-coverage fix is per-wave hot-set profiling (see WaveSpec).
INJQ = 1


def _rows(injq: int):
    return ROWS_BASE + tuple(
        f"inj_{kind}{q}" for q in range(injq) for kind in ("fp", "e")
    )


def _pack_rows(carry, rows):
    return jnp.concatenate(
        [carry[k].astype(I32)[None, :] for k in rows], axis=0
    )


def _unpack_rows(out_rows, carry, rows):
    out = dict(carry)
    for i, k in enumerate(rows):
        v = out_rows[i]
        out[k] = (v != 0) if k in BOOL_ROWS else v
    return out


def decode_tagged(t, hot_full_p2, cold_full_p2, eps_full_p2=None):
    """Resolve tagged state registers to full state ids (XLA-side).

    ``eps_full_p2`` resolves the lazy ``TAG_EPSOF|hot_id`` sentinel
    written by fused boundary steps: the full id of that hot state's
    ε-target.
    """
    pay = t & PAYLOAD_MASK
    hot = (t & TAG_HOT) != 0
    cold = (t & TAG_COLD) != 0
    hp = _tree_select_shared(hot_full_p2, jnp.clip(pay, 0, hot_full_p2.shape[0] - 1))
    cp = _tree_select_shared(cold_full_p2, jnp.clip(pay, 0, cold_full_p2.shape[0] - 1))
    out = jnp.where(hot, hp, jnp.where(cold, cp, t))
    if eps_full_p2 is not None:
        epsf = (t & TAG_EPSOF) != 0
        ep = _tree_select_shared(
            eps_full_p2, jnp.clip(pay, 0, eps_full_p2.shape[0] - 1)
        )
        out = jnp.where(epsf, ep, out)
    return out


def decode_tagged_mm(t, dec_planes):
    """Matmul-based tagged decode: one one-hot int8 matmul against the
    byte planes of all three id tables (hot / cold / ε-target).

    The tree-select decode dominated the XLA service step (profiled
    2026-08-19: ~2.4 ms of each ~4.5 ms service at B=32K was decode
    selects); a (B, P2)·(P2, 12) int8 one-hot matmul computes the same
    exact integers in tens of μs.  Bytes are stored −128 in the planes
    (int8 range) and restored after the dot; rows past a table's true
    length are zero, matching the zero-padded tree-select tables.

    One edge differs from :func:`decode_tagged`: payloads are clipped
    to the SHARED P2 bound, so a cold payload beyond the cold table's
    true length (impossible for packer-produced entries, which are
    range-checked) decodes to 0 rather than clamping to the last cold
    entry.
    """
    pay = t & PAYLOAD_MASK
    P2 = dec_planes.shape[0]
    payc = jnp.clip(pay, 0, P2 - 1)
    oh = (
        payc[:, None] == jnp.arange(P2, dtype=I32)[None, :]
    ).astype(jnp.int8)
    by = (
        jax.lax.dot_general(
            oh, dec_planes,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=I32,
        )
        + 128
    )  # (B, 12)

    def comb(o):
        return (
            by[:, o]
            | (by[:, o + 1] << 8)
            | (by[:, o + 2] << 16)
            | (by[:, o + 3] << 24)
        )

    hot = (t & TAG_HOT) != 0
    cold = (t & TAG_COLD) != 0
    epsf = (t & TAG_EPSOF) != 0
    out = jnp.where(hot, comb(0), jnp.where(cold, comb(4), t))
    return jnp.where(epsf, comb(8), out)


def decode_tagged_mm2(t, dec_planes2):
    """Split-payload tagged decode: two-level (lo × hi) lookup.

    :func:`decode_tagged_mm`'s dominant cost is not the MXU dot but the
    (B, P2) one-hot *construction* (profiled round 3: 4 decodes ≈ 0.38
    of each ~0.5 ms budgeted service at B=32K, P2=2048).  Splitting the
    11-bit payload as ``pay = hi*LO + lo`` replaces it with a (B, LO)
    one-hot (16× fewer compares at LO=128), one dot against a
    ``(LO, HI*12)`` re-layout of the same byte planes, and a masked
    HI-way sum over the dot's *fresh* output (vectorized — the
    loop-invariant-operand gather trap does not apply, see BENCH_LOG
    hardware facts).  Bit-identical to :func:`decode_tagged_mm` by
    construction: same planes, same bias, same flag select.
    """
    pay = t & PAYLOAD_MASK
    LO = dec_planes2.shape[0]
    HI = dec_planes2.shape[1] // 12
    payc = jnp.clip(pay, 0, LO * HI - 1)
    if LO & (LO - 1) == 0:
        # integer div/mod are multi-instruction on the VPU; LO is a
        # power of two in practice (min(128, P2))
        lo = payc & (LO - 1)
        hi = payc >> int(LO).bit_length() - 1
    else:
        lo = payc % LO
        hi = payc // LO
    oh_lo = (
        lo[:, None] == jnp.arange(LO, dtype=I32)[None, :]
    ).astype(jnp.int8)
    prod = jax.lax.dot_general(
        oh_lo, dec_planes2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=I32,
    ).reshape(-1, HI, 12)
    oh_hi = hi[:, None] == jnp.arange(HI, dtype=I32)[None, :]
    by = jnp.sum(jnp.where(oh_hi[:, :, None], prod, 0), axis=1) + 128

    def comb(o):
        return (
            by[:, o]
            | (by[:, o + 1] << 8)
            | (by[:, o + 2] << 16)
            | (by[:, o + 3] << 24)
        )

    hot = (t & TAG_HOT) != 0
    cold = (t & TAG_COLD) != 0
    epsf = (t & TAG_EPSOF) != 0
    out = jnp.where(hot, comb(0), jnp.where(cold, comb(4), t))
    return jnp.where(epsf, comb(8), out)


def _id_byte_planes(vals: "np.ndarray", p2: int) -> "np.ndarray":
    """(p2, 4) int8 little-endian byte planes of int32 ids, biased −128."""
    out = np.zeros((p2, 4), dtype=np.int8)
    v = np.asarray(vals, dtype=np.int64)
    for i in range(4):
        out[: len(v), i] = (((v >> (8 * i)) & 0xFF) - 128).astype(np.int8)
    out[len(v):, :] = -128
    return out


def _tree_gather_rows(xs, idx):
    """``out[0, l] = x[idx[0, l], l]`` for each ``x`` in ``xs``.

    Row-oriented log2 select tree (the (1, BL)-row analog of
    :func:`jax_engine._tree_select`): a mask-reduce over n rows costs
    ~3n row-ops (compare + select + add-reduce), the tree costs n
    selects plus log2(n) compares — and the per-level compare masks are
    shared across all arrays in ``xs``.  Replacing the kernel's ring
    and column mask-reduces with trees cut the fused kernel's VPU cost
    measurably (see BENCH_LOG.md 2026-08-19).  ``x``: (n, BL) with n a
    power of two; ``idx``: (1, BL) int32 already clipped to [0, n).
    """
    n = xs[0].shape[0]
    assert (n & (n - 1)) == 0, "tree gather needs a power-of-two height"
    xs = list(xs)
    k = n // 2
    while k >= 1:
        bit = (idx & k) != 0  # (1, BL), broadcast over the halved rows
        xs = [jnp.where(bit, x[k : 2 * k], x[:k]) for x in xs]
        k //= 2
    return xs  # each (1, BL)


_INJ_MARK = -(2 ** 31)  # int32 bit 31: "entry present" marker


def _fp_of_t0(t0):
    """Compressed 18-bit fingerprint class of a state-register value
    for injection matching (bits 18+ carry the symbol).  The ``t``/
    ``t0`` registers hold one of: an untagged full state id (< 2^15,
    written by injected transitions), ``TAG_COLD|cid`` (cid ≤ 2047),
    ``TAG_EPSOF|pay`` (lazy fused-boundary backtrack sentinel), or
    ``TAG_HOT|hid``.  The first three map to disjoint ranges —
    ``id``, ``0x10000|cid``, ``0x20000|pay`` — so equality of
    fingerprints implies equality of the underlying register values.
    TAG_HOT values alias untagged ids, but every injection consumer
    gates on ``t0_hid < 0``, which excludes hot lanes."""
    is_cold = (t0 & TAG_COLD) != 0
    is_epso = (t0 & TAG_EPSOF) != 0
    return jnp.where(
        is_cold, (1 << 16) | (t0 & PAYLOAD_MASK),
        jnp.where(is_epso, (1 << 17) | (t0 & PAYLOAD_MASK), t0 & 0x7FFF),
    )


def _pack_inj(e):
    """Repack a raw svc_packed entry into the kernel's injected-entry
    layout: flag bits aligned with plane entries (valid=1, hot=0,
    nontok=4, ε=8, lc=16), hid+1 at bits 5..15, full target id at bits
    16..30, present mark at bit 31."""
    return (
        jnp.int32(_INJ_MARK)
        | (e != 0).astype(I32)
        | (((e >> 18) & 1) << 2)
        | (((e >> 19) & 1) << 3)
        | (((e >> 20) & 1) << 4)
        | (((e >> 21) & 0x3FF) << 5)
        | ((e & 0x7FFF) << 16)
    )


_dev_cache: dict = {}


def _dev_cached(arr):
    """Device upload of a HOST-side table, memoized by array identity —
    tok-level tables (svc_static, ε/lc availability) are shared across
    per-wave HotSpecs, so each uploads once per process instead of
    once per wave (svc_static alone is ~12.5 MB for the DE model)."""
    key = id(arr)
    v = _dev_cache.get(key)
    if v is None or v[0] is not arr:
        if len(_dev_cache) > 64:  # a handful of tokenizers at most
            _dev_cache.clear()
        v = (arr, jnp.asarray(arr))
        _dev_cache[key] = v
    return v[1]


def _dedup_gather(table, idx, need, NU, lane_iota, hot_index=None):
    """Exact gather ``table[idx]`` for the ``need`` lanes, paying the
    serial-gather cost only for UNIQUE indices.

    XLA lowers ``jnp.take`` to a ~40 ns/element scalar-core loop
    (BENCH_LOG hardware facts), so a full-batch gather costs ~1.3 ms at
    B=32K — yet the distinct (state, symbol) pairs behind a service's
    B fetches number a handful on uniform batches and a few hundred on
    heterogeneous ones (cold transitions cluster in rare-word regions
    of the model).  So: sort the needing lanes by index (vectorized),
    mark run starts, compact the ≤NU unique indices to the front with
    a second sort, serial-gather ONLY those, distribute values back
    along the runs with a log2 select tree, and unsort by lane id with
    a third sort.  Cost: three small sorts + NU serial elements
    instead of B.

    Returns int32 (B,): ``table[idx] | _INJ_MARK`` for needing lanes
    whose index fell within the NU-unique budget (test ``v < 0``), 0
    for everyone else (not needing, or beyond budget).
    """
    B = idx.shape[0]
    BIGI = jnp.int32(0x7FFFFFFF)
    key = jnp.where(need, idx, BIGI)
    k_s, lane_s = jax.lax.sort((key, lane_iota), num_keys=1)
    run0 = jnp.concatenate(
        [jnp.ones(1, bool), k_s[1:] != k_s[:-1]]
    ) & (k_s < BIGI)
    rank = jnp.cumsum(run0.astype(I32)) - 1  # run id per sorted pos
    # compact the unique indices to the front (stable)
    _, u_idx = jax.lax.sort(
        (jnp.where(run0, rank, BIGI), k_s), num_keys=1
    )
    u_val = jnp.take(table, jnp.clip(u_idx[:NU], 0, table.shape[0] - 1))
    if hot_index is not None:
        # compose the per-spec hot id (hot_index[target]+1, bits
        # 21..30) at the UNIQUE stage — a second NU-element dependent
        # serial gather (~20 µs at NU=512) that keeps the big static
        # service table shareable across per-wave hot specs.  Cold
        # targets read hot_index −1 → field 0, matching the old packed
        # layout bit for bit; u_val==0 rows index state 0 (−1) → 0.
        hid1p = jnp.take(
            hot_index, jnp.clip(u_val & 0x3FFFF, 0, hot_index.shape[0] - 1)
        ) + 1
        u_val = u_val | (hid1p << 21)
    val_s = _tree_select_shared(u_val, jnp.clip(rank, 0, NU - 1))
    got = (k_s < BIGI) & (rank < NU)
    v_s = jnp.where(got, val_s | jnp.int32(_INJ_MARK), 0)
    _, v = jax.lax.sort((lane_s, v_s), num_keys=1)  # original order
    return v


def _make_kernel(spec: HotSpec, *, eps, unknown, identity, K, BL,
                 early_exit=False, pring=PRING, ch=0, pool=8,
                 inj_mode=True, injq=INJQ):
    # w_ref is a per-LANE ring-window base row (1, BL): window bases
    # are computed per G-lane group outside the kernel (see
    # _run_machine_pallas wgrp), so heterogeneous lanes only convoy
    # within their group, not across the whole block
    H = spec.H
    A_pad = spec.A_pad
    hid1 = spec.hid1
    root_t = TAG_HOT | hid1
    # symbol-class compression (see HotSpec): the planes hold one
    # column per CLASS of identical symbol columns; fetches gather by
    # the meta-borne ``a_cls`` register instead of the raw symbol
    use_cls = spec.cls_tab is not None
    W = spec.C_pad if use_cls else A_pad
    unknown_cls = int(spec.cls_tab[unknown]) if use_cls else 0
    eps_cls = int(spec.cls_tab[eps]) if use_cls else 0

    def kernel(w_ref, rows_ref, ring_ref, planes_ref, out_rows_ref, ys_ref, info_ref):
        w = w_ref[...]  # (1, BL) per-lane ring window base
        ring = ring_ref[...]
        planes = planes_ref[...]
        # i32 iota: v5e Mosaic supports neither 16-bit `tpu.iota` nor
        # 16-bit vector compares ("Target does not support this
        # comparison"), so the comparisons below run in i32.  The
        # (H, BL) materialization costs real kernel stack — VMEM
        # pressure is managed by block size (BL) and hot-set size (H).
        I16 = I32
        iota_h = jax.lax.broadcasted_iota(I32, (H, BL), 0)

        ys_ref[...] = jnp.zeros((K, BL), I32)

        def fetch_meta(carry):
            off = carry["c"] - w
            can = (off >= 0) & (off < pring)
            offc = jnp.clip(off, 0, pring - 1)
            (v,) = _tree_gather_rows((ring,), offc)
            return v, can

        def probe_fn(carry):
            return carry["eps_t"]

        def make_fetch_trans(with_inj):
          def fetch_trans(carry, t0, t0_hid, a, a_cls):
            # Contract over the HOT dimension and mask-reduce over the
            # ALPHABET: the same 2H·W·BL MXU MACs either way, but the
            # VPU select runs over W ≤ 256 rows instead of 2H=1536 —
            # the per-step select was the kernel's largest VPU cost
            # (profiled 2026-08-19: kernel at 2.8 ns/lane-step, ~2× the
            # core-loop floor).  With class compression W=128: half the
            # MXU MACs and half the select tree.  One one-hot (iota_h)
            # feeds both byte planes; a missing hot id (t0_hid < 0)
            # zeroes the one-hot, matching the old select-miss value of
            # 0 + 128.
            oh_h = (iota_h == t0_hid.astype(I16)).astype(jnp.int8)
            cols_lo = jax.lax.dot_general(
                planes[:H], oh_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=I32,
            )  # (W, BL): entry low bytes - 128 for this lane's state
            cols_hi = jax.lax.dot_general(
                planes[H:], oh_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=I32,
            )
            ac = jnp.clip(a_cls if use_cls else a, 0, W - 1)
            lo, hi = _tree_gather_rows((cols_lo, cols_hi), ac)
            # a == 0 (no symbol) must read as an all-flags-clear entry;
            # the old mask-reduce yielded 128|128<<8 there, whose five
            # consumed flag bits are equally zero
            entry = jnp.where(a > 0, (lo + 128) | ((hi + 128) << 8), 0)
            if with_inj:
                # Injected cold entries: the outer loop memoized exact
                # general fetches for the (state, symbol) pairs it
                # predicts this lane's cold walk needs (slot 0 = the
                # recorded stall request, slots 1.. = the predicted
                # consume chain from its target); apply a slot when the
                # lane's CURRENT fetch matches its fingerprint.  A
                # transition entry is a pure function of its (state,
                # symbol) pair, so a matching slot is exact at ANY
                # step — mispredicted slots simply never match and a
                # cold target with no matching slot stalls and
                # re-enters the request loop as before.  The injected
                # value is pre-packed with its FLAG bits in the
                # plane-entry layout (valid=1, hot=0, nontok=4, ε=8,
                # lc=16), so the flag extraction below is shared with
                # the plane path; only the target (full state id,
                # untagged — decode passes it through; bits 16..30)
                # and hot id (bits 5..15) need their own selects.
                probe_fp = _fp_of_t0(t0) | (a << 18)
                hit = (carry["inj_e0"] < 0) & (
                    carry["inj_fp0"] == probe_fp
                )
                inj = jnp.where(hit, carry["inj_e0"], 0)
                for q in range(1, injq):
                    e_q = carry[f"inj_e{q}"]
                    h_q = (e_q < 0) & (carry[f"inj_fp{q}"] == probe_fp)
                    inj = jnp.where(h_q, e_q, inj)
                    hit = hit | h_q
                use_inj = hit & (t0_hid < 0)
                entry = jnp.where(use_inj, inj & 0x1D, entry)
            valid = (entry & 1) != 0
            hot_t = (entry & 2) != 0
            nontok = (entry & 4) != 0
            eps_tgt = (entry & 8) != 0
            lc_tgt = (entry & 16) != 0
            payload = entry >> 5
            t_next = jnp.where(hot_t, TAG_HOT | payload, TAG_COLD | payload)
            t_next_hid = jnp.where(hot_t, payload, -1)
            if with_inj:
                t_next = jnp.where(use_inj, (inj >> 16) & 0x7FFF, t_next)
                t_next_hid = jnp.where(
                    use_inj, ((inj >> 5) & 0x7FF) - 1, t_next_hid
                )
                can = (t0_hid >= 0) | use_inj
            else:
                can = t0_hid >= 0
            # fused boundary entry: bit0=0 bit1=1; 10-bit payload =
            # final target hot id, bit15 = ε-avail at the ε-target
            # (hot_t is 0 for injected entries, so fus.have excludes
            # them automatically)
            pay10 = (entry >> 5) & 0x3FF
            fus = dict(
                have=~valid & hot_t & (t0_hid >= 0),
                nontok=nontok,
                epst=eps_tgt,
                lct=lc_tgt,
                t=TAG_HOT | pay10,
                hid=pay10,
                avail_e=(entry & (1 << 15)) != 0,
                bt=TAG_EPSOF | jnp.maximum(t0_hid, 0),
            )
            return can, valid, nontok, t_next, t_next_hid, eps_tgt, lc_tgt, fus

          return fetch_trans

        def emit_fn(out, emit):
            ys_ref[pl.ds(out["steps"], 1), :] = emit.astype(I32)
            return out

        step_kwargs = dict(
            eps=eps,
            unknown=unknown,
            identity=identity,
            fetch_meta=fetch_meta,
            probe_fn=probe_fn,
            fetch_trans=make_fetch_trans(inj_mode),
            aux_update=None,
            eps1=spec.eps1,
            hid1=hid1,
            lc1=spec.lc1,
            enable_skip=True,
            root_t=root_t,
            emit_fn=emit_fn,
            unknown_cls=unknown_cls,
            eps_cls=eps_cls,
        )
        # Every step consumes pending injection slots (chain slots are
        # spent over CONSECUTIVE steps as the lane walks its predicted
        # cold chain); the per-step cost is the fingerprint probe plus
        # injq compare/selects — measured small against the one-hot
        # build and ring tree.  The first step tracks (it writes req
        # rows for any immediately re-stalled lane; later track steps
        # overwrite them).
        step_first = _make_step(track_counts=True, **step_kwargs)
        step = _make_step(track_counts=False, **step_kwargs)
        # the tracking variant pays vector→scalar reductions (stall /
        # cold counts) — run it only on the last step of each chunk
        step_track = step_first

        rows_in = rows_ref[...]

        def step_i32(fn, carry):
            c2 = dict(carry)
            for k in BOOL_ROWS:
                c2[k] = carry[k] != 0
            out = fn(c2)
            for k in BOOL_ROWS:
                out[k] = out[k].astype(I32)
            return out

        def step_i32_first(carry):
            return step_i32(step_first, carry)

        # static 2D slices (no 1D relayouts in Mosaic); bool registers
        # stay int32 across loop iterations — Mosaic cannot round-trip
        # i1 vectors through loop carries (i8→i1 trunci is unsupported)
        rows_t = _rows(injq if inj_mode else 0)
        carry = {k: rows_in[i : i + 1, :] for i, k in enumerate(rows_t)}
        carry["steps"] = jnp.int32(0)
        carry["stalls"] = jnp.int32(0)
        carry["cold"] = jnp.int32(0)
        if inj_mode:
            # consume injections up front (see step_first note); the
            # 1-iteration fori keeps the emit index a traced scalar
            # (a concrete index reaches a different, unsupported
            # masked-swap lowering path)
            carry = jax.lax.fori_loop(
                0, 1, lambda i, c: step_i32_first(c), carry
            )

        def live_of(carry):
            return (carry["phase"] == 0) | (carry["pend"] != 0)

        if early_exit:
            # Steps run in chunks of CH: only the chunk's last step
            # tracks stall counts and only one exit check runs per
            # chunk, cutting the per-step vector→scalar reductions
            # (measured as real in-kernel cost) CH-fold.  Stalled and
            # finished lanes re-run their read phase idempotently, so
            # the ≤ CH-1 extra steps before an exit are harmless.
            # Mosaic allocates kernel stack for the whole unrolled
            # chunk without cross-step reuse, so chunking multiplies
            # the step's live set; under the raised 64 MB VMEM cap and
            # the class-compressed (halved) fetch, CH=8 at BL=2048 is
            # the measured optimum (310 MB/s vs 254 at CH=1, v5e;
            # CH=16 and K=256 combos regress slightly — sweep_kernel).
            CH = ch if (ch > 0 and K % ch == 0) else (2 if (BL <= 1024 and K % 2 == 0) else 1)

            def chunk(carry):
                c = carry
                for _ in range(CH - 1):
                    c = step_i32(step, c)
                return step_i32(step_track, c)

            def cond(carry):
                live = live_of(carry)
                n_live = jnp.sum(live.astype(I32))
                # Meta-window stalls must NOT end the round: only the
                # window advancing (i.e. the block's slowest lanes
                # running more steps) helps them, and exiting early
                # convoys the whole block behind the spread (measured:
                # rotated-text lanes all died at the step budget).
                # Exit when every live lane is stalled (nothing can
                # progress).
                any_run = carry["stalls"] < n_live
                keep = (
                    (carry["steps"] + CH <= K)
                    & (n_live > 0)
                    & any_run
                )
                # Exit once the pooled-cold share crosses the trigger:
                # with injection the pooled lanes' entries arrive at
                # the NEXT round boundary, so ending the round bounds
                # their stall latency (letting them idle a full K
                # steps measured slower on the rotated probe: 152 vs
                # 194 MB/s); without injection they need an XLA
                # service, same logic (strictly above the live/pool
                # service threshold so the n_inner==0 backstop can't
                # fire every round).
                keep = keep & (carry["cold"] * pool < 2 * n_live)
                return keep

            carry = jax.lax.while_loop(cond, chunk, carry)
        else:
            # tracking variant: the req rows (injection requests) are
            # only written by tracking steps
            carry = jax.lax.fori_loop(
                0, K, lambda i, c: step_i32(step_track, c), carry
            )

        out_rows = jnp.concatenate(
            [carry[k].astype(I32) for k in rows_t], axis=0
        )
        out_rows_ref[...] = out_rows
        info_ref[...] = jnp.full((1, BL), carry["steps"], I32)

    return kernel


def _kernel_call(spec, *, eps, unknown, identity, K, BL, B, early_exit,
                 interpret, pring=PRING, ch=0, pool=8, inj_mode=True,
                 injq=INJQ):
    if interpret:
        # chunking only pays on hardware (it cuts Mosaic's per-step
        # vector→scalar reductions); in interpreter mode the unrolled
        # chunk just multiplies trace/compile time
        ch = 0
    kernel = _make_kernel(
        spec, eps=eps, unknown=unknown, identity=identity, K=K, BL=BL,
        early_exit=early_exit, pring=pring, ch=ch, pool=pool,
        inj_mode=inj_mode, injq=injq,
    )
    H = spec.H
    W = spec.C_pad if spec.cls_tab is not None else spec.A_pad
    grid = (B // BL,)
    nc = len(_rows(injq if inj_mode else 0))

    def call(w, rows, ring_T, planes):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nc, B), I32),
                jax.ShapeDtypeStruct((K, B), I32),
                jax.ShapeDtypeStruct((1, B), I32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nc, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((pring, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (2 * H, W), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec((nc, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            # The i32 iotas + per-step live set exceed the default
            # 16 MB scoped-VMEM stack at BL=2048, H=768 (measured
            # 17.7 MB); v5e has far more physical VMEM — raise the
            # per-kernel cap instead of shrinking blocks.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(w, rows, ring_T, planes)

    return call


def _general_fetches_T(rep, tables, meta_T):
    """General (serial-gather) fetches over the transposed meta layout."""
    L = meta_T.shape[0]

    def fetch_meta(carry):
        cc = jnp.clip(carry["c"], 0, L - 1)
        m = jnp.take_along_axis(meta_T, cc[None, :], axis=0)[0]
        return m, jnp.ones_like(carry["phase"], bool)

    def probe_fn(carry):
        return carry["eps_t"]

    def fetch_trans(carry, t0, t0_hid, a, a_cls):
        valid, nontok, t_next = rep.transition(tables, t0, a)
        can = jnp.ones_like(valid)
        false = jnp.zeros_like(valid)
        return can, valid, nontok, t_next, jnp.full_like(t_next, -1), false, false

    return fetch_meta, probe_fn, fetch_trans


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "unknown", "identity", "rep", "spec", "max_steps",
        "service_k", "K", "BL", "early_exit", "interpret", "pring", "ch",
        "pool", "wgrp", "svc_ns", "injq", "inj_budget",
    ),
)
def _run_machine_pallas(
    tables,
    pallas_tables,
    meta_T,
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
    K=64,
    BL=1024,
    early_exit=False,
    interpret=False,
    pring=PRING,
    ch=0,
    pool=8,
    wgrp=0,
    svc_ns=-1,
    injq=INJQ,
    inj_budget=2.0,
):
    """Fused-kernel machine: K-step Pallas rounds + XLA service steps."""
    L, B = meta_T.shape
    if L < pring:  # ring slices need `pring` rows; padding is never read
        meta_T = jnp.pad(meta_T, ((0, pring - L), (0, 0)))
    (planes, hot_index, eps_avail, lc_avail, dec_planes) = pallas_tables[:5]
    has_svc = spec.svc_ok  # packed one-gather service fetch available
    svc_packed = pallas_tables[5] if has_svc else None
    # The work budget is counted in *steps* (inner + service), not
    # rounds: every outer round advances the step counter by at least
    # one (a zero-inner-step round always runs exactly one service
    # step), so the loop terminates, while cold-heavy few-lane batches
    # — where the in-kernel early exit ends a round after ~1 step per
    # cold character — still get their full step budget.  A rounds cap
    # would starve them (each cold char costs a whole round).  The
    # extra half budget covers cold-lane pooling (see outer_body): a
    # pooled lane idles global steps between services, so its own
    # completion needs slack beyond steps_factor × its length.
    max_steps_pad = max_steps + max_steps // 2 + K + 8
    inj_capable = (
        has_svc and svc_ns != 0 and rep.S < (1 << 15)
        # the injection fingerprint packs the symbol id at bit 18 of
        # an int32 (13 usable bits) — larger sigmas would alias
        # (state, symbol) pairs and consume the WRONG entry
        and rep.max_sym < (1 << 13)
    )
    if inj_capable:
        # injection mode (set just below): a cold-stalled lane idles
        # the rest of its round awaiting the next injection, so the
        # GLOBAL step counter runs ahead of per-lane progress.  The
        # event buffer is (max_steps_pad, B) int32 — the dominant HBM
        # allocation — so the budget factor is a memory knob:
        # `inj_budget` × max_steps (+K+8).  Keep the 2.0 default: a
        # 1.5 cut was tried (per-wave specs bound PER-LANE inflation
        # at 1.83 steps/char) but the budget counts GLOBAL steps, and
        # a real mixed+novel corpus wave measured 3.02 steps per
        # char-of-L (window-stall round exits — faster per-wave lanes
        # diverge MORE within their blocks), which killed thousands
        # of still-live lanes at the 3L budget (BENCH_LOG r5).  At
        # the pipeline's B=8192 the 2.0 buffer is ~141 MB; memory-
        # constrained callers with uniform-ish workloads can lower
        # the knob — over-budget lanes stay EXACT via host repair.
        # (A per-round event RING was analyzed and rejected: rows
        # wrap onto the same lane's own earlier not-yet-fetched
        # events whenever global steps exceed the ring — per-lane
        # compaction needs an axis-0 scatter the hardware doesn't
        # have; see BENCH_LOG r5.)
        max_steps_pad = int(inj_budget * max_steps) + K + 8

    # cold-entry injection mode: available whenever the packed service
    # table exists, unless explicitly disabled (svc_ns=0 keeps the
    # classic full-gather pooled-service behavior as an A/B knob).
    # The in-kernel injected value carries the full target id in 15
    # bits (see fetch_trans), so very large models fall back to the
    # service path.
    inj_mode = inj_capable

    if injq < 1:
        injq = 1
    call = _kernel_call(
        spec, eps=eps, unknown=unknown, identity=identity, K=K, BL=BL,
        B=B, early_exit=early_exit, interpret=interpret, pring=pring,
        ch=ch, pool=pool, inj_mode=inj_mode, injq=injq,
    )
    rows_t = _rows(injq if inj_mode else 0)

    aux_map = (
        (hot_index.astype(jnp.int32) + 1)
        | (eps_avail.astype(jnp.int32) << 20)
        | (lc_avail.astype(jnp.int32) << 21)
    )

    def decode(t):
        return decode_tagged_mm2(t, dec_planes)

    def aux(carry):
        out = dict(carry)
        v = jnp.take(aux_map, jnp.clip(carry["t"], 0, aux_map.shape[0] - 1))
        out["hid"] = (v & 0xFFFFF) - 1
        out["eps_t"] = ((v >> 20) & 1) != 0
        out["lc_t"] = ((v >> 21) & 1) != 0
        return out

    fm_g, pf_g, ft_g = _general_fetches_T(rep, tables, meta_T)
    # the service step must maintain the a_cls register with the same
    # class constants as the kernel, or the next kernel round would
    # fetch a stale class after an identity→unknown retry or backtrack
    use_cls = spec.cls_tab is not None
    svc_ucls = int(spec.cls_tab[unknown]) if use_cls else 0
    svc_ecls = int(spec.cls_tab[eps]) if use_cls else 0

    full_svc = True  # non-svc (exact general) services fetch all lanes
    if has_svc:
        # ONE serial gather per service (the packed table carries
        # target + nontoken + ε/lc-avail + hot id, see HotSpec
        # svc_packed) instead of transition + aux refresh; indexing is
        # the raw matrix's (matrix.go:463)
        S_full = rep.S
        # Dedup-gather service fetch (see _dedup_gather).  Lanes whose
        # index falls beyond the NU-unique budget (or that are hot)
        # stall this step — the read phase is idempotent: hot lanes
        # advance in the next kernel round, leftover cold lanes in the
        # next service, which keeps firing while they pool.
        NU = 512 if svc_ns < 0 else svc_ns
        if NU > 0:
            while NU & (NU - 1):
                NU += NU & -NU  # round up to a power of two
        full_svc = NU == 0 or NU >= B
        lane_iota = jnp.arange(B, dtype=I32)

        def ft_svc(carry, t0, t0_hid, a, a_cls):
            idx = jnp.clip((a - 1) * S_full + t0, 0, svc_packed.shape[0] - 1)
            if full_svc:
                e = jnp.where(a > 0, jnp.take(svc_packed, idx), 0)
                # compose the per-spec hot id (full-gather A/B path)
                e = e | ((jnp.take(
                    hot_index,
                    jnp.clip(e & 0x3FFFF, 0, hot_index.shape[0] - 1),
                ) + 1) << 21)
                can = jnp.ones_like(e, bool)
            else:
                live = (carry["phase"] == 0) | (carry["pend"] != 0)
                need = live & (t0_hid < 0) & (a > 0)
                v = _dedup_gather(svc_packed, idx, need, NU, lane_iota,
                                  hot_index=hot_index)
                can = v < 0  # bit 31: fetch happened for this lane
                e = v & jnp.int32(0x7FFFFFFF)
            valid = e != 0
            t_next = e & 0x3FFFF
            nontok = ((e >> 18) & 1) != 0
            epst = ((e >> 19) & 1) != 0
            lct = ((e >> 20) & 1) != 0
            t_hid = ((e >> 21) & 0x3FF) - 1
            return can, valid, nontok, t_next, t_hid, epst, lct

        svc_ft, svc_aux = ft_svc, None
    else:
        svc_ft, svc_aux = ft_g, aux

    def make_service_step(fetch_meta):
        return _make_step(
            eps=eps,
            unknown=unknown,
            identity=identity,
            fetch_meta=fetch_meta,
            probe_fn=pf_g,
            fetch_trans=svc_ft,
            aux_update=svc_aux,
            eps1=spec.eps1,
            hid1=spec.hid1,
            lc1=spec.lc1,
            unknown_cls=svc_ucls,
            eps_cls=svc_ecls,
        )

    def live_mask(carry):
        return (carry["phase"] == 0) | (carry["pend"] != 0)

    def service_cond(carry):
        return carry["need_srv"]

    def make_service_body(step_srv, w_lane=None):
        def service_body(carry):
            out = dict(carry)
            # resolve tagged registers before the exact general step
            out["t"] = decode(out["t"])
            out["t0"] = decode(out["t0"])
            out["eps_s"] = decode(out["eps_s"])
            out["ckpt"] = decode(out["ckpt"] & 0x0FFFFFFF) | (
                out["ckpt"] & jnp.int32(0x70000000)
            )
            out = step_srv(out)
            out["since"] = jnp.int32(0)
            out["services"] = carry["services"] + 1
            # Burst: keep servicing while the pooled-cold share stays
            # above the trigger.  With the budgeted (sort-compacted)
            # fetch a service costs ~NS, not B, serial elements, so
            # draining a large pool in consecutive service steps is
            # ~10× cheaper than interleaving a mostly-stalled kernel
            # round between each (which burned the global step budget
            # and killed over-budget lanes — bad=4399 on the rotated
            # probe).  Full-gather services (svc_ns=0) keep the old
            # one-shot behavior: bursts were a measured net loss there.
            if full_svc:
                out["need_srv"] = jnp.array(False)
            else:
                # bounded: cold-CHAIN lanes stay cold for many chars
                # (rare-word regions), so an unbounded drain would feed
                # whole documents through the 1-char/step service path
                # while every hot lane idles (measured: 3295 services,
                # one kernel round, all lanes over budget)
                out["burst"] = carry["burst"] + 1
                live2 = live_mask(out)
                cold = live2 & (
                    (out["hid"] < 0) | (out["t0_hid"] < 0)
                )
                if w_lane is not None:
                    cold = cold & ((out["c"] - w_lane) < pring)
                n_live2 = jnp.sum(live2.astype(I32))
                out["need_srv"] = (
                    (jnp.sum(cold.astype(I32)) * pool >= n_live2)
                    & (out["steps"] + 2 <= max_steps_pad)
                    & (out["burst"] < 3)
                )
            return out

        return service_body

    service_body_exact = make_service_body(make_service_step(fm_g))

    # ring-window group size: wgrp lanes share one window base
    # (wgrp=0 → one window per kernel block, the round-2 behavior)
    G = min(wgrp, BL) if wgrp > 0 else BL
    assert BL % G == 0, "wgrp must divide the kernel block size"

    def outer_body(carry):
        live = live_mask(carry)
        c_live = jnp.where(live, carry["c"], jnp.int32(1 << 28))
        # Per-GROUP ring windows: each G-lane group's window follows
        # its own slowest live lane.  A single global window pins every
        # lane to the globally slowest one; with heterogeneous lanes
        # the content-dependent speed spread exceeds the ring and most
        # lanes meta-stall (measured: rounds ballooned 12 → 149 on the
        # rotated-text benchmark).  Group granularity below the kernel
        # block (G < BL) shrinks the convoy domain further: only lanes
        # sharing a 128/256-lane group convoy, which closes most of the
        # heterogeneous-batch gap (see BENCH_LOG round 3).
        w_grp = jnp.clip(
            jnp.min(c_live.reshape(B // G, G), axis=1),
            0, max(0, L - pring),
        )
        ring_T = jnp.concatenate(
            [
                jax.lax.dynamic_slice(
                    meta_T, (w_grp[g], g * G), (pring, G)
                )
                for g in range(B // G)
            ],
            axis=1,
        )
        w_lane = jnp.repeat(w_grp, G).astype(I32)
        rows = _pack_rows(carry, rows_t)
        out_rows, ys_chunk, info = call(
            w_lane.reshape(1, B), rows, ring_T, planes
        )
        out = _unpack_rows(out_rows, carry, rows_t)
        n_inner = jnp.max(info[0])
        out["ys"] = jax.lax.dynamic_update_slice(
            carry["ys"], ys_chunk, (carry["steps"], 0)
        )
        out["steps"] = carry["steps"] + n_inner
        out["since"] = carry["since"] + n_inner
        out["rounds"] = carry["rounds"] + 1
        out["services"] = carry["services"]
        out["burst"] = jnp.int32(0)
        live2 = live_mask(out)
        if inj_mode:
            # Entry INJECTION: answer every cold-stalled lane's
            # recorded (state, symbol) request with the exact packed
            # transition entry, memoized into the inj rows the next
            # kernel round consumes (see the fetch_trans injection
            # branch).  With requests answered in-line, the kernel
            # never exits a round for cold lanes and the per-round
            # XLA service step disappears from the steady state —
            # the dedup gather costs three small sorts plus a serial
            # gather of the UNIQUE pairs only (~hundreds at B=32K
            # heterogeneous, a handful uniform), versus a ~1.3 ms
            # full-batch gather per service before.
            req_t0 = out["req_t0"]
            req_a = out["req_a"]
            need = live2 & (req_a > 0)
            t0_full = decode(req_t0)
            inj_idx = jnp.clip(
                (req_a - 1) * S_full + t0_full,
                0, svc_packed.shape[0] - 1,
            )
            v = _dedup_gather(
                svc_packed, inj_idx, need, NU, lane_iota,
                hot_index=hot_index,
            )
            e = v & jnp.int32(0x7FFFFFFF)
            # Slot 0: the answered stall request, fingerprinted by the
            # TAGGED req_t0 the kernel recorded (the kernel's probe
            # compresses its live t0 the same way — _fp_of_t0).
            fp_rows = jnp.zeros((injq, B), I32)
            e_rows = jnp.zeros((injq, B), I32)
            fp_rows = fp_rows.at[0].set(
                jnp.where(v < 0, _fp_of_t0(req_t0) | (req_a << 18), 0)
            )
            e_rows = e_rows.at[0].set(
                jnp.where(v < 0, _pack_inj(e), 0)
            )
            # Chain PREDICTION (slots 1..injq-1): walk the general
            # table forward along each stalled lane's upcoming input
            # symbols, injecting the whole predicted cold chain so the
            # kernel consumes one entry per STEP instead of one per
            # ROUND (round-4's measured cold-chain cost: ~10-step
            # rounds that are all launch+glue, 181 of them on the
            # mixed-real bench).  The prediction simulates only the
            # consume path — a predicted pair that the real machine
            # never fetches (ε boundary, run skip, backtrack, EOT)
            # self-invalidates by fingerprint mismatch at zero cost.
            # Position bookkeeping: slot 0 consumes at the stalled
            # cursor c (or rewinds without advancing if the request
            # was an ε fetch), so slot q≥1 fetches the symbol at
            # c + (req_a != ε) + q − 1, read from the SAME per-group
            # ring window the kernel round just used (stalled lanes
            # are their group's slow lanes, so the window covers them;
            # out-of-window positions just end the chain).  The walk
            # stops at hot targets (the planes serve those), invalid
            # entries (the real machine backtracks — unpredictable
            # here), EOT, and end-of-lane.  The whole loop runs only
            # while ≥ CH_MIN chains survive: uniform batches (a
            # handful of requests) pay ZERO chain iterations — the
            # while_loop body never executes (a single-iteration
            # while_loop is a true branch on TPU, see BENCH_LOG
            # hardware facts).
            hid0 = ((e >> 21) & 0x3FF) - 1
            chn0 = (v < 0) & (e != 0) & (hid0 < 0)
            base = out["c"] + (req_a != eps).astype(I32)
            CH_MIN = max(16, B // 2048)
            n0 = jnp.sum(chn0.astype(I32))

            def chain_cond(st):
                return (st["q"] < injq) & (st["n"] >= CH_MIN)

            def chain_body(st):
                q = st["q"]
                pos = base + q - 1
                off = pos - w_lane
                okw = (off >= 0) & (off < pring) & (pos < out["length"])
                (mq,) = _tree_gather_rows(
                    (ring_T,), jnp.clip(off, 0, pring - 1)[None, :]
                )
                mq = mq[0]
                a_q = mq & META_A_MASK
                ok_ch = (
                    st["chn"] & okw & (a_q > 0)
                    & ((mq & META_EOT) == 0)
                )
                idx_q = jnp.clip(
                    (a_q - 1) * S_full + st["t"],
                    0, svc_packed.shape[0] - 1,
                )
                v_q = _dedup_gather(
                    svc_packed, idx_q, ok_ch, NU, lane_iota,
                    hot_index=hot_index,
                )
                e_q = v_q & jnp.int32(0x7FFFFFFF)
                got = v_q < 0
                # untagged full-id fingerprint class (< 2^15)
                fp_q = (st["t"] & 0x7FFF) | (a_q << 18)
                st["fp"] = jax.lax.dynamic_update_slice(
                    st["fp"], jnp.where(got, fp_q, 0)[None, :], (q, 0)
                )
                st["e"] = jax.lax.dynamic_update_slice(
                    st["e"], jnp.where(got, _pack_inj(e_q), 0)[None, :],
                    (q, 0),
                )
                hid_q = ((e_q >> 21) & 0x3FF) - 1
                st["t"] = e_q & 0x7FFF
                st["chn"] = got & (e_q != 0) & (hid_q < 0) & ok_ch
                st["n"] = jnp.sum(st["chn"].astype(I32))
                st["q"] = q + 1
                return st

            st = jax.lax.while_loop(
                chain_cond, chain_body,
                {
                    "q": jnp.int32(1),
                    "n": n0,
                    "t": e & 0x7FFF,
                    "chn": chn0,
                    "fp": fp_rows,
                    "e": e_rows,
                },
            )
            for q in range(injq):
                out[f"inj_fp{q}"] = st["fp"][q]
                out[f"inj_e{q}"] = st["e"][q]
            # services remain only as a safety net: a round that made
            # no progress at all (shouldn't happen — injected lanes
            # advance next round) or the staleness heartbeat.
            # (Round-4 A/B: ALSO bursting dedup-gather services on
            # dense cold pools — to walk cold CHAINS in one boundary —
            # measured strictly worse on every workload: each service
            # still pays the 4-register tagged decode + step, ~0.5 ms;
            # hetero 277 → 166, mixed 131 → 63 MB/s.  Chain INJECTION
            # replaced that: the chain is walked outside the step
            # machine, so it pays plain gathers, not decodes+steps.)
            out["need_srv"] = jnp.any(live2) & (
                (n_inner == 0) | (out["since"] >= service_k)
            )
        else:
            cold_lane = live2 & (
                (out["hid"] < 0) | (out["t0_hid"] < 0)
            )
            # Pool cold lanes instead of servicing on first demand: a
            # service costs serial gathers over ALL B lanes (~ms at
            # B=32K), while a stalled lane idles in-kernel at zero
            # marginal wall cost.  Service when ≥1/pool of the *live*
            # lanes are pooled (scales down as lanes finish, so tails
            # drain), on heartbeat, or when nothing progressed.
            n_live2 = jnp.sum(live2.astype(I32))
            cold_cnt = jnp.sum(cold_lane.astype(I32))
            out["need_srv"] = jnp.any(live2) & (
                (cold_cnt * pool >= n_live2)
                | (out["since"] >= service_k)
                | (n_inner == 0)
                | ((cold_cnt > 0) & (n_inner * 4 <= K))
            )
        if has_svc:
            # Windowed service meta fetch: a tree-select over the SAME
            # per-block ring windows the kernel round just used,
            # replacing the serial take_along_axis over (L, B) — the
            # largest of the three per-service serial gathers.  Lanes
            # more than `pring` ahead of their block's slowest live
            # lane meta-stall (exact: the read phase is idempotent and
            # re-runs once the window catches up); the slowest lane of
            # every group is always in window, so rounds always
            # progress.
            def fm_srv(carry):
                off = carry["c"] - w_lane
                can = (off >= 0) & (off < pring)
                (v,) = _tree_gather_rows(
                    (ring_T,), jnp.clip(off, 0, pring - 1)
                )
                return v[0], can

            # (Service BURSTS — chaining service steps while cold lanes
            # stay dense — were measured a net LOSS on the rotated
            # probe: pool32 188 vs 237 MB/s.  A service step costs a
            # full serial gather over B regardless of how few lanes
            # need it, so extra services overwhelm the rounds saved.)
            body = make_service_body(make_service_step(fm_srv), w_lane)
        else:
            body = service_body_exact
        return jax.lax.while_loop(service_cond, body, out)

    def outer_cond(carry):
        return (carry["steps"] + K + 2 <= max_steps_pad) & jnp.any(
            live_mask(carry)
        )

    init = _init_carry(
        B, max_steps_pad, length, spec.eps1, spec.hid1,
        ctx_init=ctx_init, hid_init=hid_init, epst_init=epst_init,
        lc_init=lc_init, stop_flags=stop_flags,
    )
    init["since"] = jnp.int32(0)
    init["rounds"] = jnp.int32(0)
    init["burst"] = jnp.int32(0)
    for k in rows_t:
        if k not in init:
            init[k] = jnp.zeros(B, I32)
    init["services"] = jnp.int32(0)
    out = jax.lax.while_loop(outer_cond, outer_body, init)

    # decode tagged registers for the exit state
    bad = (out["phase"] == 0) | (out["pend"] != 0)
    t_dec = decode(out["t"])
    ckpt_dec = decode(out["ckpt"] & 0x0FFFFFFF) | (
        out["ckpt"] & jnp.int32(0x70000000)
    )
    ctx = (
        t_dec
        | (out["sflag"].astype(I32) << 28)
        | (out["tflag"].astype(I32) << 29)
        | (out["ok"].astype(I32) << 30)
    )
    state = jnp.stack(
        [ctx, ckpt_dec, out["b"], out["c"], out["n_backtrack"], out["n_force"]],
        axis=-1,
    )
    stats = jnp.stack([out["rounds"], out["services"], out["since"]])
    return out["ys"], bad, out["steps"], state, stats


class PallasSpec:
    """Device tables for the fused kernel, derived from a HotSpec."""

    def __init__(self, spec: HotSpec):
        if not spec.pallas_ok:
            raise ValueError(
                f"hot set does not fit the packed-entry format "
                f"(H={spec.H}, cold={spec.n_cold}, max 2047 each)"
            )
        self.spec = spec
        p2 = 1
        while p2 < max(2, spec.H):
            p2 *= 2
        hf = np.zeros(p2, dtype=np.int32)
        hf[: spec.H] = spec.hot_full
        ef = np.zeros(p2, dtype=np.int32)
        ef[: spec.H] = spec.hot_eps_full
        # byte planes of all three id tables for the one-hot matmul
        # decode (hot | cold | ε-target), padded to one shared pow2
        P2 = max(p2, len(spec.cold_full_p2))
        dec = np.concatenate(
            [
                _id_byte_planes(hf, P2),
                _id_byte_planes(spec.cold_full_p2, P2),
                _id_byte_planes(ef, P2),
            ],
            axis=1,
        )  # (P2, 12) int8
        # two-level re-layout for decode_tagged_mm2: pay = hi*LO + lo
        LO = min(128, P2)
        HI = P2 // LO
        dec2 = np.ascontiguousarray(
            dec.reshape(HI, LO, 12).transpose(1, 0, 2).reshape(LO, HI * 12)
        )
        self.tables = (
            # class-compressed when available (identical to planes_kT
            # column-for-column through cls_tab; see HotSpec)
            jnp.asarray(spec.planes_cls_kT),   # (2H, C_pad|A_pad) int8
            jnp.asarray(spec.hot_index),
            _dev_cached(spec.eps_avail),        # tok-level: shared
            _dev_cached(spec.lc_avail),         # across per-wave specs
            jnp.asarray(dec2),                  # (LO, HI*12) decode planes
        ) + (
            # static service table (no hot ids — composed on device
            # from hot_index, see _dedup_gather): shared across
            # per-wave specs, uploaded once per tokenizer
            (_dev_cached(spec.svc_static),) if spec.svc_ok else ()
        )
        # raw id tables for decode_tagged (debug/inspection only — the
        # machine decodes via the matmul planes)
        self.debug_id_tables = (
            jnp.asarray(hf),                    # hot_full, pow2
            jnp.asarray(spec.cold_full_p2),     # cold side table, pow2
            jnp.asarray(ef),                    # ε-target full ids, pow2
        )
