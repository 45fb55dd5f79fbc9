#!/usr/bin/env python
"""Step-budget model: where do the kernel's steps/char go, and what
would generalized (suffix-table) letter-run skipping buy?

Current kernel skip: a state that SELF-LOOPS on every letter of the
adaptive skip class consumes a whole class-run in one step.  The DE
model's word-interior machinery is richer: {18097, 18057, 14125, ...}
is a small letter-CLOSED set in which the state after a long letter
run depends only on the run's SUFFIX (a definite sub-automaton — the
's'/'st' genitive machinery).  A suffix-table skip could consume FULL
[a-z] runs from any state of such a set, with the encoder stamping the
run's exit/probe state ids into meta.

This script measures, on the bench text + mixed corpus:
  * oracle transitions/char (the no-skip upper bound)
  * modeled steps/char under the CURRENT skip semantics
  * modeled steps/char under DEFINITE-closure full-letter skipping
  * the definite closures found (sets, order k, ε-uniformity)

Host-only (numpy; no TPU).
"""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def letter_maps(tok, letters):
    arr = np.asarray(tok.array, dtype=np.uint32)
    S = tok.state_count
    FIRST = np.uint32(1 << 31)
    syms = np.array([tok.sigma[ord(c)] for c in letters], dtype=np.int64)
    cells = arr[(syms[:, None] - 1) * S + np.arange(S + 1)[None, :]]
    tgt = (cells & ~FIRST).astype(np.int64)  # (26, S+1)
    valid = cells != 0
    nontok = (cells >> 31).astype(bool)
    eps = tok.epsilon
    eps_avail = arr[(eps - 1) * S + np.arange(S + 1)] != 0
    return tgt, valid, nontok, eps_avail


def closure_info(s0, tgt, valid, nontok, eps_avail, max_states=64,
                 max_k=8):
    """Letter-closure of s0: (closure set, definite order k, ok) where
    ok means every closure state accepts every letter with nontok=False
    and shared ε-availability, and the subset walk collapses to
    singletons within max_k letters (definite)."""
    clo = {s0}
    frontier = [s0]
    while frontier:
        s = frontier.pop()
        if not valid[:, s].all() or nontok[:, s].any():
            return None
        for t in set(tgt[:, s].tolist()):
            if t not in clo:
                if len(clo) >= max_states:
                    return None
                clo.add(t)
                frontier.append(t)
    if len({bool(eps_avail[s]) for s in clo}) != 1:
        return None
    # definiteness: subset walk — uncertainty sets must all collapse
    # to singletons after ≤ max_k letters
    cur = {frozenset(clo)}
    for k in range(max_k + 1):
        if all(len(u) == 1 for u in cur):
            return frozenset(clo), k, True
        nxt = set()
        for u in cur:
            for li in range(tgt.shape[0]):
                nxt.add(frozenset(int(tgt[li, s]) for s in u))
        cur = nxt
        if len(cur) > 4096:
            return None
    return None


def main():
    import datok_tpu as dt
    from datok_tpu.runtime.oracle import transduce_events
    from bench import BENCH_TEXT

    tok = dt.load_matrix_file(
        "/root/reference/testdata/tokenizer_de.matok"
    )
    letters = [chr(c) for c in range(97, 123)]
    tgt, valid, nontok, eps_avail = letter_maps(tok, letters)
    letter_set = set(tok.sigma[ord(c)] for c in letters)

    # current engine skip class/states (HotSpec without jax device use)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    from datok_tpu.runtime.jax_engine import (HotSpec,
                                              default_profile_texts,
                                              profile_hot_states)

    hot = profile_hot_states(tok, default_profile_texts(tok), "auto")
    spec = HotSpec(tok, hot)
    lc_avail = spec.lc_avail.astype(bool)
    cls_letters = set(
        tok.sigma[cp] for cp in np.flatnonzero(spec.lc_mask)
    )

    # definite closures reachable in practice: test every state seen
    # in the trace as a run entry
    doc = (BENCH_TEXT * 3)[:3000] + ".\x04"
    trace = []
    transduce_events(tok, doc, trace_box=trace)
    n_chars = len(doc)

    # group consecutive consuming transitions: a record consumes iff
    # the next record's cursor advanced by one
    steps_oracle = len(trace)
    clo_cache = {}

    def closure(s):
        if s not in clo_cache:
            clo_cache[s] = closure_info(
                s, tgt, valid, nontok, eps_avail
            )
        return clo_cache[s]

    cur_steps = 0
    new_steps = 0
    i = 0
    N = len(trace)
    runs_hist = defaultdict(int)
    while i < N:
        t0, a, c = trace[i]
        # maximal run of letter-consuming records starting here
        j = i
        while j < N and trace[j][1] in letter_set:
            # consuming = cursor advances at next record
            nc = trace[j + 1][2] if j + 1 < N else trace[j][2] + 1
            if nc != trace[j][2] + 1:
                break
            j += 1
        m = j - i
        if m >= 2:
            # CURRENT semantics: within the run, consecutive chars in
            # the engine class while the state self-loops collapse
            k = i
            csteps = 0
            while k < j:
                s_k, a_k, _ = trace[k]
                if lc_avail[s_k] and a_k in cls_letters:
                    k2 = k
                    while (
                        k2 < j
                        and trace[k2][1] in cls_letters
                        and trace[k2][0] == s_k
                    ):
                        k2 += 1
                    csteps += 1
                    k = k2
                else:
                    csteps += 1
                    k += 1
            cur_steps += csteps
            # PROPOSED: one step for the entire run when the entry
            # state's letter-closure is definite
            info = closure(t0)
            if info is not None:
                new_steps += 1
                runs_hist[m] += 1
            else:
                new_steps += csteps
            i = j
        else:
            cur_steps += 1
            new_steps += 1
            i += 1

    print(f"chars: {n_chars}")
    print(f"oracle transitions/char: {steps_oracle / n_chars:.3f}")
    print(f"modeled CURRENT steps/char: {cur_steps / n_chars:.3f}")
    print(f"modeled PROPOSED steps/char: {new_steps / n_chars:.3f}")
    print(f"collapsed runs by length: {dict(sorted(runs_hist.items()))}")
    defs = [
        (s, v) for s, v in clo_cache.items() if v is not None
    ]
    print(f"definite closures found: {len(defs)}")
    seen = set()
    for s, (clo, k, _ok) in defs:
        key = tuple(sorted(clo))
        if key in seen:
            continue
        seen.add(key)
        print(f"  closure {sorted(clo)[:8]}{'...' if len(clo) > 8 else ''} "
              f"size={len(clo)} definite-order={k}")


if __name__ == "__main__":
    main()
