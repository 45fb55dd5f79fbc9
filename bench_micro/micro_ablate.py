"""Ablate the hot-step fetch to find the real bottleneck, and debug the
pallas/xla loop divergence."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("MB_B", "16384"))
H = int(os.environ.get("MB_H", "384"))
BL = int(os.environ.get("MB_BL", "1024"))
A_pad = 256
STEPS = int(os.environ.get("MB_STEPS", "64"))
I32 = jnp.int32

rng = np.random.default_rng(0)
planes_np = rng.integers(0, 256, (A_pad, 3 * H)).astype(np.float32)
planes_bf = jnp.asarray(planes_np, dtype=jnp.bfloat16)
iota_A = jnp.arange(A_pad, dtype=I32)
iota_H = jnp.arange(H, dtype=I32)


def timed(tag, body):
    a0 = jnp.asarray(np.random.randint(1, 200, B).astype(np.int32))
    h0 = jnp.asarray(np.random.randint(0, H, B).astype(np.int32))
    jb = jax.jit(body)
    out = jax.block_until_ready(jb(a0, h0))
    t0 = time.time()
    REPS = 5
    for _ in range(REPS):
        out = jax.block_until_ready(jb(a0, h0))
    dt = (time.time() - t0) / REPS
    print(
        json.dumps(
            {
                "variant": tag,
                "B": B,
                "ns_per_lane_step": round(dt / (B * STEPS) * 1e9, 3),
                "us_per_step": round(dt / STEPS * 1e6, 1),
            }
        ),
        flush=True,
    )
    return np.asarray(out)


def loop(fetch):
    def body(a0, h0):
        def step(i, carry):
            a, h, acc = carry
            entry = fetch(a, h)
            t_next = (entry >> 5) % H
            a_next = (a + 1) & (A_pad - 1)
            return a_next, t_next, acc ^ entry

        a, h, acc = jax.lax.fori_loop(0, STEPS, step, (a0, h0, jnp.zeros(B, I32)))
        return acc

    return body


# --- variants ---------------------------------------------------------------


def fetch_full(a, h):
    oh = ((a[:, None] == iota_A[None, :]) & (a > 0)[:, None]).astype(jnp.bfloat16)
    rows = jnp.dot(oh, planes_bf, preferred_element_type=jnp.float32)
    msel = iota_H[None, :] == h[:, None]
    lo = jnp.sum(jnp.where(msel, rows[:, :H], 0.0), axis=1).astype(I32)
    mid = jnp.sum(jnp.where(msel, rows[:, H : 2 * H], 0.0), axis=1).astype(I32)
    hi = jnp.sum(jnp.where(msel, rows[:, 2 * H :], 0.0), axis=1).astype(I32)
    return lo | (mid << 8) | (hi << 16)


def fetch_matmul_only(a, h):
    oh = ((a[:, None] == iota_A[None, :]) & (a > 0)[:, None]).astype(jnp.bfloat16)
    rows = jnp.dot(oh, planes_bf, preferred_element_type=jnp.float32)
    # cheap consumer: first column only (keeps rows alive, no select)
    return rows[:, 0].astype(I32) ^ h


def fetch_onehot_only(a, h):
    oh = ((a[:, None] == iota_A[None, :]) & (a > 0)[:, None]).astype(jnp.bfloat16)
    return jnp.sum(oh, axis=1).astype(I32) ^ h


def fetch_select_only(a, h):
    # fresh non-matmul rows: broadcast compute to avoid gather matching
    rows = (a[:, None] + jnp.arange(3 * H, dtype=I32)[None, :]).astype(jnp.float32)
    msel = iota_H[None, :] == h[:, None]
    lo = jnp.sum(jnp.where(msel, rows[:, :H], 0.0), axis=1).astype(I32)
    mid = jnp.sum(jnp.where(msel, rows[:, H : 2 * H], 0.0), axis=1).astype(I32)
    hi = jnp.sum(jnp.where(msel, rows[:, 2 * H :], 0.0), axis=1).astype(I32)
    return lo | (mid << 8) | (hi << 16)


def fetch_noop(a, h):
    return a ^ h


def make_pallas(n_planes=3, include_select=True):
    def kernel(a_ref, h_ref, planes_ref, out_ref):
        a = a_ref[...]
        h = h_ref[...]
        iota_a = jax.lax.broadcasted_iota(I32, (BL, A_pad), 1)
        oh = ((a == iota_a) & (a > 0)).astype(jnp.bfloat16)
        rows = jnp.dot(oh, planes_ref[...], preferred_element_type=jnp.float32)
        if include_select:
            iota_h = jax.lax.broadcasted_iota(I32, (BL, H), 1)
            msel = iota_h == h
            acc = jnp.zeros((BL, 1), I32)
            for k in range(n_planes):
                v = jnp.sum(
                    jnp.where(msel, rows[:, k * H : (k + 1) * H], 0.0),
                    axis=1,
                    keepdims=True,
                )
                acc = acc | (v.astype(I32) << (8 * k))
            out_ref[...] = acc
        else:
            out_ref[...] = rows[:, :1].astype(I32)

    def fetch(a, h):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 1), I32),
            grid=(B // BL,),
            in_specs=[
                pl.BlockSpec((BL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (A_pad, n_planes * H), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((BL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(a[:, None], h[:, None], planes_bf[:, : n_planes * H])
        return out[:, 0]

    return fetch


def main():
    # ---- debug divergence first (cheap, one step at matching inputs)
    pal = make_pallas()
    a = jnp.asarray(rng.integers(0, A_pad, B).astype(np.int32))
    h = jnp.asarray(rng.integers(0, H, B).astype(np.int32))
    e_x = np.asarray(jax.jit(fetch_full)(a, h))
    e_p = np.asarray(jax.jit(pal)(a, h))
    bad = np.flatnonzero(e_x != e_p)
    print(json.dumps({"single_call_mismatches": int(len(bad))}), flush=True)

    # two fetches chained (like the loop)
    def two(fetch):
        def f(a, h):
            e1 = fetch(a, h)
            h2 = (e1 >> 5) % H
            a2 = (a + 1) & (A_pad - 1)
            return fetch(a2, h2)

        return f

    t_x = np.asarray(jax.jit(two(fetch_full))(a, h))
    t_p = np.asarray(jax.jit(two(pal))(a, h))
    bad2 = np.flatnonzero(t_x != t_p)
    print(json.dumps({"two_step_mismatches": int(len(bad2))}), flush=True)
    if len(bad2):
        i = int(bad2[0])
        print("lane", i, "a", int(a[i]), "h", int(h[i]), "xla", hex(t_x[i]),
              "pal", hex(t_p[i]), flush=True)

    # ---- ablation timings
    timed("noop", loop(fetch_noop))
    timed("onehot_only", loop(fetch_onehot_only))
    timed("matmul_only", loop(fetch_matmul_only))
    timed("select_only", loop(fetch_select_only))
    timed("full_xla", loop(fetch_full))
    timed("pallas_full", loop(pal))
    timed("pallas_matmul_only", loop(make_pallas(include_select=False)))


if __name__ == "__main__":
    main()
