"""Microbenchmark: hot-step matmul variants on the real chip.

Compares the core one-hot row-select matmul of the hot machine
(jax_engine._hot_fetches) across dtype/width variants:

  bf16_3p : one-hot bf16 (B,256) @ (256, 3H) bf16  [current engine]
  bf16_2p : one-hot bf16 (B,256) @ (256, 2H) bf16  [2-plane packing]
  int8_3p : one-hot int8 (B,256) @ (256, 3H) int8 -> int32
  int8_2p : one-hot int8 (B,256) @ (256, 2H) int8 -> int32

Each variant also does the mask-reduce column select + entry decode so
the number reflects the full per-step fetch cost, not just the matmul.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

B = int(os.environ.get("MB_B", "16384"))
H = int(os.environ.get("MB_H", "384"))
A_pad = 256
STEPS = int(os.environ.get("MB_STEPS", "64"))
I32 = jnp.int32


def run_variant(name, planes_np, n_planes, dtype):
    iota_A = jnp.arange(A_pad, dtype=I32)
    iota_H = jnp.arange(H, dtype=I32)
    planes = jnp.asarray(planes_np, dtype=dtype)

    @jax.jit
    def body(a0, h0):
        def step(i, carry):
            a, t0_hid, acc = carry
            if dtype == jnp.int8:
                oh = ((a[:, None] == iota_A[None, :]) & (a > 0)[:, None]).astype(
                    jnp.int8
                )
                rows = jax.lax.dot_general(
                    oh, planes,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                msel = iota_H[None, :] == t0_hid[:, None]
                parts = [
                    jnp.sum(jnp.where(msel, rows[:, k * H : (k + 1) * H], 0), axis=1)
                    + 128
                    for k in range(n_planes)
                ]
            else:
                oh = ((a[:, None] == iota_A[None, :]) & (a > 0)[:, None]).astype(
                    jnp.bfloat16
                )
                rows = jnp.dot(oh, planes, preferred_element_type=jnp.float32)
                msel = iota_H[None, :] == t0_hid[:, None]
                parts = [
                    jnp.sum(
                        jnp.where(msel, rows[:, k * H : (k + 1) * H], 0.0), axis=1
                    ).astype(I32)
                    for k in range(n_planes)
                ]
            entry = parts[0]
            for k in range(1, n_planes):
                entry = entry | (parts[k] << (8 * k))
            # feed outputs back so nothing is DCE'd; fake state advance
            t_next = (entry >> 5) & (H - 1)
            a_next = (a + 1) & (A_pad - 1)
            return a_next, t_next, acc ^ entry

        a, h, acc = jax.lax.fori_loop(
            0, STEPS, step, (a0, h0, jnp.zeros(B, I32))
        )
        return acc

    a0 = jnp.asarray(np.random.randint(1, 200, B).astype(np.int32))
    h0 = jnp.asarray(np.random.randint(0, H, B).astype(np.int32))
    out = jax.block_until_ready(body(a0, h0))  # compile
    t0 = time.time()
    REPS = 5
    for _ in range(REPS):
        out = jax.block_until_ready(body(a0, h0))
    dt = (time.time() - t0) / REPS
    ns_per_lane_step = dt / (B * STEPS) * 1e9
    print(
        json.dumps(
            {
                "variant": name,
                "B": B,
                "H": H,
                "steps": STEPS,
                "ns_per_lane_step": round(ns_per_lane_step, 3),
                "ms_per_call": round(dt * 1e3, 2),
            }
        ),
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    for name, n_planes, dtype in [
        ("bf16_3p", 3, jnp.bfloat16),
        ("bf16_2p", 2, jnp.bfloat16),
        ("int8_3p", 3, jnp.int8),
        ("int8_2p", 2, jnp.int8),
    ]:
        if dtype == jnp.int8:
            planes = rng.integers(-128, 128, (A_pad, n_planes * H)).astype(np.int8)
        else:
            planes = rng.integers(0, 256, (A_pad, n_planes * H)).astype(np.float32)
        run_variant(name, planes, n_planes, dtype)


if __name__ == "__main__":
    main()
