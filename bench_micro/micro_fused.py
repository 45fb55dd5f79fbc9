"""Prototype: fully fused inner-loop Pallas kernel (structure test).

Simplified state walk with the same structural elements as the real
hot machine:
  - carries as (1, BL) int32 rows, loop-carried in an in-kernel fori_loop
  - transposed one-hot int8 matmul: (2H,256)i8 @ (256,BL)i8 -> i32
  - column select via sublane mask-reduce over (H, BL)
  - ring meta fetch via sublane mask-reduce over (RING, BL)
  - per-step event row write ys[step, :]

Semantics here: t' = table[a, h]; a from ring at cursor c; c+=1;
emit = (t' << 8) | step parity stuff — checked against numpy replay.
"""

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
K = int(os.environ.get("MB_K", "64"))
RING = 128
A_pad = 256
I32 = jnp.int32
INTERPRET = bool(int(os.environ.get("MB_INTERPRET", "0")))

rng = np.random.default_rng(0)
# packed 16-bit entries in 2 planes: payload = next hot id (11 bits) + flags
table = rng.integers(0, 1 << 16, (A_pad, H)).astype(np.int64)
planes_T = np.stack(
    [(table & 0xFF).T, ((table >> 8) & 0xFF).T], axis=0
).reshape(2 * H, A_pad)  # (2H, A_pad): plane-major rows
planes_i8 = (planes_T - 128).astype(np.int8)

ring_np = rng.integers(1, 200, (RING, B)).astype(np.int32)
h0_np = rng.integers(0, H, B).astype(np.int32)


def kernel(ring_ref, planes_ref, h_ref, ys_ref, hout_ref):
    iota_a = jax.lax.broadcasted_iota(I32, (A_pad, BL), 0)
    iota_h = jax.lax.broadcasted_iota(I32, (H, BL), 0)
    iota_r = jax.lax.broadcasted_iota(I32, (RING, BL), 0)
    ring = ring_ref[...]
    planes = planes_ref[...]

    def step(i, carry):
        h, c = carry
        # ring meta fetch: mask-reduce over sublanes
        a = jnp.sum(jnp.where(iota_r == c, ring, 0), axis=0, keepdims=True)
        # transposed one-hot int8 matmul
        oh = ((iota_a == a) & (a > 0)).astype(jnp.int8)
        rows = jax.lax.dot_general(
            planes, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (2H, BL)
        msel = iota_h == h
        lo = jnp.sum(jnp.where(msel, rows[:H], 0), axis=0, keepdims=True) + 128
        hi = jnp.sum(jnp.where(msel, rows[H:], 0), axis=0, keepdims=True) + 128
        entry = lo | (hi << 8)
        h_new = entry & (1 << 11) - 1
        h_new = jnp.where(h_new >= H, h_new - H, h_new)
        h_new = jnp.where(h_new >= H, 0, h_new)
        emit = entry ^ i
        ys_ref[pl.ds(i, 1), :] = emit
        return h_new, (c + 1) % RING

    h = h_ref[...]
    c = jnp.zeros((1, BL), I32)
    h, c = jax.lax.fori_loop(0, K, step, (h, c))
    hout_ref[...] = h


@jax.jit
def run(ring, h0):
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, B), I32),
            jax.ShapeDtypeStruct((1, B), I32),
        ),
        grid=(B // BL,),
        in_specs=[
            pl.BlockSpec((RING, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, A_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BL), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=INTERPRET,
    )(ring, planes_i8, h0)


def numpy_replay():
    h = h0_np.copy()
    c = np.zeros(B, np.int64)
    ys = np.zeros((K, B), np.int64)
    for i in range(K):
        a = ring_np[c, np.arange(B)]
        entry = np.where(a > 0, table[a % A_pad, h], 0)
        h_new = (entry & ((1 << 11) - 1)).astype(np.int64)
        h_new = np.where(h_new >= H, h_new - H, h_new)
        h_new = np.where(h_new >= H, 0, h_new)
        ys[i] = entry ^ i
        h = h_new
        c = (c + 1) % RING
    return ys.astype(np.int32), h.astype(np.int32)


def main():
    ring = jnp.asarray(ring_np)
    h0 = jnp.asarray(h0_np[None, :])
    ys, hout = jax.block_until_ready(run(ring, h0))
    ys_ref, h_ref = numpy_replay()
    ok_ys = np.array_equal(np.asarray(ys), ys_ref)
    ok_h = np.array_equal(np.asarray(hout)[0], h_ref)
    print(json.dumps({"ys_exact": bool(ok_ys), "h_exact": bool(ok_h)}), flush=True)
    if not ok_ys:
        bad = np.argwhere(np.asarray(ys) != ys_ref)
        print("first bad:", bad[:5].tolist(),
              np.asarray(ys)[tuple(bad[0])], ys_ref[tuple(bad[0])], flush=True)
        return

    REPS = 10
    t0 = time.time()
    for _ in range(REPS):
        ys, hout = jax.block_until_ready(run(ring, h0))
    dt = (time.time() - t0) / REPS
    print(
        json.dumps(
            {
                "B": B, "H": H, "BL": BL, "K": K,
                "ns_per_lane_step": round(dt / (B * K) * 1e9, 3),
                "us_per_step": round(dt / K * 1e6, 1),
                "ms_per_call": round(dt * 1e3, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
