"""Bisect the high tail-chain Mosaic compile crash (SIGABRT in
ApplyVectorLayout / vector_extract_strided_slice: limits > vreg dim) by
compiling standalone mini-kernels, one per op pattern the kernel uses that
the (compiling) medium kernel and res_chain do NOT. Each pattern is a
seconds-scale remote compile; the failing one names the rewrite target.

Run on the chip: python tools/probe_mosaic_ops.py
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

C4 = 384
C = 96
FLAT = 1088   # multiple of 8, stands in for (h2 + 2*RING) * stride
DT = jnp.bfloat16


def _run(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )
        res = jax.jit(fn)(*args)
        print(f"PASS {name}  sum={float(jnp.sum(res)):.4f}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}  {type(e).__name__}: {msg}")
        return False


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (FLAT, C4), DT)
    w = jax.random.normal(jax.random.PRNGKey(1), (C4, 128), jnp.float32)
    wrep = jax.random.normal(jax.random.PRNGKey(2), (128, C4), jnp.float32)

    # A: global row-reductions (flat, 384) -> (1, 384) f32 (sum + max)
    def k_reduce(x_ref, o_ref):
        z = x_ref[...].astype(jnp.float32)
        s = jnp.sum(z, axis=0, keepdims=True)
        m = jnp.max(z, axis=0, keepdims=True)
        o_ref[...] = jnp.broadcast_to(s + m, o_ref.shape)

    _run("A_row_reduce_384", k_reduce, (8, C4), x)

    # B: (1, 384) @ (384, 128) matmul with a 1-row LHS
    def k_dot1row(x_ref, w_ref, o_ref):
        z = x_ref[...].astype(jnp.float32)
        s = jnp.sum(z, axis=0, keepdims=True)          # (1, 384)
        h = jnp.dot(s, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = jnp.broadcast_to(h, o_ref.shape)

    _run("B_dot_1row_K384", k_dot1row, (8, 128), x, w)

    # B8: same matmul with the LHS broadcast to 8 rows first
    def k_dot8row(x_ref, w_ref, o_ref):
        z = x_ref[...].astype(jnp.float32)
        s = jnp.broadcast_to(jnp.sum(z, axis=0, keepdims=True), (8, C4))
        o_ref[...] = jnp.dot(s, w_ref[...],
                             preferred_element_type=jnp.float32)

    _run("B8_dot_8row_K384", k_dot8row, (8, 128), x, w)

    # C: misaligned 96-lane slices of a (1, 384) value
    def k_slice96(x_ref, o_ref):
        m = jnp.max(x_ref[...].astype(jnp.float32), axis=0, keepdims=True)
        m96 = jnp.maximum(jnp.maximum(m[:, 0:C], m[:, C:2 * C]),
                          jnp.maximum(m[:, 2 * C:3 * C], m[:, 3 * C:C4]))
        o_ref[...] = jnp.broadcast_to(jnp.pad(m96, ((0, 0), (0, 32))),
                                      o_ref.shape)

    _run("C_lane_slice_96", k_slice96, (8, 128), x)

    # D: concat of 4x 96-lane pieces into (1, 384)
    def k_concat96(x_ref, o_ref):
        m = jnp.max(x_ref[...].astype(jnp.float32), axis=0, keepdims=True)
        g = jnp.concatenate([m[:, 0:C]] * 4, axis=1)
        o_ref[...] = jnp.broadcast_to(g, o_ref.shape)

    _run("D_lane_concat_96x4", k_concat96, (8, C4), x)

    # E: (1, 128) @ (128, 384) — 1-row LHS, multi-vreg N
    def k_dotN384(x_ref, w_ref, o_ref):
        m = jnp.max(x_ref[...].astype(jnp.float32), axis=0, keepdims=True)
        g = jnp.dot(m[:, :128], w_ref[...],
                    preferred_element_type=jnp.float32)
        o_ref[...] = jnp.broadcast_to(g, o_ref.shape)

    _run("E_dot_1row_N384", k_dotN384, (8, C4), x, wrep)

    # F: broadcast-multiply (flat, 384) * (1, 384)
    def k_bcast_mul(x_ref, o_ref):
        z = x_ref[...].astype(jnp.float32)
        g = jnp.sum(z, axis=0, keepdims=True)
        o_ref[...] = (z * g)[0:8, :]

    _run("F_bcast_mul_384", k_bcast_mul, (8, C4), x)

    # G: single-lane slices g[:, p:p+1] + iota-where select
    def k_lane1(x_ref, o_ref):
        z = x_ref[...].astype(jnp.float32)[0:8, 0:128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, C4), 1)
        acc = jnp.zeros((8, C4), jnp.float32)
        for p in range(4):
            gp = z[:, p:p + 1]
            acc = acc + jnp.where(lane // C == p, gp, 0.0)
        o_ref[...] = acc

    _run("G_lane1_slice_select", k_lane1, (8, C4), x)

    # H: iota-built 0/1 selection matmul (the round-3 rewrite pattern)
    def k_selmat(x_ref, o_ref):
        m = jnp.max(x_ref[...].astype(jnp.float32), axis=0, keepdims=True)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (C4, 128), 0)
        col_j = jax.lax.broadcasted_iota(jnp.int32, (C4, 128), 1)
        acc = jnp.zeros((1, 128), jnp.float32)
        for p in range(4):
            sel = jnp.where(
                jnp.logical_and(row_i == col_j + p * C, col_j < C),
                1.0, 0.0)
            acc = jnp.maximum(acc, jnp.dot(
                m, sel, preferred_element_type=jnp.float32))
        o_ref[...] = jnp.broadcast_to(acc, o_ref.shape)

    _run("H_iota_selection_matmul", k_selmat, (8, 128), x)

    # I: scratch-ref partial-lane store/load at an aligned 128 boundary
    def k_scratch(x_ref, o_ref, s_ref):
        z = x_ref[...].astype(jnp.float32)
        s_ref[:, 0:128] = jnp.sum(z, axis=0, keepdims=True)[:, 0:128] \
            + jnp.zeros((8, 128), jnp.float32)
        o_ref[...] = s_ref[:, 0:128]

    try:
        fn = pl.pallas_call(
            k_scratch,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, C4), jnp.float32)],
        )
        res = jax.jit(fn)(x)
        print(f"PASS I_scratch_partial_lanes  sum={float(jnp.sum(res)):.4f}")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL I_scratch_partial_lanes  {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
