"""Mosaic feasibility probe for the packed-lane Pallas wgrad kernel.

v1 (in-kernel (R, W*Ci) -> (R*W, Ci) unfold): REJECTED by Mosaic
("infer-vector-layout: unsupported shape cast" on the
vector<64x10240xbf16> -> vector<20480x32xbf16> tpu.reshape).

v2 (this file): XLA-side reshape to 2D (K, Ci)/(K, Co); kernel blocks are
(Kt, C) with a transposed-lhs dot_general accumulating into a constant
(Ci, Co) f32 block.  Measures compile legality + timing vs XLA's own
wgrad conv and the giant-K dot_general at the block0-project shape.

    python tests/tpu_scripts/mosaic_reshape_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B, H, W, CI, CO = 16, 240, 320, 32, 16
KT = 2048  # rows per grid step


def kernel(ht, x_ref, dy_ref, out_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...].reshape(ht * W, CI)
    dy = dy_ref[...].reshape(ht * W, CO)
    out_ref[...] += jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def pallas_wgrad(x4, dy4, ht=16):
    b, h, w, _ = x4.shape
    return pl.pallas_call(
        functools.partial(kernel, ht),
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((None, ht, W, CI), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((None, ht, W, CO), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CI, CO), lambda bi, hi: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CI, CO), jnp.float32),
    )(x4, dy4)


def copy_kernel(ht, x_ref, dy_ref, out_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...].reshape(ht * W, CI)
    dy = dy_ref[...].reshape(ht * W, CO)
    out_ref[...] += (
        jnp.sum(x.astype(jnp.float32), axis=0)[:, None]
        + jnp.sum(dy.astype(jnp.float32), axis=0)[None, :CO]
    )


def pallas_copyonly(x4, dy4, ht=16):
    b, h, w, _ = x4.shape
    return pl.pallas_call(
        functools.partial(copy_kernel, ht),
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((None, ht, W, CI), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((None, ht, W, CO), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CI, CO), lambda bi, hi: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CI, CO), jnp.float32),
    )(x4, dy4)


def vpu_kernel(ht, x_ref, dy_ref, out_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...].reshape(ht * W, CI).astype(jnp.float32)
    dy = dy_ref[...].reshape(ht * W, CO).astype(jnp.float32)
    acc = []
    for co in range(CO):
        acc.append(jnp.sum(x * dy[:, co][:, None], axis=0))
    out_ref[...] += jnp.stack(acc, axis=1)


def pallas_vpu(x4, dy4, ht=16):
    b, h, w, _ = x4.shape
    return pl.pallas_call(
        functools.partial(vpu_kernel, ht),
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((None, ht, W, CI), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((None, ht, W, CO), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((CI, CO), lambda bi, hi: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CI, CO), jnp.float32),
    )(x4, dy4)


def conv_fwd(x, kern):
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def xla_wgrad(x4, dy4):
    _, pull = jax.vjp(
        lambda k: conv_fwd(x4, k), jnp.zeros((1, 1, CI, CO), jnp.bfloat16))
    return pull(dy4)[0]


def dot_wgrad(x4, dy4):
    return jax.lax.dot_general(
        x4.reshape(-1, CI), dy4.reshape(-1, CO),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def timed(name, fn, x4, dy4, reps=20):
    # in-jit repeats with perturbed operands to defeat CSE
    @jax.jit
    def many(x4, dy4):
        acc = jnp.zeros((), jnp.float32)
        xx, dd = x4, dy4
        for i in range(reps):
            g = fn(xx, dd)
            acc += jnp.sum(g.astype(jnp.float32))
            xx = xx + jnp.bfloat16(1e-3)
        return acc

    r = many(x4, dy4)
    np.asarray(r)
    t0 = time.perf_counter()
    r = many(x4, dy4)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:14s} {dt:7.3f} ms/op")
    return dt


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.standard_normal((B, H, W, CI)), jnp.bfloat16)
    dy4 = jnp.asarray(rng.standard_normal((B, H, W, CO)), jnp.bfloat16)

    got = np.asarray(jax.jit(pallas_wgrad)(x4, dy4))
    want = np.asarray(jax.jit(dot_wgrad)(
        x4.astype(jnp.float32), dy4.astype(jnp.float32))).reshape(CI, CO)
    err = np.abs(got - want).max() / np.abs(want).max()
    print("pallas max rel err:", err)
    assert err < 2e-2, err

    timed("xla wgrad", lambda a, b: xla_wgrad(a, b), x4, dy4)
    timed("dot wgrad", lambda a, b: dot_wgrad(a, b), x4, dy4)
    timed("pallas wgrad", lambda a, b: pallas_wgrad(a, b), x4, dy4)
    timed("pallas copy", lambda a, b: pallas_copyonly(a, b), x4, dy4)
    timed("pallas vpu", lambda a, b: pallas_vpu(a, b), x4, dy4)
