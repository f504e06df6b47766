"""Storage-format probe for the early-backward frontier.

Seven round-2/3 studies concluded the early-layer backward is
bandwidth-bound on lane-padded tensors (C=16..96 padded to 128 lanes).
Every one of them attacked a single op while keeping the SAME NHWC
storage for its operands.  This probe measures the underlying storage
costs directly, to decide whether a flat (B, H, W*C) fully-packed
activation format for the whole early section can beat them:

  e1: elementwise-chain pass over (16,240,320,32) NHWC vs (16,240,10240)
      flat — is the 4x lane-padding tax physically real for elementwise?
  e2: NHWC <-> flat relayout cost (the per-boundary tax).
  e3: flat -> (N,128) pixel-packed relayout (the per-1x1-conv tax).
  e4: block-diagonal MXU matmul backward for the 1x1 32->16 conv on the
      (N,128) packed view vs XLA's conv vjp vs the (N,32) padded dot.

    python tests/tpu_scripts/flat_layout_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, CI, CO = 16, 240, 320, 32, 16
WC = W * CI


def timed(name, fn, *args, reps=20):
    @jax.jit
    def many(*a):
        acc = jnp.zeros((), jnp.float32)
        a = list(a)
        for i in range(reps):
            out = fn(*a)
            leaf = out[0] if isinstance(out, tuple) else out
            acc += jnp.sum(leaf.astype(jnp.float32)[..., :1])
            a[0] = a[0] + jnp.asarray(1e-3, a[0].dtype)
        return acc

    r = many(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    r = many(*args)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:7.3f} ms/op")
    return dt


def ew_chain(x, g):
    # 6-op elementwise chain shaped like a BN/ReLU6 gradient chain
    m = ((x > 0) & (x < 6)).astype(x.dtype)
    y = g * m
    y = y * jnp.asarray(1.7, x.dtype) - jnp.asarray(0.3, x.dtype)
    y = y - x * jnp.asarray(0.01, x.dtype)
    return y


def main():
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.standard_normal((B, H, W, CI)) * 3, jnp.bfloat16)
    g4 = jnp.asarray(rng.standard_normal((B, H, W, CI)), jnp.bfloat16)
    xf = jnp.asarray(np.asarray(x4).reshape(B, H, WC))
    gf = jnp.asarray(np.asarray(g4).reshape(B, H, WC))
    dy4 = jnp.asarray(rng.standard_normal((B, H, W, CO)), jnp.bfloat16)
    wm = jnp.asarray(rng.standard_normal((CI, CO)) * 0.1, jnp.bfloat16)

    print(f"tensor logical size: {B*H*W*CI*2/1e6:.1f} MB bf16")

    # e1: elementwise chain, same math, two storages
    timed("e1 elementwise chain NHWC (..,32)", ew_chain, x4, g4)
    timed("e1 elementwise chain flat (..,10240)", ew_chain, xf, gf)

    # e2: relayout both directions (force materialization via +0 consumer)
    timed("e2 NHWC->flat reshape", lambda a: a.reshape(B, H, WC) * 2, x4)
    timed("e2 flat->NHWC reshape", lambda a: a.reshape(B, H, W, CI) * 2, xf)

    # e3: packed views for matmuls
    timed("e3 NHWC->(N,128) 4-pixel pack", lambda a: a.reshape(-1, 128) * 2, x4)
    timed("e3 flat->(N,128) 4-pixel pack", lambda a: a.reshape(-1, 128) * 2, xf)
    timed("e3 NHWC->(N,32) rows", lambda a: a.reshape(-1, CI) * 2, x4)

    # e4: 1x1 conv backward formulations (block0-project shape)
    def conv_fwd(x, w):
        return jax.lax.conv_general_dilated(
            x, w.reshape(1, 1, CI, CO), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def xla_bwd(x, dy, w):
        _, pull = jax.vjp(lambda xx, ww: conv_fwd(xx, ww), x, w)
        return pull(dy)

    def dot_bwd_padded(x, dy, w):
        # (N,32)/(N,16) padded rows
        xm = x.reshape(-1, CI)
        dym = dy.reshape(-1, CO)
        dw = jax.lax.dot_general(xm, dym, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dx = jax.lax.dot_general(dym, w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dx.astype(x.dtype).reshape(x.shape), dw

    # block-diagonal weights: 4 pixels x (32->16) per 128-lane group
    def blockdiag(w, n):
        z = jnp.zeros((n, CI, n, CO), w.dtype)
        idx = jnp.arange(n)
        z = z.at[idx, :, idx, :].set(w)
        return z.reshape(n * CI, n * CO)

    wbd = blockdiag(wm, 4)  # (128, 64)

    def bd_bwd(x, dy, wbd_):
        xm = x.reshape(-1, 128)            # 4 pixels x 32
        dym = dy.reshape(-1, 64)           # same 4 pixels x 16
        dwb = jax.lax.dot_general(xm, dym, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dx = jax.lax.dot_general(dym, wbd_, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dx.astype(x.dtype), dwb

    timed("e4 XLA conv vjp (dx+dw)", xla_bwd, x4, dy4, wm)
    timed("e4 dot (N,32) padded (dx+dw)", dot_bwd_padded, x4, dy4, wm)
    timed("e4 blockdiag (N,128) packed (dx+dw)", bd_bwd, x4, dy4, wbd)

    # parity check for the blockdiag dgrad
    dx_ref, dw_ref = jax.jit(xla_bwd)(x4, dy4, wm)
    dx_bd, dwb = jax.jit(bd_bwd)(x4, dy4, wbd)
    dx_bd = np.asarray(dx_bd).reshape(B, H, W, CI)
    err = np.abs(dx_bd - np.asarray(dx_ref, np.float32)).max()
    # dw: sum the 4 diagonal blocks
    dwb = np.asarray(dwb).reshape(4, CI, 4, CO)
    dw_bd = sum(dwb[i, :, i, :] for i in range(4))
    errw = np.abs(dw_bd - np.asarray(dw_ref)).max() / (
        np.abs(np.asarray(dw_ref)).max() + 1e-9)
    print(f"parity: dgrad max abs err {err:.3e}, wgrad max rel err {errw:.3e}")


if __name__ == "__main__":
    main()
