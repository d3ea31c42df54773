#!/usr/bin/env python
"""Test the lane-packing hypothesis: stage-1 full-C ops run on (N, 64)
arrays — half of every 128-wide VPU lane tile idle. Packing TWO images
into the lane dim ((N, 128), block-diagonal weights, half the grid) should
~2x the per-element efficiency of the VPU-bound pieces if lanes are the
limiter.

Prices three micro-kernels at stage-1 shapes (B=128, H=W=56):
  mlp64   : LN + fc1(64->256) + gelu + fc2(256->64), grid=B, (3136, 64)
  mlp128  : same math for two images packed in lanes, grid=B/2, (3136, 128)
            block-diag weights, segmented LN via selector matmuls
  mlp128g2: control — grid=B/2 but G=2 on sublanes ((2*3136, 64)), i.e.
            the existing G-packing. Distinguishes "fewer programs" from
            "fuller lanes".

Usage: python scripts/exp_pack.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import chain_time

B, H, W, C = 128, 56, 56, 64
N = H * W
HID = 4 * C


def mk(rng, *shape, s=0.05):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)


def blockdiag(a, b):
    out = np.zeros((a.shape[0] + b.shape[0], a.shape[1] + b.shape[1]),
                   np.float32)
    out[: a.shape[0], : a.shape[1]] = np.asarray(a)
    out[a.shape[0] :, a.shape[1] :] = np.asarray(b)
    return jnp.asarray(out)


def run(name, kern, x, extras, gshape, grid):
    x_spec = pl.BlockSpec(gshape, lambda b: (b,) + (0,) * (len(gshape) - 1),
                          memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(tuple(s), lambda b: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)

    def fn(xx, *ps):
        y = pl.pallas_call(
            kern, grid=(grid,),
            in_specs=[x_spec] + [full(p.shape) for p in ps],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xx, *ps)
        return y + xx * 1e-6

    try:
        t = chain_time(jax.jit(fn), (x, *extras), ca=10, cb_=40, n=4)
        print(f"{name:10s}: {t*1000:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s}: FAIL {str(e)[:200]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    n1s, n1b = jnp.ones((C,)), jnp.zeros((C,))
    fc1, fc1b = mk(rng, C, HID), jnp.zeros((HID,))
    fc2, fc2b = mk(rng, HID, C), jnp.zeros((C,))
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    # --- baseline: one image per program, (3136, 64) ---
    def k64(x_ref, s, b, w1, b1, w2, b2, o_ref):
        xx = x_ref[...].reshape(N, C)
        y = cb._layernorm(xx, s[...], b[...])
        yf = jnp.dot(y, w1[...].astype(y.dtype),
                     preferred_element_type=jnp.float32) + b1[...]
        y = (yf * 0.5 * (1.0 + cb._erf(yf * (2.0 ** -0.5)))).astype(xx.dtype)
        y = cb._dot(y, w2[...], b2[...])
        o_ref[...] = (xx + y).reshape(1, H, W, C)

    run("mlp64", k64, x, (n1s, n1b, fc1, fc1b, fc2, fc2b), (1, H, W, C), B)

    # --- control: two images per program on SUBLANES (G=2) ---
    def k64g2(x_ref, s, b, w1, b1, w2, b2, o_ref):
        xx = x_ref[...].reshape(2 * N, C)
        y = cb._layernorm(xx, s[...], b[...])
        yf = jnp.dot(y, w1[...].astype(y.dtype),
                     preferred_element_type=jnp.float32) + b1[...]
        y = (yf * 0.5 * (1.0 + cb._erf(yf * (2.0 ** -0.5)))).astype(xx.dtype)
        y = cb._dot(y, w2[...], b2[...])
        o_ref[...] = (xx + y).reshape(2, H, W, C)

    run("mlp64 G=2", k64g2, x, (n1s, n1b, fc1, fc1b, fc2, fc2b),
        (2, H, W, C), B // 2)

    # --- control: baseline width but LN stats via MXU selector dots ---
    selC = jnp.full((C, C), 1.0 / C)

    def k64mm(x_ref, s, b, sel, w1, b1, w2, b2, o_ref):
        xx = x_ref[...].reshape(N, C)
        xf = xx.astype(jnp.float32)
        mu = jax.lax.dot(xf, sel[...])
        d = xf - mu
        var = jax.lax.dot(d * d, sel[...])
        y = ((d * jax.lax.rsqrt(var + 1e-5)) * s[...] + b[...]).astype(xx.dtype)
        yf = jnp.dot(y, w1[...].astype(y.dtype),
                     preferred_element_type=jnp.float32) + b1[...]
        y = (yf * 0.5 * (1.0 + cb._erf(yf * (2.0 ** -0.5)))).astype(xx.dtype)
        y = cb._dot(y, w2[...], b2[...])
        o_ref[...] = (xx + y).reshape(1, H, W, C)

    run("mlp64 mmln", k64mm, x, (n1s, n1b, selC, fc1, fc1b, fc2, fc2b),
        (1, H, W, C), B)

    # --- packed: two images in LANES, (3136, 128) ---
    C2, HID2 = 2 * C, 2 * HID
    xp = jnp.asarray(
        np.concatenate([np.asarray(x, np.float32)[0::2],
                        np.asarray(x, np.float32)[1::2]], -1)
    ).astype(jnp.bfloat16)  # (B/2, H, W, 128)
    fc1p = blockdiag(fc1, fc1)
    fc2p = blockdiag(fc2, fc2)
    b1p = jnp.concatenate([fc1b, fc1b])
    b2p = jnp.concatenate([fc2b, fc2b])
    sp_ = jnp.concatenate([n1s, n1s])
    bp_ = jnp.concatenate([n1b, n1b])
    # segmented-mean selector: (128, 128) block-diag of ones/64
    seg = blockdiag(jnp.full((C, C), 1.0 / C), jnp.full((C, C), 1.0 / C))

    def k128(x_ref, s, b, sel, w1, b1, w2, b2, o_ref):
        xx = x_ref[...].reshape(N, C2)
        xf = xx.astype(jnp.float32)
        mu = jax.lax.dot(xf, sel[...])  # per-group mean in every lane
        d = xf - mu
        var = jax.lax.dot(d * d, sel[...])
        y = ((d * jax.lax.rsqrt(var + 1e-5)) * s[...] + b[...]).astype(xx.dtype)
        yf = jnp.dot(y, w1[...].astype(y.dtype),
                     preferred_element_type=jnp.float32) + b1[...]
        y = (yf * 0.5 * (1.0 + cb._erf(yf * (2.0 ** -0.5)))).astype(xx.dtype)
        y = cb._dot(y, w2[...], b2[...])
        o_ref[...] = (xx + y).reshape(1, H, W, C2)

    run("mlp128", k128, xp, (sp_, bp_, seg, fc1p, b1p, fc2p, b2p),
        (1, H, W, C2), B // 2)


if __name__ == "__main__":
    main()
