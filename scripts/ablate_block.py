#!/usr/bin/env python
"""Intra-KERNEL ablation of the fused CSWin block at a given stage geometry.

Recompiles the whole-block Pallas kernel with individual sub-computations
disabled (mathematically wrong, op-mix preserved elsewhere) and chain-times
each variant. The deltas vs 'full' localize where the per-program
microseconds go — matmuls, the vertical-branch transposes, LePE rolls,
or softmax.

Usage: python scripts/ablate_block.py [stage] [batch]
  stage in {1, 2, 3, 4}, batch default 128.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cswin_unet_tpu.ops.pallas.cswin_block import (
    _attn_windows,
    _dot,
    _erf,
    _layernorm,
    _lepe_full,
)

STAGES = {
    1: dict(H=56, W=56, C=64, heads=2, split=1, last=False),
    2: dict(H=28, W=28, C=128, heads=4, split=2, last=False),
    3: dict(H=14, W=14, C=256, heads=8, split=7, last=False),
    4: dict(H=7, W=7, C=512, heads=16, split=7, last=True),
}


def _branch(q, k, v, lk, lb, *, H, W, sp, heads, scale, vertical, flags):
    """One stripe branch with ablation flags."""
    G, _, _, C2 = q.shape

    if vertical and not flags["transpose"]:
        # pretend-vertical: use horizontal windowing (wrong result, no
        # transposes) — isolates the transpose cost.
        vertical = False

    if vertical:
        nW = W // sp
        L = H * sp
        if sp == 1:
            win = lambda x: x.transpose(0, 2, 1, 3).reshape(G * W, H, C2)
        else:
            def win(x):
                parts = [
                    x[g].reshape(H, nW, sp, C2).transpose(1, 0, 2, 3).reshape(nW, L, C2)
                    for g in range(G)
                ]
                return parts[0] if G == 1 else jnp.concatenate(parts, 0)
    else:
        nH = max(H // sp, 1)
        L = min(sp, H) * W
        win = lambda x: x.reshape(G * nH, L, C2)

    qw, kw, vw = win(q), win(k), win(v)
    if flags["attn"]:
        if flags["softmax"]:
            out = _attn_windows(qw, kw, vw, heads, scale)
        else:
            n = qw.shape[0]
            d = C2 // heads
            outs = []
            for h in range(heads):
                sl = slice(h * d, (h + 1) * d)
                s = lax.dot_general(qw[:, :, sl] * scale, kw[:, :, sl],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
                p = (s * (1.0 / L)).astype(qw.dtype)  # softmax -> plain scale
                outs.append(lax.dot_general(p, vw[:, :, sl],
                                            (((2,), (1,)), ((0,), (0,))),
                                            preferred_element_type=jnp.float32))
            out = (outs[0] if heads == 1 else jnp.concatenate(outs, -1)).astype(qw.dtype)
    else:
        out = vw

    if vertical:
        if sp == 1:
            out = out.reshape(G, W, H, C2).transpose(0, 2, 1, 3)
        else:
            imgs = []
            for g in range(G):
                o = out[g * nW : (g + 1) * nW].reshape(nW, H, sp, C2)
                imgs.append(o.transpose(1, 0, 2, 3).reshape(1, H, W, C2))
            out = imgs[0] if G == 1 else jnp.concatenate(imgs, 0)
    else:
        out = out.reshape(G, H, W, C2)

    if flags["lepe"]:
        sp_h, sp_w = (H, sp) if vertical else (min(sp, H), W)
        lepe = _lepe_full(v, lk, lb, sp_h, sp_w)
        out = (out.astype(jnp.float32) + lepe).astype(q.dtype)
    return out


def _kernel(x_ref, n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1,
            projk, projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b, o_ref, *,
            H, W, C, heads, split, last, scale, flags):
    x = x_ref[...].reshape(H * W, C)

    xn = _layernorm(x, n1s[...], n1b[...]) if flags["ln"] else x
    qkv = _dot(xn, qkvk[...], qkvb[...])

    q = qkv[:, :C].reshape(1, H, W, C)
    k = qkv[:, C : 2 * C].reshape(1, H, W, C)
    v = qkv[:, 2 * C :].reshape(1, H, W, C)
    if last:
        att = _branch(q, k, v, lk0[...], lb0[...], H=H, W=W, sp=H,
                      heads=heads, scale=scale, vertical=False, flags=flags)
    else:
        half = C // 2
        h2 = heads // 2
        a0 = _branch(q[..., :half], k[..., :half], v[..., :half], lk0[...],
                     lb0[...], H=H, W=W, sp=split, heads=h2, scale=scale,
                     vertical=True, flags=flags)
        a1 = _branch(q[..., half:], k[..., half:], v[..., half:], lk1[...],
                     lb1[...], H=H, W=W, sp=split, heads=h2, scale=scale,
                     vertical=False, flags=flags)
        att = jnp.concatenate([a0, a1], -1)
    att = att.reshape(H * W, C)

    att = _dot(att, projk[...], projb[...])
    x = x + att

    y = _layernorm(x, n2s[...], n2b[...]) if flags["ln"] else x
    y = _dot(y, fc1k[...], fc1b[...])
    if flags["gelu"]:
        yf = y.astype(jnp.float32)
        y = (yf * 0.5 * (1.0 + _erf(yf * (2.0**-0.5)))).astype(y.dtype)
    y = _dot(y, fc2k[...], fc2b[...])
    x = x + y

    o_ref[...] = x.reshape(1, H, W, C)


def build(stage, flags):
    g = STAGES[stage]
    H, W, C, heads, split, last = g["H"], g["W"], g["C"], g["heads"], g["split"], g["last"]
    cb = C if last else C // 2
    rng = np.random.default_rng(0)
    DT = jnp.bfloat16

    def mk(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    params = (
        jnp.ones((C,)), jnp.zeros((C,)),                  # n1
        mk(C, 3 * C), jnp.zeros((3 * C,)),                # qkv
        mk(3, 3, cb), jnp.zeros((cb,)),                   # lepe0
        mk(3, 3, cb), jnp.zeros((cb,)),                   # lepe1
        mk(C, C), jnp.zeros((C,)),                        # proj
        jnp.ones((C,)), jnp.zeros((C,)),                  # n2
        mk(C, 4 * C), jnp.zeros((4 * C,)),                # fc1
        mk(4 * C, C), jnp.zeros((C,)),                    # fc2
    )
    scale = (C // heads) ** -0.5

    kern = functools.partial(_kernel, H=H, W=W, C=C, heads=heads, split=split,
                             last=last, scale=scale, flags=flags)

    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def apply(params, x):
        return pl.pallas_call(
            kern,
            grid=(x.shape[0],),
            in_specs=[x_spec] + [full(p.shape) for p in params],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(x, *params)

    return params, apply, (H, W, C), DT


def timeit(params, apply, shape, DT, B, ca=11, cb=31, n=3):
    H, W, C = shape
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, H, W, C)).astype(np.float32)
    ).astype(DT)

    def chained(p, x, k):
        def body(c, _):
            return c + 1e-6 * apply(p, c).astype(c.dtype), ()
        c, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(c)

    fa = jax.jit(lambda p, x: chained(p, x, ca))
    fb = jax.jit(lambda p, x: chained(p, x, cb))
    float(fa(params, x)); float(fb(params, x))

    def best(f):
        return min(
            [(lambda t0: (float(f(params, x)), time.perf_counter() - t0)[1])(time.perf_counter())
             for _ in range(n)]
        )

    return (best(fb) - best(fa)) / (cb - ca)


DEFAULT = dict(ln=True, transpose=True, lepe=True, softmax=True, attn=True, gelu=True)

VARIANTS = [
    ("full", {}),
    ("no-lepe", {"lepe": False}),
    ("no-transpose (fake vert)", {"transpose": False}),
    ("no-softmax (scale)", {"softmax": False}),
    ("no-attn (out=v)", {"attn": False}),
    ("no-ln", {"ln": False}),
    ("no-gelu", {"gelu": False}),
    ("matmuls-only", {"lepe": False, "transpose": False, "softmax": False,
                      "ln": False, "gelu": False}),
]


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print(f"stage {stage}, batch {B}: {STAGES[stage]}")
    base = None
    for name, over in VARIANTS:
        flags = {**DEFAULT, **over}
        params, apply, shape, DT = build(stage, flags)
        t = timeit(params, apply, shape, DT, B)
        if base is None:
            base = t
        print(f"{name:28s}: {t*1000:7.3f} ms  (delta {1000*(base - t):+7.3f} ms)")


if __name__ == "__main__":
    main()
