#!/usr/bin/env python
"""Cumulative build-up of the stage-1 fused block: one kernel per level,
each adding the next production sub-computation. The level whose delta is
large carries the cost (individual micro-kernels in exp_vpu.py are all near
the copy floor, so the cost is compositional).

Usage: python scripts/exp_cum.py [stage] [B]   (default stage 1, B=128)
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
from exp_hb import STAGES, chain_time, mk_params


def fold(y, C):
    """Fold an (N, kC) array back to (N, C) by summing C-column groups."""
    k = y.shape[-1] // C
    if k == 1:
        return y
    return sum(y[:, i * C : (i + 1) * C] for i in range(k))


def make_level_kernel(level, *, H, W, C, heads, split, scale):
    half, h2, nW = C // 2, heads // 2, W // split

    def kern(x_ref, xt_ref, n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v,
             lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
             fc1k, fc1b, fc2k, fc2b, o_ref):
        x = x_ref[...].reshape(H * W, C)
        xt = xt_ref[...].reshape(W * H, C)
        acc = x.astype(jnp.float32) + xt.astype(jnp.float32) * 1e-6
        if level >= 1:
            xn = cb._layernorm(x, n1s[...], n1b[...])
            qkv_h = cb._dot(xn, wqkv_h[...], bqkv_h[...])
            acc += jnp.concatenate(
                [fold(qkv_h, half)] * 2, -1).astype(jnp.float32)
        if level >= 2:
            xtn = cb._layernorm(xt, n1s[...], n1b[...])
            qkv_v = cb._dot(xtn, wqkv_v[...], bqkv_v[...])
            acc += jnp.concatenate(
                [fold(qkv_v, half)] * 2, -1).astype(jnp.float32)
        if level >= 3:
            qt = qkv_v[:, :half].reshape(nW, split * H, half)
            kt = qkv_v[:, half : 2 * half].reshape(nW, split * H, half)
            vt = qkv_v[:, 2 * half :].reshape(nW, split * H, half)
            a0t = cb._attn_auto(qt, kt, vt, h2, scale)
        if level >= 4:
            lepe0 = cb._lepe_windows(vt.reshape(nW, split, H, half),
                                     lk0[...], lb0[...], swap=True)
            a0t = (a0t.reshape(nW, split, H, half).astype(jnp.float32)
                   + lepe0)
            a0t = a0t.astype(x.dtype).reshape(1, W, H, half)
            a0 = a0t.transpose(0, 2, 1, 3)
        if level == 3:
            acc += jnp.concatenate(
                [a0t.reshape(W * H, half).astype(jnp.float32)] * 2, -1)
        elif level in (4, 5):
            acc += jnp.concatenate(
                [a0.reshape(H * W, half).astype(jnp.float32)] * 2, -1)
        if level >= 5:
            q = qkv_h[:, :half].reshape(1, H, W, half)
            k = qkv_h[:, half : 2 * half].reshape(1, H, W, half)
            v = qkv_h[:, 2 * half :].reshape(1, H, W, half)
            a1 = cb._branch_horizontal(q, k, v, lk1[...], lb1[...],
                                       H=H, W=W, sp=split, heads=h2,
                                       scale=scale)
            acc += jnp.concatenate(
                [a1.reshape(H * W, half).astype(jnp.float32)] * 2, -1)
        if level >= 6:
            att = jnp.concatenate([a0.reshape(H * W, half),
                                   a1.reshape(H * W, half)], -1)
            att = cb._dot(att, projk[...], projb[...])
            x1 = x + att
            acc += x1.astype(jnp.float32)
        if level >= 7:
            y = cb._layernorm(x1, n2s[...], n2b[...])
            y = cb._dot(y, fc1k[...], fc1b[...])
            yf = y.astype(jnp.float32)
            y = (yf * 0.5 * (1.0 + cb._erf(yf * (2.0**-0.5)))).astype(y.dtype)
            y = cb._dot(y, fc2k[...], fc2b[...])
            acc += (x1 + y).astype(jnp.float32)
        o_ref[...] = acc.astype(x_ref.dtype).reshape(1, H, W, C)

    return kern


def main(st=1, B=128):
    g = STAGES[st]
    H, W, C, heads, split = g["H"], g["W"], g["C"], g["heads"], g["split"]
    scale = 32 ** -0.5
    params = mk_params(g, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)

    x_spec = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(tuple(s), lambda b: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)

    # split the fused qkv weight the way the production wrapper does
    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb,
     n2s, n2b, fc1k, fc1b, fc2k, fc2b) = params
    half = C // 2
    cols_v = jnp.concatenate([qkvk[:, :half], qkvk[:, C:C + half],
                              qkvk[:, 2 * C:2 * C + half]], -1)
    cols_h = jnp.concatenate([qkvk[:, half:C], qkvk[:, C + half:2 * C],
                              qkvk[:, 2 * C + half:]], -1)
    bv = jnp.concatenate([qkvb[:half], qkvb[C:C + half],
                          qkvb[2 * C:2 * C + half]])
    bh = jnp.concatenate([qkvb[half:C], qkvb[C + half:2 * C],
                          qkvb[2 * C + half:]])
    ps = (n1s, n1b, cols_h, bh, cols_v, bv, lk0, lb0, lk1, lb1,
          projk, projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b)

    names = ["copy x+xt", "+ln1+qkv_h", "+ln1t+qkv_v", "+v-attn",
             "+lepe0+transpose", "+h-branch", "+proj+res", "+ln2+mlp (full)"]
    prev = None
    for level in range(8):
        kern = make_level_kernel(level, H=H, W=W, C=C, heads=heads,
                                 split=split, scale=scale)

        def fn(xx, *pp, _k=kern):
            xxt = xx.transpose(0, 2, 1, 3)
            y = pl.pallas_call(
                _k, grid=(B,),
                in_specs=[x_spec, x_spec] + [full(p.shape) for p in pp],
                out_specs=x_spec,
                out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xx, xxt, *pp)
            return y + xx * 1e-6

        try:
            t = chain_time(fn, (x, *ps))
            d = "" if prev is None else f"  (+{(t - prev)*1000:6.3f})"
            print(f"s{st} L{level} {names[level]:18s}: {t*1000:8.3f} ms{d}",
                  flush=True)
            prev = t
        except Exception as e:  # noqa: BLE001
            print(f"s{st} L{level} {names[level]:18s}: FAIL {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         int(sys.argv[2]) if len(sys.argv) > 2 else 128)
