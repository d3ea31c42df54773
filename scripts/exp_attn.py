#!/usr/bin/env python
"""Attention-branch implementation experiments at stripe geometries.

Each variant is a standalone Pallas kernel computing ONE stage-1-style
stripe-attention branch from (B, H, W, C2) q,k,v; chain-timed. Variants:

  h-batched   horizontal windows, batched dot_general over n windows (status quo)
  h-merge<g>  g windows merged into one dot with block-diagonal -inf masking
              (fewer, larger MXU ops; softmax over g x wider rows)
  v-batched   vertical via in-kernel transposes (status quo)
  v-midbatch  vertical via dot_general with the batch dim in the MIDDLE
              (no explicit transpose; does Mosaic lower it, and how fast?)
  v-ext       vertical with the transpose done OUTSIDE the kernel by XLA
              (kernel sees transposed data; one in-kernel transpose back)
  v-ext-o     like v-ext but the output stays transposed (XLA transposes it
              back) — zero in-kernel transposes

Usage: python scripts/exp_attn.py [H] [C2] [B]   (defaults 56 32 128)
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


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attn(q2, k2, v2, scale):
    """q2,k2,v2: (n, L, d) -> (n, L, d); one head."""
    s = lax.dot_general(q2 * scale, k2, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
    p = _softmax(s).astype(q2.dtype)
    return lax.dot_general(p, v2, (((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32).astype(q2.dtype)


def k_h_batched(q_ref, k_ref, v_ref, o_ref, *, H, W, C2, scale, g):
    # horizontal stripes of height 1: windows = rows
    q = q_ref[0].reshape(H, W, C2)
    k = k_ref[0].reshape(H, W, C2)
    v = v_ref[0].reshape(H, W, C2)
    o_ref[...] = _attn(q, k, v, scale).reshape(1, H, W, C2)


def k_h_merge(q_ref, k_ref, v_ref, o_ref, *, H, W, C2, scale, g):
    # merge g row-windows into one attention with block-diag masking
    n = H // g
    L = g * W
    q = q_ref[0].reshape(n, L, C2)
    k = k_ref[0].reshape(n, L, C2)
    v = v_ref[0].reshape(n, L, C2)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) // W
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) // W
    mask = jnp.where(row == col, 0.0, -1e9).astype(jnp.float32)
    s = lax.dot_general(q * scale, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32) + mask[None]
    p = _softmax(s).astype(q.dtype)
    out = lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32).astype(q.dtype)
    o_ref[...] = out.reshape(1, H, W, C2)


def k_v_batched(q_ref, k_ref, v_ref, o_ref, *, H, W, C2, scale, g):
    t = lambda r: r[0].transpose(1, 0, 2)
    out = _attn(t(q_ref), t(k_ref), t(v_ref), scale)  # (W, H, C2)
    o_ref[...] = out.transpose(1, 0, 2).reshape(1, H, W, C2)


def k_v_midbatch(q_ref, k_ref, v_ref, o_ref, *, H, W, C2, scale, g):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]  # (H, W, C2)
    s = lax.dot_general(q * scale, k, (((2,), (2,)), ((1,), (1,))),
                        preferred_element_type=jnp.float32)  # (W, H, H)
    p = _softmax(s).astype(q.dtype)
    out = lax.dot_general(p, v, (((2,), (0,)), ((0,), (1,))),
                          preferred_element_type=jnp.float32)  # (W, H, C2)
    o_ref[...] = out.astype(q.dtype).transpose(1, 0, 2).reshape(1, H, W, C2)


def k_v_ext(qt_ref, kt_ref, vt_ref, o_ref, *, H, W, C2, scale, g):
    # inputs pre-transposed by XLA: (1, W, H, C2); output back in image layout
    out = _attn(qt_ref[0], kt_ref[0], vt_ref[0], scale)  # (W, H, C2)
    o_ref[...] = out.transpose(1, 0, 2).reshape(1, H, W, C2)


def k_v_ext_o(qt_ref, kt_ref, vt_ref, o_ref, *, H, W, C2, scale, g):
    # inputs AND output transposed; XLA un-transposes outside
    o_ref[...] = _attn(qt_ref[0], kt_ref[0], vt_ref[0], scale).reshape(1, W, H, C2)


VARIANTS = [
    ("h-batched", k_h_batched, "n", 1),
    ("h-merge4", k_h_merge, "n", 4),
    ("h-merge8", k_h_merge, "n", 8),
    ("h-merge14", k_h_merge, "n", 14),
    ("v-batched", k_v_batched, "n", 1),
    ("v-midbatch", k_v_midbatch, "n", 1),
    ("v-ext", k_v_ext, "t", 1),
    ("v-ext-o", k_v_ext_o, "to", 1),
]


def run(name, kern_fn, mode, g, H, W, C2, B):
    scale = C2**-0.5
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, W, C2)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    spec_img = pl.BlockSpec((1, H, W, C2), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((1, W, H, C2), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(kern_fn, H=H, W=W, C2=C2, scale=scale, g=g)

    if mode == "n":
        def apply(q, k, v):
            return pl.pallas_call(
                kern, grid=(B,), in_specs=[spec_img] * 3, out_specs=spec_img,
                out_shape=jax.ShapeDtypeStruct((B, H, W, C2), q.dtype),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            )(q, k, v)
    elif mode == "t":
        def apply(q, k, v):
            t = lambda x: x.transpose(0, 2, 1, 3)
            return pl.pallas_call(
                kern, grid=(B,), in_specs=[spec_t] * 3, out_specs=spec_img,
                out_shape=jax.ShapeDtypeStruct((B, H, W, C2), q.dtype),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            )(t(q), t(k), t(v))
    else:  # "to"
        def apply(q, k, v):
            t = lambda x: x.transpose(0, 2, 1, 3)
            out = pl.pallas_call(
                kern, grid=(B,), in_specs=[spec_t] * 3, out_specs=spec_t,
                out_shape=jax.ShapeDtypeStruct((B, W, H, C2), q.dtype),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
            )(t(q), t(k), t(v))
            return t(out)

    def chained(q, k, v, n):
        def body(c, _):
            return c + 1e-6 * apply(c, k, v), ()
        c, _ = lax.scan(body, q, None, length=n)
        return jnp.sum(c)

    ca, cb = 11, 31
    fa = jax.jit(lambda q, k, v: chained(q, k, v, ca))
    fb = jax.jit(lambda q, k, v: chained(q, k, v, cb))
    try:
        float(fa(q, k, v)); float(fb(q, k, v))
    except Exception as e:
        print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:110]}", flush=True)
        return

    def best(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(f(q, k, v)); ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (best(fb) - best(fa)) / (cb - ca)
    print(f"{name:12s}: {dt*1000:7.3f} ms", flush=True)


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 56
    C2 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    W = H
    print(f"branch geometry: H=W={H}, C2={C2}, B={B}", flush=True)
    for name, fn, mode, g in VARIANTS:
        if H % g:
            continue
        run(name, fn, mode, g, H, W, C2, B)


if __name__ == "__main__":
    main()
