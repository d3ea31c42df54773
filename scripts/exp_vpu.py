#!/usr/bin/env python
"""Isolate the stage-1 fused-block cost: dedicated Pallas kernels timing one
sub-computation each at the stage-1 shape (G=1, 128 programs, bs128).

The ablations (exp_ablate3.py) show attention/LePE removal changes nothing;
this pins down which of LN / GELU(erf) / dot chain / reshape+concat /
bare-DMA carries the ~4.6 ms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import chain_time

B, H, W, C = 128, 56, 56, 64
HID = 4 * C


def run_kernel(name, kern, extra=None, out_shape=None):
    extra = extra or []
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    x_spec = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    def fn(xx, *ps):
        y = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[x_spec] + [full(p.shape) for p in ps],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xx, *ps)
        return y + xx * 1e-6

    try:
        t = chain_time(fn, (x, *extra))
        print(f"s1 {name:22s}: {t*1000:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"s1 {name:22s}: FAIL {str(e)[:140]}", flush=True)


def k_copy(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def k_ln2(x_ref, s_ref, b_ref, o_ref):
    x = x_ref[...].reshape(H * W, C)
    y = cb._layernorm(x, s_ref[...], b_ref[...])
    y = cb._layernorm(y.astype(x.dtype), s_ref[...], b_ref[...])
    o_ref[...] = y.astype(x_ref.dtype).reshape(1, H, W, C)


def k_gelu(x_ref, w1_ref, o_ref):
    # fc1-shaped hidden + exact-erf GELU, then fold back by summing groups
    x = x_ref[...].reshape(H * W, C)
    y = cb._dot(x, w1_ref[...])
    yf = y.astype(jnp.float32)
    y = yf * 0.5 * (1.0 + cb._erf(yf * (2.0**-0.5)))
    o_ref[...] = (y[:, :C] + y[:, C:2*C] + y[:, 2*C:3*C] + y[:, 3*C:]
                  ).astype(x_ref.dtype).reshape(1, H, W, C)


def k_gelu_tanhless(x_ref, w1_ref, o_ref):
    # same shapes, cheap activation (isolates the erf polynomial cost)
    x = x_ref[...].reshape(H * W, C)
    y = cb._dot(x, w1_ref[...])
    yf = y.astype(jnp.float32)
    y = yf * jnp.minimum(jnp.maximum(yf + 0.5, 0.0), 1.0)
    o_ref[...] = (y[:, :C] + y[:, C:2*C] + y[:, 2*C:3*C] + y[:, 3*C:]
                  ).astype(x_ref.dtype).reshape(1, H, W, C)


def k_dots(x_ref, wq_ref, wp_ref, w1_ref, w2_ref, o_ref):
    # qkv(2x) + proj + MLP dot chain, no LN/GELU/attention
    x = x_ref[...].reshape(H * W, C)
    a = cb._dot(x, wq_ref[...])          # (HW, 3C) horizontal qkv
    b = cb._dot(x, wq_ref[...])          # vertical qkv stand-in
    att = a[:, :C] + b[:, :C]
    att = cb._dot(att, wp_ref[...])
    y = cb._dot(att, w1_ref[...])
    y = cb._dot(y.astype(x.dtype), w2_ref[...])
    o_ref[...] = y.astype(x_ref.dtype).reshape(1, H, W, C)


def k_slices(x_ref, wq_ref, o_ref):
    # the branch layout ops: qkv, lane slices, window reshapes, concat back
    x = x_ref[...].reshape(H * W, C)
    qkv = cb._dot(x, wq_ref[...])
    half = C // 2
    parts = []
    for i in range(3):
        s = qkv[:, i * C : i * C + half].reshape(56, 56, half)
        parts.append(s)
    v = jnp.concatenate(parts, -1).reshape(H * W, 3 * half)
    o_ref[...] = jnp.concatenate([v, v[:, :half]], -1).astype(
        x_ref.dtype).reshape(1, H, W, C)


def main():
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    run_kernel("copy", k_copy)
    run_kernel("ln x2", k_ln2, [jnp.ones((C,)), jnp.zeros((C,))])
    run_kernel("fc1+gelu(erf)", k_gelu, [mk(C, HID)])
    run_kernel("fc1+cheap-act", k_gelu_tanhless, [mk(C, HID)])
    run_kernel("dot chain", k_dots, [mk(C, 3 * C), mk(C, C), mk(C, HID),
                                     mk(HID, C)])
    run_kernel("qkv+slices", k_slices, [mk(C, 3 * C)])


if __name__ == "__main__":
    main()
