#!/usr/bin/env python
"""Time the decoder tail (CARAFE4 + classifier) variants at bs B.

The fused-exact carafe_with_classifier materializes out64
(B,56,56,C,up²) in f32 — ~411 MB at bs 128 — before projecting to classes.
Variants reorder the contraction to shrink intermediates:

  v0-current     patches→(tap einsum on C)→(class proj)→shuffle
  v1-cls-mid     patches→(class proj on patches)→(tap einsum on NC)→shuffle
  v2-cls-first   x→classes first→patches on NC→tap einsum  (lane-starved)
  v3-bf16        v0 with bf16 intermediates
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cswin_unet_tpu.ops.carafe import extract_patches_3x3

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = 56
C, NC, K, UP = 64, 9, 3, 4
K2, UP2 = K * K, UP * UP
DT = jnp.bfloat16

rng = np.random.default_rng(0)
mk = lambda *s, sc=0.05: jnp.asarray(rng.standard_normal(s).astype(np.float32) * sc)

params = dict(
    down_kernel=mk(1, 1, C, C // 4), down_bias=mk(C // 4),
    encoder_kernel=mk(K, K, C // 4, UP2 * K2), encoder_bias=mk(UP2 * K2),
    out_kernel=mk(1, 1, C, C), out_bias=mk(C),
    cls_kernel=mk(1, 1, C, NC),
)


def conv(inp, kern, bias, pad):
    y = lax.conv_general_dilated(
        inp, kern.astype(inp.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if bias is None else y + bias.astype(y.dtype)


def predict_kern(x, p):
    enc = conv(conv(x, p["down_kernel"], p["down_bias"], 0),
               p["encoder_kernel"], p["encoder_bias"], K // 2)
    kern = enc.reshape(B, H, W, K2, UP2)
    return jax.nn.softmax(kern.astype(jnp.float32), axis=3).astype(x.dtype)


def shuffle(t):  # (B,H,W,NC,UP2) -> (B,4H,4W,NC)
    t = t.reshape(B, H, W, NC, UP, UP)
    t = t.transpose(0, 1, 4, 2, 5, 3)
    return t.reshape(B, H * UP, W * UP, NC)


def v0_current(x, p):
    kern = predict_kern(x, p)
    w_cls = p["cls_kernel"][0, 0].astype(jnp.float32)
    bias_comb = p["out_bias"].astype(jnp.float32) @ w_cls
    y = conv(x, p["out_kernel"], None, 0)
    patches = extract_patches_3x3(y, K)
    out64 = jnp.einsum("bhwck,bhwks->bhwcs", patches, kern,
                       preferred_element_type=jnp.float32)
    logits = jnp.einsum("bhwcs,cn->bhwns", out64, w_cls.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return shuffle((logits + bias_comb[:, None]).astype(x.dtype))


def v1_cls_mid(x, p):
    kern = predict_kern(x, p)
    w_cls = p["cls_kernel"][0, 0].astype(jnp.float32)
    bias_comb = p["out_bias"].astype(jnp.float32) @ w_cls
    y = conv(x, p["out_kernel"], None, 0)
    patches = extract_patches_3x3(y, K)              # (B,H,W,C,k2)
    p9 = jnp.einsum("bhwck,cn->bhwnk", patches, w_cls.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    logits = jnp.einsum("bhwnk,bhwks->bhwns", p9, kern,
                        preferred_element_type=jnp.float32)
    return shuffle((logits + bias_comb[:, None]).astype(x.dtype))


def v2_cls_first(x, p):
    kern = predict_kern(x, p)
    w_comb = jnp.einsum("c d, d n -> c n", p["out_kernel"][0, 0],
                        p["cls_kernel"][0, 0])
    bias_comb = p["out_bias"].astype(jnp.float32) @ p["cls_kernel"][0, 0].astype(jnp.float32)
    y9 = jnp.einsum("bhwc,cn->bhwn", x, w_comb.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    patches = extract_patches_3x3(y9, K)             # (B,H,W,NC,k2)
    logits = jnp.einsum("bhwnk,bhwks->bhwns", patches, kern,
                        preferred_element_type=jnp.float32)
    return shuffle((logits + bias_comb[:, None]).astype(x.dtype))


def v3_bf16(x, p):
    kern = predict_kern(x, p)
    w_cls = p["cls_kernel"][0, 0].astype(jnp.float32)
    bias_comb = p["out_bias"].astype(jnp.float32) @ w_cls
    y = conv(x, p["out_kernel"], None, 0)
    patches = extract_patches_3x3(y, K)
    out64 = jnp.einsum("bhwck,bhwks->bhwcs", patches, kern,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    logits = jnp.einsum("bhwcs,cn->bhwns", out64, w_cls.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return shuffle((logits + bias_comb[:, None]).astype(x.dtype))


def v4_pallas(x, p):
    from cswin_unet_tpu.ops.pallas.carafe_tail import carafe_tail_pallas

    return carafe_tail_pallas(
        x, p["down_kernel"], p["down_bias"], p["encoder_kernel"],
        p["encoder_bias"], p["out_kernel"], p["out_bias"], p["cls_kernel"],
        up_factor=UP)


def timeit(fn, x, p, ca=11, cb=31, n=3):
    def chained(x, k):
        def body(c, _):
            y = fn(c, p)
            r = jnp.sum(y, axis=(1, 2, 3))
            return c + 1e-6 * r[:, None, None, None].astype(c.dtype), ()
        c, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(c)

    fa = jax.jit(lambda x: chained(x, ca))
    fb = jax.jit(lambda x: chained(x, cb))
    float(fa(x)); float(fb(x))

    def best(f):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(f(x)); ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fb) - best(fa)) / (cb - ca)


def main():
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(DT)
    ref = None
    for name, fn in [("v0-current", v0_current), ("v4-pallas", v4_pallas)]:
        out = jax.jit(lambda x, fn=fn: fn(x, params))(x)
        out = np.asarray(out, np.float32)
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        t = timeit(fn, x, params)
        print(f"{name:14s}: {t*1000:7.3f} ms   max|Δ| vs v0 = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
