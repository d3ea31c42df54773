#!/usr/bin/env python
"""Per-component timing of the CSWin-UNet forward at batch B.

Times each architectural piece in isolation with the long-chain-differencing
method (see bench.py) and multiplies by its occurrence count in the tiny/224
model. The sum vs the measured full forward localizes the bottleneck.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cswin_unet_tpu.models.cswin_unet import CSWinBlock, CarafeUpsample, MergeBlock

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
DT = jnp.bfloat16
ATTN = sys.argv[2] if len(sys.argv) > 2 else "fused"


def timeit(make_fn, shape, ca=11, cb=31, n=3):
    params, apply = make_fn()
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape).astype(np.float32))

    def chained(p, x, k):
        def body(c, _):
            y = apply(p, c)
            # keep carry shape: fold output back via a cheap projection
            r = jnp.sum(y, axis=tuple(range(1, y.ndim)))
            return c + (1e-6 * r).reshape((-1,) + (1,) * (len(shape) - 1)).astype(c.dtype), ()

        c, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(c)

    fa = jax.jit(lambda p, x: chained(p, x, ca))
    fb = jax.jit(lambda p, x: chained(p, x, cb))
    float(fa(params, x)); float(fb(params, x))

    def best(f):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(f(params, x)); ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fb) - best(fa)) / (cb - ca)


def block(dim, reso, heads, split, last=False):
    def make():
        m = CSWinBlock(dim=dim, reso=(reso, reso), num_heads=heads,
                       split_size=split, last_stage=last, dtype=DT, attn_impl=ATTN)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, reso, reso, dim)))
        return p, lambda p, x: m.apply(p, x)
    return make


def merge(dim, dim_out, reso):
    def make():
        m = MergeBlock(dim_out, dtype=DT)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, reso, reso, dim)))
        return p, lambda p, x: m.apply(p, x)
    return make


def carafe(dim, dim_out, reso, up=2):
    def make():
        m = CarafeUpsample(dim, dim_out, up_factor=up, dtype=DT)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, reso, reso, dim)))
        return p, lambda p, x: m.apply(p, x)
    return make


def conv(cin, cout, reso, k, s, pad):
    import flax.linen as nn

    def make():
        m = nn.Conv(cout, (k, k), strides=(s, s), padding=((pad, pad), (pad, pad)), dtype=DT)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, reso, reso, cin)))
        return p, lambda p, x: m.apply(p, x)
    return make


PARTS = [
    # (name, count in fwd, builder, input shape)
    ("stem conv7x7/4", 1, conv(3, 64, 224, 7, 4, 2), (B, 224, 224, 3)),
    ("block s1 (56²,64)", 2, block(64, 56, 2, 1), (B, 56, 56, 64)),
    ("block s2 (28²,128)", 4, block(128, 28, 4, 2), (B, 28, 28, 128)),
    ("block s3 (14²,256)", 18, block(256, 14, 8, 7), (B, 14, 14, 256)),
    ("block s4 (7²,512)", 2, block(512, 7, 16, 7, last=True), (B, 7, 7, 512)),
    ("merge1 64->128", 1, merge(64, 128, 56), (B, 56, 56, 64)),
    ("merge2 128->256", 1, merge(128, 256, 28), (B, 28, 28, 128)),
    ("merge3 256->512", 1, merge(256, 512, 14), (B, 14, 14, 256)),
    ("carafe4 512->256 @7", 1, carafe(512, 256, 7), (B, 7, 7, 512)),
    ("carafe3 256->128 @14", 1, carafe(256, 128, 14), (B, 14, 14, 256)),
    ("carafe2 128->64 @28", 1, carafe(128, 64, 28), (B, 28, 28, 128)),
    ("carafe1 64->64 @56 x4", 1, carafe(64, 64, 56, up=4), (B, 56, 56, 64)),
    ("output conv1x1 @224", 1, conv(64, 9, 224, 1, 1, 0), (B, 224, 224, 64)),
]

only = os.environ.get("PARTS_ONLY", "")
total = 0.0
for name, count, builder, shape in PARTS:
    if only and only not in name:
        continue
    t = timeit(builder, shape)
    total += t * count
    print(f"{name:26s} x{count:2d}: {t*1000:7.2f} ms each -> {t*count*1000:7.2f} ms")
print(f"{'SUM of parts':26s}    : {total*1000:7.2f} ms (full fwd measured separately)")
