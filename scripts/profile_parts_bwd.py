#!/usr/bin/env python
"""Per-component fwd+bwd timing of the CSWin-UNet TRAIN step at batch B.

exp_train_parts.py localized the bs-24 step as 13.9 ms forward + ~30.4 ms
backward (grad - fwd_loss); the block-level bwd numbers only explain about
half of that. This times each architectural piece's full vjp (cotangent
ones, PARAM grads kept live in the chain so XLA cannot DCE the wgrad dots)
in isolation, weighted by its occurrence count — the train-side analogue
of profile_parts.py.

Blocks are timed with the attn_impl the TRAIN routing actually uses
(_FUSE_TRAIN_MIN_RESO: fused at reso >= 28, composed XLA below/last).

Usage: python scripts/profile_parts_bwd.py [B]      (default 24)
Env:   PARTS_ONLY=<substr> to filter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax

from cswin_unet_tpu.losses import segmentation_loss
from cswin_unet_tpu.models.cswin_unet import (CarafeUpsample, CSWinBlock,
                                              MergeBlock)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
DT = jnp.bfloat16


def timeit_vjp(make_fn, shape, ca=6, cb=16, n=3):
    params, apply = make_fn()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32)
    ).astype(DT if len(shape) == 4 else jnp.float32)

    def body(c, _):
        y, vjp = jax.vjp(lambda pp, xx: apply(pp, xx), params, c)
        dp, dx = vjp(jnp.ones_like(y))
        # keep BOTH grads live: dx feeds the carry, dp folds in as a scalar
        dpsum = sum((jnp.sum(l.astype(jnp.float32))
                     for l in jax.tree_util.tree_leaves(dp)),
                    jnp.zeros((), jnp.float32))
        return (c + 1e-6 * dx.astype(c.dtype)
                + (1e-12 * dpsum).astype(c.dtype)), ()

    def chained(c0, k):
        c, _ = lax.scan(body, c0, None, length=k)
        return jnp.sum(c.astype(jnp.float32))

    fa = jax.jit(lambda c0: chained(c0, ca))
    fb = jax.jit(lambda c0: chained(c0, cb))
    float(fa(x)); float(fb(x))

    def best(f):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(f(x)); ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fb) - best(fa)) / (cb - ca)


def block(dim, reso, heads, split, last=False, impl="fused"):
    def make():
        m = CSWinBlock(dim=dim, reso=(reso, reso), num_heads=heads,
                       split_size=split, last_stage=last, dtype=DT,
                       attn_impl=impl, deterministic=True)
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
        m = nn.Conv(cout, (k, k), strides=(s, s),
                    padding=((pad, pad), (pad, pad)), dtype=DT)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, reso, reso, cin)))
        return p, lambda p, x: m.apply(p, x)
    return make


def loss_part():
    def make():
        label = jnp.asarray(
            np.random.default_rng(1).integers(0, 9, size=(B, 224, 224))
        ).astype(jnp.int32)

        def apply(_, logits):
            return segmentation_loss(logits.astype(jnp.float32), label, 9)[0]

        return (), apply
    return make


PARTS = [
    # (name, count in the train step, builder, input shape)
    ("stem conv7x7/4", 1, conv(1, 64, 224, 7, 4, 2), (B, 224, 224, 1)),
    ("block s1 fused (56²,64)", 2, block(64, 56, 2, 1), (B, 56, 56, 64)),
    ("block s2 fused (28²,128)", 4, block(128, 28, 4, 2), (B, 28, 28, 128)),
    ("block s3 xla (14²,256)", 18, block(256, 14, 8, 7, impl="xla"),
     (B, 14, 14, 256)),
    ("block s4 xla (7²,512)", 2, block(512, 7, 16, 7, last=True, impl="xla"),
     (B, 7, 7, 512)),
    ("merge1 64->128", 1, merge(64, 128, 56), (B, 56, 56, 64)),
    ("merge2 128->256", 1, merge(128, 256, 28), (B, 28, 28, 128)),
    ("merge3 256->512", 1, merge(256, 512, 14), (B, 14, 14, 256)),
    ("carafe4 512->256 @7", 1, carafe(512, 256, 7), (B, 7, 7, 512)),
    ("carafe3 256->128 @14", 1, carafe(256, 128, 14), (B, 14, 14, 256)),
    ("carafe2 128->64 @28", 1, carafe(128, 64, 28), (B, 28, 28, 128)),
    ("carafe1 64->64 @56 x4", 1, carafe(64, 64, 56, up=4), (B, 56, 56, 64)),
    ("output conv1x1 @224", 1, conv(64, 9, 224, 1, 1, 0), (B, 224, 224, 64)),
    ("loss CE+Dice @224", 1, loss_part(), (B, 224, 224, 9)),
]


def main():
    only = os.environ.get("PARTS_ONLY", "")
    total = 0.0
    for name, count, builder, shape in PARTS:
        if only and only not in name:
            continue
        try:
            t = timeit_vjp(builder, shape)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s}: FAIL {str(e)[:160]}", flush=True)
            continue
        total += t * count
        print(f"{name:28s} x{count:2d}: {t*1000:7.2f} ms each -> "
              f"{t*count*1000:7.2f} ms", flush=True)
    print(f"{'SUM of parts (fwd+bwd)':28s}    : {total*1000:7.2f} ms "
          f"(vs exp_train_parts grad)", flush=True)


if __name__ == "__main__":
    main()
