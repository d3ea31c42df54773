#!/usr/bin/env python
"""Training-step throughput: chained train steps (params/opt-state carried
through a lax.scan) at the reference recipe batch and at large batch."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cswin_unet_tpu.models import CSWinUNet, CSwinUnet
from cswin_unet_tpu.train.trainer import make_optimizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24

model = CSwinUnet(backbone=CSWinUNet(
    img_size=224, num_classes=9, embed_dim=64, depth=(1, 2, 9, 1),
    split_size=(1, 2, 7, 7), num_heads=(2, 4, 8, 16), drop_path_rate=0.2,
    dtype=jnp.bfloat16, attn_impl="fused",
))
params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 1)))
optimizer = make_optimizer(0.05, 10_000)
opt_state = optimizer.init(jax.device_get(params))

rng = np.random.default_rng(0)
image = jnp.asarray(rng.normal(size=(B, 224, 224, 1)).astype(np.float32))
label = jnp.asarray(rng.integers(0, 9, size=(B, 224, 224)).astype(np.int32))

from cswin_unet_tpu.losses import segmentation_loss


def one_step(params, opt_state, step_i):
    def objective(p):
        logits = model.apply(p, image, deterministic=False,
                             rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0), step_i)})
        total, aux = segmentation_loss(logits, label, 9)
        return total, aux

    import optax
    (_, aux), grads = jax.value_and_grad(objective, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, aux["loss"]


def chained(params, opt_state, k):
    def body(carry, i):
        p, s = carry
        p, s, loss = one_step(p, s, i)
        return (p, s), loss

    (p, s), losses = lax.scan(body, (params, opt_state), jnp.arange(k))
    return losses[-1]


ca, cb = 6, 16
fa = jax.jit(lambda p, s: chained(p, s, ca))
fb = jax.jit(lambda p, s: chained(p, s, cb))
t0 = time.perf_counter(); float(fa(params, opt_state)); print("compile a", time.perf_counter() - t0)
t0 = time.perf_counter(); float(fb(params, opt_state)); print("compile b", time.perf_counter() - t0)


def best(f, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(f(params, opt_state)); ts.append(time.perf_counter() - t0)
    return min(ts)


per = (best(fb) - best(fa)) / (cb - ca)
print(f"train step B={B}: {per*1000:.1f} ms/step, {B/per:.0f} samples/s/chip")
