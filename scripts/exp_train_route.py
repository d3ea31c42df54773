#!/usr/bin/env python
"""A/B the training routing threshold: stage-3 (14x14) blocks through the
fused fwd+bwd kernel pair vs the XLA composition replay, measured on the
REAL bs-24 train step (the round-2 4.9-vs-3.2 numbers predate the HB
attention backward and bf16 LePE; exp_g shows the fused bwd at 3.36 ms now).

Timing uses bench.py's method: ONE jitted step driven from a Python loop
(async dispatch amortizes tunnel latency; scan chains OOM the remote
compile helper on train graphs), differencing two loop lengths.

Usage: python scripts/exp_train_route.py [B] [reso ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
import optax

import cswin_unet_tpu.models.cswin_unet as mcu
from cswin_unet_tpu.losses import segmentation_loss
from cswin_unet_tpu.models import CSWinUNet, CSwinUnet
from cswin_unet_tpu.train.trainer import make_optimizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
RESOS = [int(a) for a in sys.argv[2:]] or [28, 14]


def time_step(min_reso):
    mcu._FUSE_TRAIN_MIN_RESO = min_reso
    model = CSwinUnet(backbone=CSWinUNet(
        img_size=224, num_classes=9, embed_dim=64, depth=(1, 2, 9, 1),
        split_size=(1, 2, 7, 7), num_heads=(2, 4, 8, 16), drop_path_rate=0.2,
        dtype=jnp.bfloat16, attn_impl="fused",
    ))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 224, 224, 1)))
    optimizer = make_optimizer(0.05, 10_000)
    opt_state = jax.device_put(optimizer.init(jax.device_get(params)))
    jax.block_until_ready(opt_state)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(B, 224, 224, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 9, size=(B, 224, 224)).astype(np.int32))

    def one_step(params, opt_state, step_i):
        def objective(p):
            logits = model.apply(
                p, image, deterministic=False,
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0),
                                                    step_i)})
            total, aux = segmentation_loss(logits, label, 9)
            return total, aux

        (_, aux), grads = jax.value_and_grad(objective, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux["loss"]

    step_fn = jax.jit(one_step)

    def run(k):
        p, s = params, opt_state
        loss = None
        for i in range(k):
            p, s, loss = step_fn(p, s, i)
        jax.block_until_ready(loss)

    run(2)

    def best(k, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); run(k); ts.append(time.perf_counter() - t0)
        return min(ts)

    t = (best(16) - best(6)) / 10  # device-resident state: runs are pure step time
    print(f"min_reso={min_reso:3d}: {t*1000:8.2f} ms/step "
          f"({B/t:7.1f} samples/s)", flush=True)


if __name__ == "__main__":
    for r in RESOS:
        time_step(r)
