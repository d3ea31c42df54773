#!/usr/bin/env python
"""Decompose the bs-24 train step (bench.py bench_train recipe) on TPU.

Variants isolate where the ~66 ms step goes beyond the transformer blocks:

  fwd        model forward only (deterministic off, dropout live)
  fwd_loss   forward + CE+Dice loss value
  grad       value_and_grad of the loss (no optimizer)
  full       grad + SGD-momentum update (the real step)

grad - fwd_loss ~= backward; full - grad ~= optimizer; fwd_loss - fwd ~=
loss math (one-hot dice at 224^2 is f32-heavy).

Usage: python scripts/exp_train_parts.py [variant ...]
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

from cswin_unet_tpu.losses import segmentation_loss
from cswin_unet_tpu.train.trainer import make_optimizer

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import bench


def main(variants):
    B = 24
    model = bench._tiny(jnp)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 224, 224, 1)))
    optimizer = make_optimizer(0.05, 10_000)
    opt_state = optimizer.init(jax.device_get(params))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(B, 224, 224, 1)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 9, size=(B, 224, 224)).astype(np.int32))

    def fwd_logits(p, i):
        return model.apply(
            p, image, deterministic=False,
            rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0), i)})

    def objective(p, i):
        total, aux = segmentation_loss(fwd_logits(p, i), label, 9)
        return total, aux

    def step_fwd(p, s, i):
        return p, s, jnp.sum(fwd_logits(p, i)[..., 0])

    def step_fwd_loss(p, s, i):
        total, _ = objective(p, i)
        return p, s, total

    def step_grad(p, s, i):
        (_, aux), grads = jax.value_and_grad(objective, has_aux=True)(p, i)
        # consume grads without the update: fold their global norm into p
        gn = optax.global_norm(grads)
        p = jax.tree.map(lambda t: t + (0.0 * gn).astype(t.dtype), p)
        return p, s, aux["loss"]

    def step_full(p, s, i):
        (_, aux), grads = jax.value_and_grad(objective, has_aux=True)(p, i)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, aux["loss"]

    steps = {"fwd": step_fwd, "fwd_loss": step_fwd_loss, "grad": step_grad,
             "full": step_full}

    for name in variants:
        fn = jax.jit(steps[name])

        def run(k):
            p, s = params, opt_state
            for i in range(k):
                p, s, out = fn(p, s, i)
            jax.block_until_ready(out)

        try:
            run(2)
            best = {}
            for kk in (6, 16):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    run(kk)
                    ts.append(time.perf_counter() - t0)
                best[kk] = min(ts)
            per = (best[16] - best[6]) / 10
            print(f"{name:9s}: {per*1000:8.2f} ms/step "
                  f"({B/per:7.1f} samples/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:9s}: FAIL {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["fwd", "fwd_loss", "grad", "full"])
