#!/usr/bin/env python
"""Time the on-device (Pallas) HD95/Dice metrics vs the host C++ EDT.

Masks are synthesised ON DEVICE (thresholded smoothed noise) so the tunnel
H2D cost doesn't pollute the kernel timing; the host path times
metrics.volume_metrics (native C++ EDT when available) on the same masks
pulled once.

Usage: python scripts/exp_edt.py [D] [HW] [classes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from cswin_unet_tpu.metrics import volume_metrics
from cswin_unet_tpu.ops import edt

D = int(sys.argv[1]) if len(sys.argv) > 1 else 112
HW = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CLASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 9


def synth_vol(key, shape, classes):
    """Blobby integer label volume on device: argmax of C smoothed noise
    channels, biased toward background."""
    x = jax.random.normal(key, shape + (classes,))
    # cheap smoothing: two box-blur passes along H and W
    for ax in (1, 2):
        x = (x + jnp.roll(x, 1, ax) + jnp.roll(x, -1, ax)) / 3.0
        x = (x + jnp.roll(x, 2, ax) + jnp.roll(x, -2, ax)) / 3.0
    bias = jnp.zeros((classes,)).at[0].set(1.0)
    return jnp.argmax(x * 0.5 + bias, axis=-1).astype(jnp.int32)


def main():
    shape = (D, HW, HW)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pred = jax.block_until_ready(synth_vol(k1, shape, CLASSES))
    gt = jax.block_until_ready(synth_vol(k2, shape, CLASSES))

    fn = lambda p, g: edt.volume_metrics_device(p, g, CLASSES)
    out = jax.block_until_ready(fn(pred, gt))  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(fn(pred, gt))
    t_dev = (time.perf_counter() - t0) / 3
    print(f"device volume_metrics ({D}x{HW}x{HW}, {CLASSES} cls): "
          f"{t_dev*1000:8.1f} ms", flush=True)

    pred_h = np.asarray(pred)
    gt_h = np.asarray(gt)
    t0 = time.perf_counter()
    host = volume_metrics(pred_h, gt_h, CLASSES)
    t_host = time.perf_counter() - t0
    print(f"host volume_metrics (C++ EDT):        {t_host*1000:8.1f} ms",
          flush=True)

    dev = np.asarray(out)
    hst = np.array(host)
    err = np.max(np.abs(dev - hst))
    print(f"max |device - host| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
