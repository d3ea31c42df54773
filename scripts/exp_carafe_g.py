#!/usr/bin/env python
"""Sweep G (images/program) for the fused CARAFE upsampler at the small
decoder sites (@14 and @7) on TPU, vs the XLA 'fast' composition.

Round-2 status: @14 Pallas G=1 lost to XLA (0.95 vs 0.37 ms) and @7 hit
the 49-row reshape landmine; G > 1 (roll+mask shifts) amortizes program
overhead and widens the dots.

Usage: python scripts/exp_carafe_g.py
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

from cswin_unet_tpu.ops.carafe import carafe
from cswin_unet_tpu.ops.pallas.carafe_tail import carafe_fused_pallas

from exp_hb import chain_time

SITES = {  # decoder upsamplers, tiny/224: (H, C, C_out)
    14: (14, 256, 128),
    7: (7, 512, 256),
}


def run(site, B=128, gs=(1, 2, 4, 8, 16)):
    H, C, CO = SITES[site]
    rng = np.random.default_rng(0)
    mk = lambda *s, sc=0.2: jnp.asarray(rng.standard_normal(s).astype(np.float32) * sc)
    p = dict(down_kernel=mk(1, 1, C, C // 4), down_bias=mk(C // 4),
             encoder_kernel=mk(3, 3, C // 4, 4 * 9), encoder_bias=mk(4 * 9),
             out_kernel=mk(1, 1, C, CO), out_bias=mk(CO))
    x = mk(B, H, H, C, sc=1.0).astype(jnp.bfloat16)
    args = tuple(p[k] for k in ("down_kernel", "down_bias", "encoder_kernel",
                                "encoder_bias", "out_kernel", "out_bias"))

    def glue(y, xx):
        # (B, 2H, 2W, CO) -> feed back into (B, H, W, C): cheap slice+pad
        t = y[:, :H, :H, :].astype(jnp.float32)
        t = jnp.concatenate([t] * (C // CO), -1).astype(xx.dtype)
        return xx + t * 1e-6

    def xla_step(xx, *a):
        return glue(carafe(xx, *a, kernel_size=3, up_factor=2, impl="fast"), xx)

    t = chain_time(xla_step, (x,) + args)
    print(f"@{site} B={B} xla fast : {t*1000:8.3f} ms", flush=True)

    for G in gs:
        def pl_step(xx, *a):
            return glue(carafe_fused_pallas(xx, *a, up_factor=2, g_images=G), xx)
        try:
            t = chain_time(pl_step, (x,) + args)
            print(f"@{site} B={B} pallas G={G:2d}: {t*1000:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"@{site} B={B} pallas G={G:2d}: FAIL {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    for s in [int(a) for a in sys.argv[1:]] or [14, 7]:
        run(s)
