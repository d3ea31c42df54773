#!/usr/bin/env python
"""Fused-Pallas vs XLA-composed block at bs128 per stage geometry.

The exp_h.py ablations show the fused kernel's time is invariant to
removing the h-branch or LePE — it is bound by in-kernel scheduling, not
math. This times the XLA composition (giant batched dots over all images,
XLA's own fusion/scheduling) as the alternative, per stage.

Usage: python scripts/exp_xla_block.py [stage ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import STAGES, chain_time, mk_params

B = 128


def time_stage(st):
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    params = mk_params(g, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    kw = dict(H=H, W=W, C=C, heads=heads, split=split, last_stage=last,
              scale=32 ** -0.5, qkv_bias=True)

    def f_fused(xx, *pp):
        return cb.fused_cswin_block(xx, pp, None, **kw) + xx * 1e-6

    def f_xla(xx, *pp):
        return cb.composed_block(xx, pp, **kw) + xx * 1e-6

    for name, fn in (("fused", f_fused), ("xla", f_xla)):
        try:
            t = chain_time(fn, (x, *params), ca=10, cb_=40, n=4)
            print(f"s{st} {name:6s}: {t*1000:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"s{st} {name:6s}: FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4]
    for st in stages:
        time_stage(st)
