#!/usr/bin/env python
"""Sweep G (images per grid program) for the fused block at the small-reso
stages on TPU.

At stage 3 (14x14, split 7) each image contributes only nH = 2 windows, so
with the current default G=2 every window-batched dot has batch 4 — tiny
MXU work per issue. Larger G multiplies the window-batch dim directly;
VMEM is the ceiling (f32 working set scales with G).

Usage: python scripts/exp_g.py [fwd|bwd|both] [stage ...]
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

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import STAGES, chain_time, mk_params


def run_stage(st, B, gs, what):
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    scale = (C // heads) ** -0.5
    rng = np.random.default_rng(0)
    params = mk_params(g, rng)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    for G in gs:
        if B % G:
            continue
        if what in ("fwd", "both"):
            def fwd(xx, pp):
                return cb._fused_block_fwd(
                    xx, pp, None, H=H, W=W, C=C, heads=heads, split=split,
                    last_stage=last, scale=scale, qkv_bias=True, g_images=G,
                ).astype(xx.dtype) + xx * 1e-6
            try:
                t = chain_time(fwd, (x, params))
                print(f"stage {st} B={B} G={G:2d} fwd: {t*1000:8.3f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"stage {st} B={B} G={G:2d} fwd: FAIL {str(e)[:120]}",
                      flush=True)
        if what in ("bwd", "both") and not last:
            def bwd(xx, pp, dd):
                dx, _, _ = cb._fused_block_bwd_xt(
                    xx, pp, None, dd.astype(jnp.float32), H=H, W=W, C=C,
                    heads=heads, split=split, scale=scale, qkv_bias=True,
                    g_images=G)
                return dx.astype(xx.dtype) + xx * 1e-6
            try:
                t = chain_time(bwd, (x, params, x))
                print(f"stage {st} B={B} G={G:2d} bwd: {t*1000:8.3f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"stage {st} B={B} G={G:2d} bwd: FAIL {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    stages = [int(a) for a in sys.argv[2:]] or [3, 4]
    B = int(os.environ.get("HB_B", "128"))
    gs = [int(s) for s in os.environ.get("GS", "4,8,16").split(",")]
    for st in stages:
        run_stage(st, B, gs, what)
