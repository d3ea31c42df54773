#!/usr/bin/env python
"""A/B the branch-batched dual-stripe formulation (_dual_branch_bb: both
branches stacked on the window-batch dim -> ONE attention + ONE LePE pass)
vs the per-branch path, inside the production xt block kernel — fresh jits
(bypassing _fused_block_fwd's cache via __wrapped__), long chains.

Usage: python scripts/exp_bb.py [fwd|bwd|both] [stage ...]   (default fwd 1 2 3)
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


def main(mode, stages):
    for st in stages:
        g = STAGES[st]
        if g["last"]:
            continue
        H, W, C, heads, split = g["H"], g["W"], g["C"], g["heads"], g["split"]
        scale = (C // heads) ** -0.5
        params = mk_params(g, np.random.default_rng(0))
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)

        for bb in ("off", "on"):
            cb._BB_MODE = bb
            try:
                if mode in ("fwd", "both"):
                    fn = jax.jit(
                        lambda xx, *pp: cb._fused_block_fwd.__wrapped__(
                            xx, pp, None, H=H, W=W, C=C, heads=heads,
                            split=split, last_stage=False, scale=scale,
                            qkv_bias=True, g_images=None, use_xt=True)
                        + xx * 1e-6)
                    t = chain_time(fn, (x, *params), ca=10, cb_=40, n=4)
                    print(f"s{st} fwd bb={bb}: {t*1000:8.3f} ms", flush=True)
                if mode in ("bwd", "both"):
                    # grad through the public custom_vjp so the hand-written
                    # bwd kernel runs; _fused_block_bwd_xt's jit cache ignores
                    # _BB_MODE, so clear it between modes.
                    cb._fused_block_bwd_xt.clear_cache()
                    cb._fused_block_fwd.clear_cache()
                    def step2(xx, *pp):
                        def lossf(a):
                            o = cb.fused_cswin_block(
                                a, tuple(pp), None, H, W, C, heads, split,
                                False, scale, True)
                            return jnp.sum(o.astype(jnp.float32)) * 1e-6
                        dx = jax.grad(lossf)(xx)
                        return xx + dx.astype(xx.dtype)
                    fn = jax.jit(step2)
                    t = chain_time(fn, (x, *params), ca=4, cb_=12, n=4)
                    print(f"s{st} bwd bb={bb}: {t*1000:8.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"s{st} bb={bb}: FAIL {str(e)[:200]}", flush=True)
        cb._BB_MODE = "auto"


if __name__ == "__main__":
    args = sys.argv[1:]
    mode = args[0] if args and args[0] in ("fwd", "bwd", "both") else "fwd"
    stages = [int(a) for a in args if a.isdigit()] or [1, 2, 3]
    main(mode, stages)
