#!/usr/bin/env python
"""A/B the sp_h >= 2 LePE formulation inside the production block kernel:
flat row-shift (3D view, iota boundary masks) vs 4D zero-fill concat
shifts — one run, fresh jits, long chains (see _lepe_flat routing).

Usage: python scripts/exp_lepe.py [stage ...]   (default 2 3)
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


def main(stages):
    for st in stages:
        g = STAGES[st]
        if g["last"]:
            continue
        H, W, C, heads, split = g["H"], g["W"], g["C"], g["heads"], g["split"]
        scale = (C // heads) ** -0.5
        params = mk_params(g, np.random.default_rng(0))
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)

        for use_xt in (True, "fold"):
            for flat in (False, True):
                saved = cb._lepe_flat
                cb._lepe_flat = lambda c, _f=flat: _f
                try:
                    fn = jax.jit(
                        lambda xx, *pp, _m=use_xt, _f=flat:
                        cb._fused_block_fwd.__wrapped__(
                            xx, pp, None, H=H, W=W, C=C, heads=heads,
                            split=split, last_stage=False, scale=scale,
                            qkv_bias=True, g_images=None, use_xt=_m)
                        + xx * 1e-6)
                    t = chain_time(fn, (x, *params), ca=10, cb_=40, n=4)
                    print(f"s{st} xt={str(use_xt):5s} flat={int(flat)}: "
                          f"{t*1000:8.3f} ms", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"s{st} xt={str(use_xt):5s} flat={int(flat)}: FAIL "
                          f"{str(e)[:160]}", flush=True)
                finally:
                    cb._lepe_flat = saved


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [2, 3])
