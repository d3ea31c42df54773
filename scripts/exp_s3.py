#!/usr/bin/env python
"""Stage-3 (and stage-2) attention-formulation grid: (_HB_MODE x _BB_MODE
x G) combos of the production xt block kernel, fresh jits, long chains.
The s3 block costs ~1.0-1.3 ms at bs128 against a 0.33 ms matmul core;
its attention branches (~0.65 ms) are the residual cost center.

Usage: python scripts/exp_s3.py [stage ...]   (default 3)
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
        H, W, C, heads, split = g["H"], g["W"], g["C"], g["heads"], g["split"]
        scale = (C // heads) ** -0.5
        params = mk_params(g, np.random.default_rng(0))
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)

        for hb in ("on", "off"):
            for bb in ("on", "off"):
                for gi in (4, 8, 16):
                    cb._HB_MODE = hb
                    cb._BB_MODE = bb
                    try:
                        fn = jax.jit(
                            lambda xx, *pp, _g=gi: cb._fused_block_fwd.__wrapped__(
                                xx, pp, None, H=H, W=W, C=C, heads=heads,
                                split=split, last_stage=g["last"], scale=scale,
                                qkv_bias=True, g_images=_g, use_xt=True)
                            + xx * 1e-6)
                        t = chain_time(fn, (x, *params), ca=10, cb_=40, n=4)
                        print(f"s{st} hb={hb:3s} bb={bb:3s} G={gi:2d}: "
                              f"{t*1000:8.3f} ms", flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(f"s{st} hb={hb:3s} bb={bb:3s} G={gi:2d}: FAIL "
                              f"{str(e)[:120]}", flush=True)
                    finally:
                        cb._HB_MODE = "auto"
                        cb._BB_MODE = "auto"


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [3])
