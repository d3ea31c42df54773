#!/usr/bin/env python
"""Price the in-kernel vertical-branch transpose: production kernel vs the
same kernel with the transpose ablated (wrong math, same shapes).

Usage: python scripts/exp_t.py [stage ...]   (default 1 2 3)
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


def main(stages, B=128):
    for st in stages:
        g = STAGES[st]
        if g["last"]:
            continue
        H, W, C, heads, split = g["H"], g["W"], g["C"], g["heads"], g["split"]
        scale = (C // heads) ** -0.5
        params = mk_params(g, np.random.default_rng(0))
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)

        for skip in (False, True):
            cb._ABLATE_SKIP_VT = skip
            # fresh jit cache per flag value (the flag is trace-time)
            fwd = jax.jit(lambda xx, pp, _s=skip: cb._fused_block_fwd.__wrapped__(
                xx, pp, None, H=H, W=W, C=C, heads=heads, split=split,
                last_stage=False, scale=scale, qkv_bias=True,
                g_images=None, use_xt=True
            ).astype(xx.dtype) + xx * 1e-6)
            t = chain_time(fwd, (x, params))
            print(f"stage {st} B={B} skip_vt={int(skip)}: {t*1000:8.3f} ms",
                  flush=True)
        cb._ABLATE_SKIP_VT = False


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 2, 3])
