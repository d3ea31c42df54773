#!/usr/bin/env python
"""A/B: two single-block pallas_calls vs ONE fused pair kernel.

The stage-3 ablation (exp_ablate3.py) showed the 14x14 block cost is
per-call fixed overhead, not removable math; the pair kernel halves the
call count. Usage: python scripts/exp_pair.py [stage ...] (default 3 2).
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
        H, W, C, heads, split = g["H"], g["W"], g["C"], g["heads"], g["split"]
        if g["last"]:
            continue
        scale = (C // heads) ** -0.5
        r = np.random.default_rng(0)
        p1, p2 = mk_params(g, r), mk_params(g, r)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)

        def two_singles(xx, pp1, pp2):
            y = cb._fused_block_fwd(
                xx, pp1, None, H=H, W=W, C=C, heads=heads, split=split,
                last_stage=False, scale=scale, qkv_bias=True)
            y = cb._fused_block_fwd(
                y.astype(xx.dtype), pp2, None, H=H, W=W, C=C, heads=heads,
                split=split, last_stage=False, scale=scale, qkv_bias=True)
            return y.astype(xx.dtype) + xx * 1e-6

        def pair(xx, pp1, pp2):
            y = cb._fused_block_pair_fwd(
                xx, pp1, pp2, H=H, W=W, C=C, heads=heads, split=split,
                scale=scale, qkv_bias=True)
            return y.astype(xx.dtype) + xx * 1e-6

        t2 = chain_time(two_singles, (x, p1, p2))
        print(f"stage {st} B={B} 2x single: {t2*1000:8.3f} ms", flush=True)
        try:
            tp = chain_time(pair, (x, p1, p2))
            print(f"stage {st} B={B} pair     : {tp*1000:8.3f} ms "
                  f"({(t2-tp)/t2*100:+.1f}%)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"stage {st} B={B} pair     : FAIL {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    stages = [int(a) for a in sys.argv[1:]] or [3, 2]
    main(stages)
