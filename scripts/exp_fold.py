#!/usr/bin/env python
"""Price the fold variant (single x stream, in-kernel joint qkv_v transpose)
against the production xt variant (x + XLA-transposed x streams, second LN).

exp_cum L0 put the dual-stream floor at 1.375 ms (stage 1, bs128) vs a
0.75 ms single-stream copy — the fold variant trades that extra stream +
the XLA transpose pass + LN(xt) for ONE in-kernel (G, H, W, 3·half)
transpose.  Checks numerical agreement first, then chain-times both.

Usage: python scripts/exp_fold.py [stage ...]   (default 1 2 3)
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

        outs = {}
        for mode in (True, "fold"):
            fn = jax.jit(lambda xx, *pp, _m=mode: cb._fused_block_fwd.__wrapped__(
                xx, pp, None, H=H, W=W, C=C, heads=heads, split=split,
                last_stage=False, scale=scale, qkv_bias=True,
                g_images=None, use_xt=_m) + xx * 1e-6)
            try:
                outs[mode] = np.asarray(fn(x, *params), np.float32)
                t = chain_time(fn, (x, *params), ca=10, cb_=40, n=4)
                print(f"s{st} use_xt={str(mode):5s}: {t*1000:8.3f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"s{st} use_xt={str(mode):5s}: FAIL {str(e)[:200]}",
                      flush=True)
        if len(outs) == 2:
            a, b = outs[True], outs["fold"]
            err = np.max(np.abs(a - b) / (np.abs(a) + 1e-3))
            print(f"s{st} fold-vs-xt max rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 2, 3])
