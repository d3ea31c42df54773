#!/usr/bin/env python
"""Where do the stage-3/4 fused-block microseconds go?

Chain-times the PRODUCTION kernel (`_fused_block_fwd`, current G routing)
with individual sub-computations monkeypatched to cheap stand-ins
(mathematically wrong, op-mix preserved elsewhere). Deltas vs 'full'
localize the cost: attention dots+softmax, HB K/V tiling, LePE shifts,
or the matmul floor.

Usage: python scripts/exp_ablate3.py [stage ...]   (default: 3)
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


def time_variant(st, B, label, patches):
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    saved = {k: getattr(cb, k) for k in patches}
    for k, v in patches.items():
        setattr(cb, k, v)
    try:
        params = mk_params(g, np.random.default_rng(0))
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((B, H, W, C))
            .astype(np.float32)).astype(jnp.bfloat16)

        def fwd(xx, pp):
            return cb._fused_block_fwd(
                xx, pp, None, H=H, W=W, C=C, heads=heads, split=split,
                last_stage=last, scale=32 ** -0.5, qkv_bias=True
            ).astype(xx.dtype) + xx * 1e-6

        t = chain_time(fwd, (x, params))
        print(f"stage {st} B={B} {label:24s}: {t*1000:8.3f} ms", flush=True)
    finally:
        for k, v in saved.items():
            setattr(cb, k, v)


def main(stages, B=128):
    attn_id = lambda q, k, v, heads, scale: v
    lepe_zero = lambda vw, lk, lb, swap=False: jnp.zeros(vw.shape, jnp.float32)

    def attn_dots_only(q, k, v, heads, scale):
        # per-head narrow dots, no softmax (isolates softmax + HB tiling)
        n, L, C = q.shape
        d = C // heads
        outs = []
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            s = jax.lax.dot_general(q[:, :, sl] * scale, k[:, :, sl],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            p = (s * (1.0 / L)).astype(q.dtype)
            outs.append(jax.lax.dot_general(p, v[:, :, sl],
                                            (((2,), (1,)), ((0,), (0,))),
                                            preferred_element_type=jnp.float32))
        out = outs[0] if heads == 1 else jnp.concatenate(outs, -1)
        return out.astype(q.dtype)

    def hb_no_softmax(q, k, v, heads, scale):
        # full HB path (tiling + wide dots) but softmax -> scale (isolates
        # the per-segment softmax loop)
        saved = cb._hb_softmax
        cb._hb_softmax = lambda s, gh, S: (s * (1.0 / s.shape[-1]))
        try:
            return cb._attn_auto(q, k, v, heads, scale)
        finally:
            cb._hb_softmax = saved

    for st in stages:
        time_variant(st, B, "full", {})
        time_variant(st, B, "attn=identity", {"_attn_auto": attn_id})
        time_variant(st, B, "lepe=zero", {"_lepe_windows": lepe_zero})
        time_variant(st, B, "attn=id+lepe=0",
                     {"_attn_auto": attn_id, "_lepe_windows": lepe_zero})
        time_variant(st, B, "attn=narrow-nosoftmax",
                     {"_attn_auto": attn_dots_only})
        time_variant(st, B, "attn=hb-nosoftmax",
                     {"_attn_auto": hb_no_softmax})


if __name__ == "__main__":
    stages = [int(a) for a in sys.argv[1:]] or [3]
    main(stages)
