#!/usr/bin/env python
"""Price the h-branch and both LePEs inside the PRODUCTION fused block by
ablation (wrong math, same shapes): full vs skip-h vs no-lepe-h vs
no-lepe-v vs all-off. exp_cum.py showed +0.52 ms (s3) / +0.95 ms (s2) for
the h-branch vs +0.16 for the identically-shaped v-attention; this
separates attention from LePE from scheduling in context.

Usage: python scripts/exp_h.py [stage ...]
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

    def mk_fn(tag):
        # Bypass _fused_block_fwd's own @jax.jit (its cache key ignores the
        # trace-time ablation flags) — jit fresh per variant.
        def fn(xx, *pp, _tag=tag):
            y = cb._fused_block_fwd.__wrapped__(
                xx, pp, None, H=H, W=W, C=C, heads=heads, split=split,
                last_stage=last, scale=32 ** -0.5, qkv_bias=True,
                g_images=None, use_xt=True)
            return y + xx * 1e-6
        return jax.jit(fn)

    variants = [
        ("full", {}),
        ("skip_h", {"_ABLATE_SKIP_H": True}),
        ("no_lepe_h", {"_ABLATE_NO_LEPE_H": True}),
        ("no_lepe_v", {"_ABLATE_NO_LEPE_V": True}),
        ("no_lepe_hv", {"_ABLATE_NO_LEPE_H": True, "_ABLATE_NO_LEPE_V": True}),
        ("min(skip_h+nolepe)", {"_ABLATE_SKIP_H": True,
                                "_ABLATE_NO_LEPE_H": True,
                                "_ABLATE_NO_LEPE_V": True}),
    ]
    base = None
    for name, flags in variants:
        saved = {k: getattr(cb, k) for k in flags}
        for k, v in flags.items():
            setattr(cb, k, v)
        try:
            t = chain_time(mk_fn(name), (x, *params), ca=10, cb_=40, n=4)
            d = "" if base is None else f"  (vs full {1000*(t-base):+6.3f})"
            print(f"s{st} {name:20s}: {t*1000:8.3f} ms{d}", flush=True)
            if base is None:
                base = t
        except Exception as e:  # noqa: BLE001
            print(f"s{st} {name:20s}: FAIL {str(e)[:140]}", flush=True)
        finally:
            for k, v in saved.items():
                setattr(cb, k, v)


if __name__ == "__main__":
    stages = [int(a) for a in sys.argv[1:]] or [2, 3]
    for st in stages:
        time_stage(st)
