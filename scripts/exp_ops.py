#!/usr/bin/env python
"""Price individual VPU op classes inside the production fused block by
monkeypatching them with cheaper (wrong-math or lower-precision) twins.

The per-stage time is ~linear in elements/program (~0.19 ns/elem) — VPU
element-pass bound. Candidates, in pass-count order: the A&S 7.1.26 erf
(~20 ops incl. exp, on the 4C-wide MLP hidden), the two f32 LayerNorms
(~8 passes each), the f32<->bf16 casts.

Usage: python scripts/exp_ops.py [stage ...]
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


def erf_id(z):
    return z * 0.25  # wrong math: prices the erf itself


def erf_727(z):
    """A&S 7.1.27: |err| <= 5e-4 (bf16 resolution is 4e-3), NO exp."""
    za = jnp.abs(z)
    s = 1.0 + za * (0.278393 + za * (0.230389 + za * (0.000972
        + za * 0.078108)))
    s2 = s * s
    s4 = s2 * s2
    return jnp.sign(z) * (1.0 - 1.0 / s4)


def ln_cheap(x, scale, bias):
    return (x.astype(jnp.float32) * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)  # wrong math


def time_stage(st):
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    params = mk_params(g, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    kw = dict(H=H, W=W, C=C, heads=heads, split=split, last_stage=last,
              scale=32 ** -0.5, qkv_bias=True)

    def fn(xx, *pp):
        return cb.fused_cswin_block(xx, pp, None, **kw) + xx * 1e-6

    variants = [
        ("full", {}),
        ("erf_free", {"_erf": erf_id}),
        ("erf_727", {"_erf": erf_727}),
        ("ln_free", {"_layernorm": ln_cheap}),
        ("erf727+lnfree", {"_erf": erf_727, "_layernorm": ln_cheap}),
    ]
    base = None
    for name, patches in variants:
        saved = {k: getattr(cb, k) for k in patches}
        for k, v in patches.items():
            setattr(cb, k, v)
        try:
            t = chain_time(fn, (x, *params), ca=10, cb_=40, n=4)
            d = "" if base is None else f"  (vs full {1000*(t-base):+6.3f})"
            print(f"s{st} {name:14s}: {t*1000:8.3f} ms{d}", flush=True)
            if base is None:
                base = t
        except Exception as e:  # noqa: BLE001
            print(f"s{st} {name:14s}: FAIL {str(e)[:140]}", flush=True)
        finally:
            for k, v in saved.items():
                setattr(cb, k, v)


if __name__ == "__main__":
    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4]
    for st in stages:
        time_stage(st)
