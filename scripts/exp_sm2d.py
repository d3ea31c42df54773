#!/usr/bin/env python
"""A/B the 2-D flattened LePE and deferred-division softmax inside the
fused CSWin block on TPU: whole-block chain timings at every production
geometry for (lepe 3d|2d) x (softmax div|defer).

Usage: python scripts/exp_sm2d.py [stage ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import STAGES, mk_params, chain_time

B = 128


def time_stage(sid, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, g["H"], g["W"], g["C"])).astype(np.float32)
        * 0.1).astype(jnp.bfloat16)
    params = tuple(p.astype(jnp.bfloat16) for p in mk_params(g, rng))
    scale = (g["C"] // g["heads"]) ** -0.5

    def fn(xx, *ps):
        return cb._fused_block_fwd.__wrapped__(
            xx, ps, None, H=g["H"], W=g["W"], C=g["C"], heads=g["heads"],
            split=g["split"], last_stage=g["last"], scale=scale,
            qkv_bias=True)

    combos = [
        ("3d", "div", "as"),      # production baseline (pre-change)
        ("2d", "div", "as"),      # lepe axis alone
        ("3d", "defer", "as"),    # softmax axis alone
        ("3d", "div", "poly"),    # erf axis alone
        ("2d", "defer", "poly"),  # all three
    ]
    for lepe, sm, erf in combos:
        cb._LEPE_MODE = lepe
        cb._SM_MODE = sm
        cb._ERF_MODE = erf
        try:
            t = chain_time(fn, (x,) + params, ca=6, cb_=16, n=4)
            print(f"stage {sid}: lepe={lepe} sm={sm:5s} erf={erf:4s}: "
                  f"{t*1000:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"stage {sid}: lepe={lepe} sm={sm:5s} erf={erf:4s}: FAIL "
                  f"{str(e)[:120]}", flush=True)
    cb._LEPE_MODE = "auto"
    cb._SM_MODE = "auto"
    cb._ERF_MODE = "auto"


def main():
    ids = [int(a) for a in sys.argv[1:]] or [3, 2, 1, 4]
    for sid in ids:
        time_stage(sid, STAGES[sid])


if __name__ == "__main__":
    main()
