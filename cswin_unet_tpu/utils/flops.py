"""FLOPs/params accounting (replaces thop.profile, reference test.py:244-251).

FLOPs come from XLA's own cost analysis of the compiled forward — more honest
than thop's per-module estimate since it reflects the program actually
executed on the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clever_format(value: float) -> str:
    for unit, div in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if value >= div:
            return f"{value / div:.3f}{unit}"
    return f"{value:.3f}"


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def count_flops_and_params(model, params, img_size: int, channels: int = 3):
    x = jnp.zeros((1, img_size, img_size, channels))

    def fwd(p, x):
        return model.apply(p, x)

    compiled = jax.jit(fwd).lower(params, x).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    flops = float(analysis.get("flops", float("nan")))
    return clever_format(flops), clever_format(count_params(params))
