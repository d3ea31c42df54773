"""Weight initializers matching the reference's effective init scheme.

The reference initializes Linear weights with timm trunc_normal(std=0.02) and
zero bias, LayerNorm to (1, 0) (``networks/cswin_unet.py:444-451``), and —
because ``_init_weights`` does not touch ``nn.Conv2d`` — leaves convolutions
at the PyTorch default (kaiming_uniform(a=√5) kernel and U(±1/√fan_in) bias,
i.e. both U(-1/√fan_in, 1/√fan_in)).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn import initializers


def trunc_normal(std: float = 0.02):
    return initializers.truncated_normal(stddev=std)


# PyTorch Conv2d default kernel init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with
# fan_in = (in_channels / groups) * prod(kernel_size). variance_scaling with
# scale=1/3, fan_in, uniform yields bound sqrt(3 * (1/3) / fan_in) = fan_in^-0.5.
torch_conv_kernel = initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias(fan_in: int):
    """PyTorch Conv2d default bias init for a conv with the given fan_in."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
