"""CARAFE content-aware upsampling, XLA-native formulation.

Behavioral spec from the reference ``CARAFE``/``CARAFE4``
(``networks/cswin_unet.py:222-319``): a kernel-prediction module (1x1
compress to C/4, then kxk conv to up²·k² maps, pixel-shuffled and softmaxed
over the k² taps) and a reassembly module (each output pixel is a predicted
k²-tap weighted sum of the source pixel's 3x3 neighborhood).

The reference composes this from ``F.pixel_shuffle`` + two ``Tensor.unfold``
calls + ``F.pad``/``unfold`` — hostile to XLA. Here the identical math is
expressed as reshapes + one einsum:

  * pixel_shuffle(enc, up) followed by per-position unfold collapses to a
    plain reshape of the encoder output to (..., k², up²): PyTorch
    pixel_shuffle reads input channel ``c_out * up² + i * up + j`` for
    shuffled offset (i, j), so the encoder's channel axis already carries
    the (k², up²) layout (k²-major).
  * the pad+unfold neighborhood gathering is 9 static slices of a padded
    array (k=3), which XLA fuses; the tap order is (di, dj) row-major,
    matching torch unfold's (dim2 then dim3) order.

The final ``jnp.einsum`` contracts the k² taps on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def extract_patches_3x3(x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, C, k²) zero-padded neighborhoods.

    Tap order is (di, dj) row-major over the kxk neighborhood, equivalent to
    torch ``unfold(2, k).unfold(3, k)`` (reference cswin_unet.py:253-258).
    """
    k = kernel_size
    p = k // 2
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    taps = [
        xp[:, di : di + H, dj : dj + W, :]
        for di in range(k)
        for dj in range(k)
    ]
    return jnp.stack(taps, axis=-1)


def carafe(
    x: jnp.ndarray,
    down_kernel: jnp.ndarray,
    down_bias: jnp.ndarray,
    encoder_kernel: jnp.ndarray,
    encoder_bias: jnp.ndarray,
    out_kernel: jnp.ndarray,
    out_bias: jnp.ndarray,
    *,
    kernel_size: int = 3,
    up_factor: int = 2,
) -> jnp.ndarray:
    """CARAFE upsample: (B, H, W, C) -> (B, up·H, up·W, C_out).

    down_kernel:    (1, 1, C, C//4)
    encoder_kernel: (k, k, C//4, up²·k²)  — output channel layout (k², up²), k²-major
    out_kernel:     (1, 1, C, C_out)
    """
    B, H, W, C = x.shape
    k2 = kernel_size * kernel_size
    up2 = up_factor * up_factor

    def conv(inp, kern, bias, pad):
        y = lax.conv_general_dilated(
            inp,
            kern.astype(inp.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)

    # Kernel prediction (reference :240-249). Softmax over the k² taps in f32.
    enc = conv(conv(x, down_kernel, down_bias, 0), encoder_kernel, encoder_bias, kernel_size // 2)
    kern = enc.reshape(B, H, W, k2, up2)
    kern = jax.nn.softmax(kern.astype(jnp.float32), axis=3).astype(x.dtype)

    # Content-aware reassembly (reference :253-261).
    patches = extract_patches_3x3(x, kernel_size)  # (B, H, W, C, k²)
    out = jnp.einsum(
        "bhwck,bhwks->bhwcs", patches, kern, preferred_element_type=jnp.float32
    ).astype(x.dtype)

    # pixel_shuffle by up: offset s = i·up + j lands at (h·up + i, w·up + j).
    out = out.reshape(B, H, W, C, up_factor, up_factor)
    out = out.transpose(0, 1, 4, 2, 5, 3)  # (B, H, i, W, j, C)
    out = out.reshape(B, H * up_factor, W * up_factor, C)

    return conv(out, out_kernel, out_bias, 0)
