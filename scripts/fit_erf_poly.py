#!/usr/bin/env python
"""Fit the divide/exp-free erf polynomial used by the fused block kernels.

erf(x) ~ clip(x, -B, B) * P(t),  t = 2*(x_clip^2)/B^2 - 1,  B = 3.92
(erfc(B) = 3e-8, below f32 resolution — clamping IS the tail).

P is a degree-16 power-basis polynomial on t in [-1, 1], obtained from a
Chebyshev least-squares fit of erf(x)/x; f32 Horner evaluation keeps the
max abs error at 1.67e-7 over the full real line — the same floor as the
Abramowitz-Stegun 7.1.26 formula (1.5e-7) but with ~16 FMAs instead of an
exp + a divide + 5 FMAs (both transcendentals are multi-pass on the VPU).

Regenerates the _ERF_POLY_P constant in ops/pallas/cswin_block.py.
"""

import numpy as np
from math import erf

B = 3.92
DEG = 16


def main():
    xs = np.linspace(1e-9, B, 300001)
    ref = np.array([erf(float(x)) for x in xs])
    t = 2 * (xs ** 2) / (B * B) - 1.0
    c = np.polynomial.chebyshev.chebfit(t, ref / xs, DEG)
    p = np.polynomial.chebyshev.cheb2poly(c)

    tf = t.astype(np.float32)
    acc = np.zeros_like(tf)
    for pk in p[::-1].astype(np.float32):
        acc = acc * tf + pk
    err = np.abs(acc.astype(np.float64) * xs - ref).max()
    print(f"deg={DEG}: f32 Horner max abs err on [0,{B}] = {err:.3e}")
    print(f"tail (clamp) err = {1 - erf(B):.2e}")
    print("_ERF_POLY_P = (")
    for v in p:
        print(f"    {v:.10e},")
    print(")")


if __name__ == "__main__":
    main()
