"""On-device euclidean distance transform + HD95/Dice volume metrics.

Device twin of ``cswin_unet_tpu.metrics`` (itself a medpy-faithful
re-implementation of the reference's ``utils.py:48-58``): boundary voxels
are ``mask ^ binary_erosion(mask)`` with the cross structuring element and
zero border (scipy semantics), HD95 is the 95th ``np.percentile`` (linear
interpolation) of the CONCATENATED directed surface-distance arrays, and
the edge rules are calculate_metric_percase's (pred>0 & gt==0 -> (1, 0);
pred empty -> (0, 0)).

The exact EDT uses the classic separability of the SQUARED distance: three
1D min-plus passes ``g[i] = min_j (i-j)^2 + f[j]``, one per axis. Each 1D
pass is a Pallas kernel that materialises the (tile, L, L) interaction
tensor entirely in VMEM — O(L) candidates per output with zero HBM traffic
beyond the stream itself. This removes the last host-side eval cost (the
C++ EDT in ``native/edt.cpp``, already 76x scipy) and with it the
device->host volume pull: metrics come back as one (C-1, 2) array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = jnp.float32(1e12)


def _edt_pass_kernel(f_ref, o_ref, *, L):
    """One 1D min-plus pass over the minor axis: rows are independent lines.

    f/o: (T, L) f32. o[t, i] = min_j (i - j)^2 + f[t, j].
    """
    f = f_ref[...]  # (T, L)
    T = f.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (T, L, L), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (T, L, L), 2)
    d = (i - j).astype(jnp.float32)  # Mosaic iota is integer-only
    cost = d * d + f[:, None, :]
    o_ref[...] = jnp.min(cost, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def edt_pass(f, interpret=None):
    """Vectorised exact 1D squared-EDT pass along the LAST axis.

    f: (..., L) f32 — +inf (1e12) at non-seed voxels, seed values elsewhere.
    Returns g with g[..., i] = min_j (i-j)^2 + f[..., j].
    """
    shape = f.shape
    L = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    if interpret is None:
        # Pallas TPU lowering has no CPU backend; interpret mode is the
        # CPU twin (same convention as the other kernels).
        interpret = jax.default_backend() == "cpu"
    f2 = f.reshape(n, L)
    # Tile so the (T, L, L) interaction stays well under VMEM (~4 MB at
    # T=8, L=224 in f32) while keeping enough rows per program.
    # Mosaic requires the sublane block dim divisible by 8; (8, L, L) f32
    # interactions peak at ~8 MB per temporary at L=512 — inside the raised
    # VMEM limit below.
    T = 8
    pad = (-n) % T
    if pad:
        f2 = jnp.concatenate([f2, jnp.full((pad, L), _INF, f2.dtype)], 0)
    rows = f2.shape[0]
    out = pl.pallas_call(
        functools.partial(_edt_pass_kernel, L=L),
        grid=(rows // T,),
        in_specs=[pl.BlockSpec((T, L), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, L), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f2)
    if pad:
        out = out[:n]
    return out.reshape(shape)


def edt_sq(seeds, interpret=None):
    """Exact SQUARED euclidean distance transform to the nearest True seed.

    seeds: (..., D, H, W) bool (or any rank >= 1; passes run over every
    axis). Matches ``scipy.ndimage.distance_transform_edt(~seeds)**2``
    (spacing 1). Voxels with no seed anywhere come back ~1e12.
    """
    f = jnp.where(seeds, jnp.float32(0), _INF)
    nd = f.ndim
    for ax in range(nd - 1, -1, -1):
        if f.shape[ax] == 1:
            continue
        if ax != nd - 1:
            f = jnp.moveaxis(f, ax, -1)
        f = edt_pass(f, interpret=interpret)
        if ax != nd - 1:
            f = jnp.moveaxis(f, -1, ax)
    return f


def boundary(mask):
    """mask ^ binary_erosion(mask) with the cross element and OOB == False
    (scipy ``binary_erosion`` border_value=0 semantics): a True voxel is a
    boundary voxel iff any face neighbour (incl. outside the volume) is
    False."""
    m = mask.astype(bool)
    er = m
    for ax in range(m.ndim):
        if m.shape[ax] == 1:
            # scipy erodes away single-voxel-thick axes entirely (the OOB
            # neighbours are False on both sides).
            er = jnp.zeros_like(er)
            continue
        pad_lo = [(0, 0)] * m.ndim
        pad_lo[ax] = (1, 0)
        pad_hi = [(0, 0)] * m.ndim
        pad_hi[ax] = (0, 1)
        lo = jnp.pad(m, pad_lo)[tuple(
            slice(0, s) if a == ax else slice(None)
            for a, s in enumerate(m.shape))]
        hi = jnp.pad(m, pad_hi)[tuple(
            slice(1, s + 1) if a == ax else slice(None)
            for a, s in enumerate(m.shape))]
        er = er & lo & hi
    return m & ~er


def _percentile95(values, valid):
    """np.percentile(x[valid], 95) with linear interpolation, static shape.

    values/valid flat; invalid entries sort to the back as +inf."""
    x = jnp.where(valid, values, _INF)
    x = jnp.sort(x.ravel())
    m = jnp.sum(valid)
    pos = 0.95 * (m.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[0] - 1)
    # pos < m-1 whenever frac > 0, so lo+1 is a valid element then; clamp
    # to the last valid element for the frac == 0 / m == 1 cases.
    hi = jnp.minimum(lo + 1, jnp.maximum(m - 1, 0))
    frac = pos - lo.astype(jnp.float32)
    return x[lo] * (1.0 - frac) + x[hi] * frac


def hd95_pair(pred, gt, interpret=None):
    """HD95 between two non-empty binary volumes (medpy convention)."""
    pb = boundary(pred)
    gb = boundary(gt)
    d_gt = jnp.sqrt(jnp.maximum(edt_sq(gb, interpret=interpret), 0.0))
    d_pr = jnp.sqrt(jnp.maximum(edt_sq(pb, interpret=interpret), 0.0))
    vals = jnp.concatenate([d_gt.ravel(), d_pr.ravel()])
    valid = jnp.concatenate([pb.ravel(), gb.ravel()])
    return _percentile95(vals, valid)


def dice_pair(pred, gt):
    """Binary Dice; 0 when both masks are empty (metrics.dice_binary)."""
    p = pred.astype(jnp.float32)
    g = gt.astype(jnp.float32)
    inter = jnp.sum(p * g)
    denom = jnp.sum(p) + jnp.sum(g)
    return jnp.where(denom == 0, 0.0, 2.0 * inter / jnp.maximum(denom, 1.0))


def zoom_nearest(x, out_hw):
    """scipy.ndimage.zoom(order=0, grid_mode=False) twin for the LAST TWO
    axes: in_idx = floor(i * (in-1)/(out-1) + 0.5) (spline order-0 nearest
    under scipy's endpoint-aligned coordinate map). Exact-match tested vs
    scipy on integer masks (tests/test_edt.py)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw

    def idx(n_out, n_in):
        if n_out == 1 or n_in == 1:
            return jnp.zeros((n_out,), jnp.int32)
        i = jnp.arange(n_out, dtype=jnp.float32)
        return jnp.clip(jnp.floor(i * ((n_in - 1) / (n_out - 1)) + 0.5)
                        .astype(jnp.int32), 0, n_in - 1)

    x = jnp.take(x, idx(h_out, h_in), axis=-2)
    return jnp.take(x, idx(w_out, w_in), axis=-1)


@functools.partial(jax.jit, static_argnames=("num_classes", "interpret"))
def volume_metrics_device(prediction, label, num_classes, interpret=None):
    """Per-class (dice, hd95) for classes 1..C-1, entirely on device.

    prediction/label: (D, H, W) int arrays. Returns (C-1, 2) f32 with the
    calculate_metric_percase edge rules (reference utils.py:48-58). The
    HD95 EDT runs unconditionally (static graph); the edge rules select
    the output, so empty-mask cases cost the same but return the exact
    reference values.
    """
    outs = []
    for c in range(1, num_classes):
        pred = prediction == c
        gt = label == c
        has_p = jnp.sum(pred) > 0
        has_g = jnp.sum(gt) > 0
        dice = dice_pair(pred, gt)
        hd = hd95_pair(pred, gt, interpret=interpret)
        dice_out = jnp.where(has_p & has_g, dice,
                             jnp.where(has_p & ~has_g, 1.0, 0.0))
        hd_out = jnp.where(has_p & has_g, hd, 0.0)
        outs.append(jnp.stack([dice_out, hd_out]))
    return jnp.stack(outs)
