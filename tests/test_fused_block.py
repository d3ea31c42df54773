"""Fused whole-block Pallas kernel vs the XLA composition (exact oracle).

Runs the kernel in interpret mode on CPU across all four stage-geometry
shapes (both stripe orientations, sp == 1 and sp > 1, last-stage full
window) and at G > 1 images-per-program — the layouts the TPU kernel
actually compiles for the tiny/224 and base/384 models.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_unet_tpu.ops.pallas.cswin_block import (
    _fused_block_fwd,
    composed_block,
)


@pytest.fixture(autouse=True)
def _reset_bb_mode():
    yield
    import cswin_unet_tpu.ops.pallas.cswin_block as cbm

    if cbm._BB_MODE != "auto":
        cbm._BB_MODE = "auto"
        cbm._fused_block_bwd_xt.clear_cache()
        cbm._fused_block_fwd.clear_cache()


def _params(rng, C, cb):
    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    return (
        mk(C, s=0.3) + 1.0, mk(C),                    # norm1 scale/bias
        mk(C, 3 * C), mk(3 * C),                      # qkv
        mk(3, 3, cb), mk(cb),                         # lepe0
        mk(3, 3, cb), mk(cb),                         # lepe1
        mk(C, C), mk(C),                              # proj
        mk(C, s=0.3) + 1.0, mk(C),                    # norm2
        mk(C, 4 * C), mk(4 * C),                      # fc1
        mk(4 * C, C), mk(C),                          # fc2
    )


GEOMETRIES = [
    # (H, W, C, heads, split, last, g) — mirrors stages 1-4 incl. sp>1 vertical
    (8, 8, 16, 2, 1, False, 1),
    (8, 8, 16, 2, 2, False, 1),   # sp>1: transposed-vertical windowing path
    (8, 8, 32, 4, 4, False, 2),   # G=2 images per program
    (4, 4, 32, 4, 4, True, 2),    # last-stage full window
    # base-384 window patterns (stage resos 96/48/24/12, split 12): wide
    # sp x 2sp stripes and the split == reso full window. C shrunk for
    # interpret-mode speed; the EXACT 384 shapes run compiled on TPU in
    # `bench.py check` (BLOCK_GEOMETRIES).
    (24, 24, 32, 4, 12, False, 1),
    (12, 12, 32, 4, 12, True, 1),
]


@pytest.mark.parametrize("bb", ["on", "off"])
@pytest.mark.parametrize("use_xt", [True, False, "fold", "vh"])
@pytest.mark.parametrize("H,W,C,heads,split,last,g", GEOMETRIES)
def test_fused_block_matches_composed(H, W, C, heads, split, last, g, use_xt,
                                      bb):
    import cswin_unet_tpu.ops.pallas.cswin_block as cbm

    rng = np.random.default_rng(42)
    cb = C if last else C // 2
    params = _params(rng, C, cb)
    B = 2 * g
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5

    old = cbm._BB_MODE
    cbm._BB_MODE = bb
    try:
        fused = _fused_block_fwd.__wrapped__(
            x, params, None, H=H, W=W, C=C, heads=heads, split=split,
            last_stage=last, scale=scale, qkv_bias=True, g_images=g,
            use_xt=use_xt,
        )
    finally:
        cbm._BB_MODE = old
    ref = composed_block(x, params, H, W, C, heads, split, last, scale, True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("dual", ["bs", "cs"])
@pytest.mark.parametrize("H,W,C,heads,split,g", [
    (8, 8, 16, 2, 1, 1),   # sp_h == 1 row-conv LePE (the stage-1 shape class)
    (8, 8, 32, 4, 2, 2),   # sp_h > 1 flat LePE
])
def test_lepe_dual_stack_modes_match_composed(H, W, C, heads, split, g, dual):
    """Both sides of the dual-LePE stacking route inside the bb path
    (_LEPE_DUAL_MODE): batch-stacked (2n, ..., c) vs channel-stacked
    (n, ..., 2c) — 'auto' only ever picks between these."""
    import cswin_unet_tpu.ops.pallas.cswin_block as cbm

    rng = np.random.default_rng(17)
    params = _params(rng, C, C // 2)
    B = 2 * g
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5
    old = (cbm._BB_MODE, cbm._LEPE_DUAL_MODE)
    cbm._BB_MODE, cbm._LEPE_DUAL_MODE = "on", dual
    try:
        fused = _fused_block_fwd.__wrapped__(
            x, params, None, H=H, W=W, C=C, heads=heads, split=split,
            last_stage=False, scale=scale, qkv_bias=True, g_images=g)
    finally:
        cbm._BB_MODE, cbm._LEPE_DUAL_MODE = old
    ref = composed_block(x, params, H, W, C, heads, split, False, scale, True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,W,C,heads,split,g", [
    (8, 8, 16, 2, 2, 1),
    (8, 8, 32, 4, 4, 2),
])
def test_fused_block_pair_matches_two_composed(H, W, C, heads, split, g):
    """Pair kernel (two blocks per pallas_call) == composing the two blocks.
    Routing keeps it OFF (measured slower on TPU, see _pair_fuse_ok), but
    the kernel stays parity-covered."""
    from cswin_unet_tpu.ops.pallas.cswin_block import _fused_block_pair_fwd

    rng = np.random.default_rng(11)
    p1, p2 = _params(rng, C, C // 2), _params(rng, C, C // 2)
    B = 2 * g
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5
    got = _fused_block_pair_fwd(
        x, p1, p2, H=H, W=W, C=C, heads=heads, split=split, scale=scale,
        qkv_bias=True, g_images=g)
    want = composed_block(
        composed_block(x, p1, H, W, C, heads, split, False, scale, True),
        p2, H, W, C, heads, split, False, scale, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("lepe,sm,erf", [
    ("3d", "div", "as"),      # the pre-routing legacy formulations
    ("2d", "defer", "poly"),  # pinned current defaults (what "auto" routes)
])
@pytest.mark.parametrize("H,W,C,heads,split,last,g", GEOMETRIES)
def test_formulation_modes_match_composed(H, W, C, heads, split, last, g,
                                          lepe, sm, erf):
    """Both sides of every measured formulation routing (2-D flat vs 3-D
    LePE, deferred vs in-place softmax normalization, polynomial vs A&S
    erf) stay parity-covered — 'auto' only ever picks between these."""
    import cswin_unet_tpu.ops.pallas.cswin_block as cbm

    rng = np.random.default_rng(3)
    cb = C if last else C // 2
    params = _params(rng, C, cb)
    B = 2 * g
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5
    old = (cbm._LEPE_MODE, cbm._SM_MODE, cbm._ERF_MODE)
    cbm._LEPE_MODE, cbm._SM_MODE, cbm._ERF_MODE = lepe, sm, erf
    try:
        fused = _fused_block_fwd.__wrapped__(
            x, params, None, H=H, W=W, C=C, heads=heads, split=split,
            last_stage=last, scale=scale, qkv_bias=True, g_images=g)
    finally:
        cbm._LEPE_MODE, cbm._SM_MODE, cbm._ERF_MODE = old
    ref = composed_block(x, params, H, W, C, heads, split, last, scale, True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_block_bf16_close():
    """bf16 activations: fused and composed agree to bf16 resolution."""
    H, W, C, heads, split = 8, 8, 16, 2, 2
    rng = np.random.default_rng(7)
    params = _params(rng, C, C // 2)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    scale = (C // heads) ** -0.5
    fused = _fused_block_fwd(
        x, params, H=H, W=W, C=C, heads=heads, split=split, last_stage=False,
        scale=scale, qkv_bias=True, g_images=1,
    )
    ref = composed_block(x, params, H, W, C, heads, split, False, scale, True)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32),
        rtol=0.06, atol=0.06,
    )


def test_fused_block_droppath_matches_composed():
    """Training path: fused forward with drop-path masks == composed with the
    same masks, and gradients flow through the custom_vjp."""
    from cswin_unet_tpu.ops.pallas.cswin_block import fused_cswin_block

    H, W, C, heads, split = 8, 8, 16, 2, 2
    rng = np.random.default_rng(3)
    params = _params(rng, C, C // 2)
    B = 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5
    dps = (
        jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32) * 2.0),
        jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32) * 2.0),
    )

    fused = fused_cswin_block(x, params, dps, H, W, C, heads, split, False,
                              scale, True)
    ref = composed_block(x, params, H, W, C, heads, split, False, scale, True,
                         dps=dps)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        return jnp.sum(
            fused_cswin_block(x, p, dps, H, W, C, heads, split, False, scale,
                              True) ** 2)

    def loss_ref(x, p):
        return jnp.sum(
            composed_block(x, p, H, W, C, heads, split, False, scale, True,
                           dps=dps) ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(gp_f, gp_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_model_training_uses_fused_kernel():
    """CSWinBlock with attn_impl='fused' trains through the fused kernel
    (drop-path masks live) and produces finite grads."""
    from cswin_unet_tpu.models.cswin_unet import CSWinBlock

    m = CSWinBlock(dim=16, reso=(8, 8), num_heads=2, split_size=2,
                   drop_path=0.3, deterministic=False, attn_impl="fused")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8, 8, 16)),
                    jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x)

    def loss(p):
        y = m.apply(p, x, rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
    # stochasticity: two rngs give different outputs
    y1 = m.apply(params, x, rngs={"dropout": jax.random.PRNGKey(3)})
    y2 = m.apply(params, x, rngs={"dropout": jax.random.PRNGKey(4)})
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


@pytest.mark.parametrize("bb", ["on", "off"])
def test_fused_bwd_kernel_matches_composed(bb):
    """reso >= 28 routes the custom_vjp to the hand-written fused backward
    kernel (_fused_block_bwd_xt) — grads must match the composed oracle
    (in both branch-batch modes; _BB_MODE is trace-time so the jit cache
    must be cleared between modes)."""
    import cswin_unet_tpu.ops.pallas.cswin_block as cbm
    from cswin_unet_tpu.ops.pallas.cswin_block import fused_cswin_block

    cbm._BB_MODE = bb
    cbm._fused_block_bwd_xt.clear_cache()
    cbm._fused_block_fwd.clear_cache()

    H, W, C, heads, split = 32, 32, 16, 2, 2
    rng = np.random.default_rng(11)
    params = _params(rng, C, C // 2)
    B = 2
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5
    dps = (
        jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32) * 2.0),
        jnp.asarray(rng.integers(0, 2, (B, 1)).astype(np.float32) * 2.0),
    )

    def loss_fused(x, p):
        return jnp.sum(
            fused_cswin_block(x, p, dps, H, W, C, heads, split, False, scale,
                              True) ** 2)

    def loss_ref(x, p):
        return jnp.sum(
            composed_block(x, p, H, W, C, heads, split, False, scale, True,
                           dps=dps) ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(gp_f, gp_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_bwd_kernel_no_droppath():
    """Deterministic-mask-free path through the fused backward kernel."""
    from cswin_unet_tpu.ops.pallas.cswin_block import fused_cswin_block

    H, W, C, heads, split = 32, 32, 16, 2, 1
    rng = np.random.default_rng(12)
    params = _params(rng, C, C // 2)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5

    def loss_fused(x, p):
        return jnp.sum(
            fused_cswin_block(x, p, None, H, W, C, heads, split, False, scale,
                              True) ** 2)

    def loss_ref(x, p):
        return jnp.sum(
            composed_block(x, p, H, W, C, heads, split, False, scale,
                           True) ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(gp_f, gp_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["mm", "shift"])
@pytest.mark.parametrize("H,W,C,heads,split,last,g", GEOMETRIES)
def test_lepe_mm_modes_match_composed(H, W, C, heads, split, last, g, mode):
    """Both sides of the MXU-LePE routing (_LEPE_MM_MODE): the post-dot-
    weight small-dots form (mm — the round-3 pre-weighted big-dot form
    crashed the XLA:TPU compiler, scripts/exp_mm_bisect{,2}.py) and the
    shift form must both match the composition at every geometry —
    'auto' picks per geometry on in-situ measurements."""
    import cswin_unet_tpu.ops.pallas.cswin_block as cbm

    rng = np.random.default_rng(7)
    cb = C if last else C // 2
    params = _params(rng, C, cb)
    x = jnp.asarray(rng.standard_normal((2 * g, H, W, C)).astype(np.float32))
    scale = (C // heads) ** -0.5
    old = cbm._LEPE_MM_MODE
    cbm._LEPE_MM_MODE = mode
    try:
        fused = _fused_block_fwd.__wrapped__(
            x, params, None, H=H, W=W, C=C, heads=heads, split=split,
            last_stage=last, scale=scale, qkv_bias=True, g_images=g)
    finally:
        cbm._LEPE_MM_MODE = old
    ref = composed_block(x, params, H, W, C, heads, split, last, scale, True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n,sph,spw,c", [
    (6, 1, 56, 32), (6, 2, 28, 64), (4, 7, 14, 128), (2, 7, 7, 64)])
def test_lepe_mm_bwd_matches_vjp_oracle(n, sph, spw, c):
    """The mm-form LePE backwards (_lepe_windows_bwd_mm / _dual_mm) are
    f32-exact against jax.vjp of the shift-form forward — the analytic
    post-dot-weight trick (Atᵀ @ (da·w) == (Atᵀ @ da)·w) must hold at
    every window geometry, both branches, both swap orders."""
    import cswin_unet_tpu.ops.pallas.cswin_block as cbm

    rng = np.random.default_rng(5)
    vw = jnp.asarray(rng.standard_normal((n, sph, spw, c)), jnp.float32)
    da = jnp.asarray(rng.standard_normal((n, sph, spw, c)), jnp.float32)
    lk = jnp.asarray(rng.standard_normal((3, 3, c)), jnp.float32)
    lb = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    lk1 = jnp.asarray(rng.standard_normal((3, 3, c)), jnp.float32)
    lb1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    for swap in (False, True):
        _, vjp = jax.vjp(
            lambda v, k, b: cbm._lepe_windows_2d(v, k, b, swap=swap),
            vw, lk, lb)
        odv, odk, odb = vjp(da)
        mdv, mdk, mdb = cbm._lepe_windows_bwd_mm(vw, da, lk, swap=swap)
        np.testing.assert_allclose(np.asarray(mdv), np.asarray(odv),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(mdk),
                                   np.asarray(odk).reshape(9, c),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(mdb), np.asarray(odb),
                                   rtol=2e-5, atol=2e-5)
    half = n // 2
    _, vjp = jax.vjp(
        lambda v, k0, b0, k1, b1: cbm._lepe_windows_dual(
            v, k0, b0, k1, b1, half), vw, lk, lb, lk1, lb1)
    oracle = vjp(da)
    got = cbm._lepe_windows_bwd_dual_mm(vw, da, lk, lk1, half)
    want = (oracle[0], oracle[1].reshape(9, c), oracle[2],
            oracle[3].reshape(9, c), oracle[4])
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    fm = cbm._lepe_windows_mm(vw, lk, lb)
    fs = cbm._lepe_windows_2d(vw, lk, lb)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fs),
                               rtol=2e-5, atol=2e-5)
