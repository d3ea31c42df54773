"""Pallas CARAFE4+classifier tail vs the XLA-fused oracle (exact math)."""

import jax
import jax.numpy as jnp
import numpy as np

from cswin_unet_tpu.ops.carafe import carafe_with_classifier
from cswin_unet_tpu.ops.pallas.carafe_tail import carafe_tail


def _params(rng, C=16, NC=5, UP=4):
    k = 3
    mk = lambda *s, sc=0.2: jnp.asarray(rng.standard_normal(s).astype(np.float32) * sc)
    return dict(
        down_kernel=mk(1, 1, C, C // 4), down_bias=mk(C // 4),
        encoder_kernel=mk(k, k, C // 4, UP * UP * k * k),
        encoder_bias=mk(UP * UP * k * k),
        out_kernel=mk(1, 1, C, C), out_bias=mk(C),
        cls_kernel=mk(1, 1, C, NC),
    )


def test_tail_matches_oracle_f32():
    rng = np.random.default_rng(0)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    got = carafe_tail(x, p["down_kernel"], p["down_bias"], p["encoder_kernel"],
                      p["encoder_bias"], p["out_kernel"], p["out_bias"],
                      p["cls_kernel"], 4)
    want = carafe_with_classifier(x, **p, kernel_size=3, up_factor=4)
    assert got.shape == (2, 32, 32, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_tail_matches_oracle_bf16():
    rng = np.random.default_rng(1)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32)).astype(
        jnp.bfloat16)
    got = np.asarray(
        carafe_tail(x, p["down_kernel"], p["down_bias"], p["encoder_kernel"],
                    p["encoder_bias"], p["out_kernel"], p["out_bias"],
                    p["cls_kernel"], 4), np.float32)
    want = np.asarray(
        carafe_with_classifier(x, **p, kernel_size=3, up_factor=4), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_tail_nc_composition_matches_standard():
    """The projection-first (NC-channel reassembly) composition — the train
    tail's vjp replay — is the same function as carafe_with_classifier."""
    from cswin_unet_tpu.ops.carafe import carafe_with_classifier_nc

    rng = np.random.default_rng(7)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    got = carafe_with_classifier_nc(x, **p, kernel_size=3, up_factor=4)
    want = carafe_with_classifier(x, **p, kernel_size=3, up_factor=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


import pytest


@pytest.mark.parametrize("mode", ["autodiff", "nc", "manual"])
def test_tail_gradients_match_oracle(mode):
    """Every tail-backward formulation the _TAIL_BWD_MODE route can select
    (the production autodiff-C replay and the two measured-negative
    alternatives) produces the composed oracle's gradients."""
    import cswin_unet_tpu.ops.pallas.carafe_tail as ct

    rng = np.random.default_rng(2)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    args = (x, p["down_kernel"], p["down_bias"], p["encoder_kernel"],
            p["encoder_bias"], p["out_kernel"], p["out_bias"], p["cls_kernel"])

    old = ct._TAIL_BWD_MODE
    ct._TAIL_BWD_MODE = mode
    try:
        g_fused = jax.grad(lambda *a: jnp.sum(carafe_tail(*a, 4) ** 2),
                           argnums=tuple(range(8)))(*args)
    finally:
        ct._TAIL_BWD_MODE = old
    g_ref = jax.grad(
        lambda *a: jnp.sum(carafe_with_classifier(*a, kernel_size=3,
                                                  up_factor=4) ** 2),
        argnums=tuple(range(8)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

def test_carafe_up_matches_fast_f32():
    """The classifier-free fused upsampler == the XLA 'fast' composition."""
    from cswin_unet_tpu.ops.carafe import carafe
    from cswin_unet_tpu.ops.pallas.carafe_tail import carafe_up

    rng = np.random.default_rng(3)
    C, C_out = 16, 8
    mk = lambda *s, sc=0.2: jnp.asarray(rng.standard_normal(s).astype(np.float32) * sc)
    dk, db = mk(1, 1, C, C // 4), mk(C // 4)
    ek, eb = mk(3, 3, C // 4, 4 * 9), mk(4 * 9)
    ok, ob = mk(1, 1, C, C_out), mk(C_out)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)).astype(np.float32))

    got = carafe_up(x, dk, db, ek, eb, ok, ob, 2)
    want = carafe(x, dk, db, ek, eb, ok, ob, kernel_size=3, up_factor=2,
                  impl="fast")
    assert got.shape == (2, 16, 16, C_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    g_fused = jax.grad(lambda *a: jnp.sum(carafe_up(*a, 2) ** 2),
                       argnums=tuple(range(7)))(x, dk, db, ek, eb, ok, ob)
    g_ref = jax.grad(
        lambda *a: jnp.sum(carafe(*a, kernel_size=3, up_factor=2,
                                  impl="fast") ** 2),
        argnums=tuple(range(7)))(x, dk, db, ek, eb, ok, ob)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_tail_argmax_matches_oracle_labels():
    """Fused argmax tail == argmax over the oracle's logits (softmax is
    monotone, so this is the reference softmax->argmax, utils.py:74)."""
    from cswin_unet_tpu.ops.pallas.carafe_tail import carafe_tail_argmax_pallas

    rng = np.random.default_rng(3)
    p = _params(rng)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    got = carafe_tail_argmax_pallas(
        x, p["down_kernel"], p["down_bias"], p["encoder_kernel"],
        p["encoder_bias"], p["out_kernel"], p["out_bias"], p["cls_kernel"],
        up_factor=4)
    want = jnp.argmax(
        carafe_with_classifier(x, **p, kernel_size=3, up_factor=4), axis=-1)
    assert got.shape == (2, 32, 32) and got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_model_labels_emit_matches_logits_argmax():
    """model(emit='labels') == argmax(model(emit='logits')) for both attn
    impls (the eval forward's fused path vs the composed fallback)."""
    import pytest
    from cswin_unet_tpu.models import CSWinUNet, CSwinUnet

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
    for impl in ("fused", "xla"):
        m = CSwinUnet(backbone=CSWinUNet(
            img_size=32, num_classes=5, embed_dim=16, depth=(1, 1, 1, 1),
            split_size=(1, 2, 2, 1), num_heads=(2, 2, 4, 8),
            drop_path_rate=0.0, attn_impl=impl))
        params = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(params, x, deterministic=True)
        labels = m.apply(params, x, deterministic=True, emit="labels")
        assert labels.shape == (2, 32, 32) and labels.dtype == jnp.int32
        np.testing.assert_array_equal(
            np.asarray(labels), np.asarray(jnp.argmax(logits, axis=-1)))
