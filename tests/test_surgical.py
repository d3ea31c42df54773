"""Surgical fine-tuning: gradient metrics, weight normalization, optimizer."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from cswin_unet_tpu.losses import cross_entropy_loss
from cswin_unet_tpu.train.surgical import (
    SurgicalOptimizer,
    cosine_epoch_lr,
    get_lr_weights,
    normalize_weights,
    surgical_layer_names,
    weight_tree,
)


class TwoLayer(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(8, name="fc1")(x)
        x = nn.LayerNorm(name="norm1")(x)
        x = nn.Dense(3, name="fc2")(x)
        return x


def _setup():
    model = TwoLayer()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 2)))
    return model, params


def test_surgical_layer_names_excludes_norms():
    _, params = _setup()
    names = surgical_layer_names(params)
    assert any("fc1" in n for n in names)
    assert not any("norm" in n for n in names)


def test_rgn_weights_positive_and_norm_free():
    model, params = _setup()
    rng = np.random.default_rng(0)
    batches = [
        {
            "image": rng.normal(size=(2, 4, 4, 2)).astype(np.float32),
            "label": rng.integers(0, 3, size=(2, 4, 4)).astype(np.int32),
        }
        for _ in range(3)
    ]
    w = get_lr_weights(model, params, batches,
                       lambda lo, la: cross_entropy_loss(lo, la), method="RGN")
    assert all(v >= 0 for v in w.values())
    assert not any("norm" in k for k in w)
    assert any(v > 0 for v in w.values())


def test_normalize_rgn_and_eb():
    w = {"a": 2.0, "b": 1.0, "c": 0.5}
    out = normalize_weights(w, "RGN")
    assert out == {"a": 1.0, "b": 0.5, "c": 0.25}
    out = normalize_weights({"a": 0.96, "b": 0.5}, "eb-criterion")
    assert out == {"a": 1.0, "b": 0.0}
    assert normalize_weights({}, "RGN") == {}


def test_cosine_epoch_lr_endpoints():
    sched = cosine_epoch_lr(0.1, 10)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert float(sched(10)) < 1e-6
    assert abs(float(sched(5)) - 0.05) < 1e-6


def test_zero_weight_freezes_layer():
    model, params = _setup()
    weights = weight_tree(params, {"params/fc1/kernel": 1.0})  # only fc1 kernel trains
    opt = SurgicalOptimizer(base_lr=0.1, max_epochs=10)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(2, 4, 4, 2)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 3, size=(2, 4, 4)).astype(np.int32))

    def objective(p):
        return cross_entropy_loss(model.apply(p, image), label)

    grads = jax.grad(objective)(params)
    updates, _ = opt.update(grads, opt_state, params, weights, jnp.asarray(0.0))
    new_params = optax.apply_updates(params, updates)

    p0 = params["params"]
    p1 = new_params["params"]
    assert np.abs(np.asarray(p1["fc1"]["kernel"] - p0["fc1"]["kernel"])).max() > 0
    np.testing.assert_array_equal(np.asarray(p1["fc2"]["kernel"]), np.asarray(p0["fc2"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(p1["fc1"]["bias"]), np.asarray(p0["fc1"]["bias"]))


def test_eb_criterion_runs():
    model, params = _setup()
    rng = np.random.default_rng(0)
    batches = [
        {
            "image": rng.normal(size=(4, 4, 4, 2)).astype(np.float32),
            "label": rng.integers(0, 3, size=(4, 4, 4)).astype(np.int32),
        }
    ]
    w = get_lr_weights(model, params, batches,
                       lambda lo, la: cross_entropy_loss(lo, la),
                       method="eb-criterion")
    assert w and all(np.isfinite(v) for v in w.values())
