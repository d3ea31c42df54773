"""TPGM projection semantics + constraint optimization."""

import jax
import jax.numpy as jnp
import numpy as np

from cswin_unet_tpu.train.tpgm import TPGMTrainer, init_constraints, project, ratio_stats


def _tiny_params():
    return {
        "dense": {"kernel": np.ones((4, 4), np.float32) * 0.5, "bias": np.zeros(4, np.float32)},
        "output": {"kernel": np.ones((1, 1, 4, 3), np.float32)},
    }


def test_init_constraints_permissive_rules():
    c = init_constraints(_tiny_params())
    # dense/kernel: ||θ|| = 2.0 -> max(3, 4) = 4
    assert abs(float(c["dense/kernel"]) - 4.0) < 1e-5
    # zero bias: max(3, 0) = 3
    assert float(c["dense/bias"]) == 3.0
    # head layer ('output'): ||θ|| = sqrt(12) ≈ 3.46 -> max(10, 17.3) = 17.3
    assert abs(float(c["output/kernel"]) - 5 * np.sqrt(12.0)) < 1e-4


def test_project_interpolates_toward_anchor():
    anchor = _tiny_params()
    params = jax.tree.map(lambda x: x + 1.0, anchor)
    # constraint larger than distance -> ratio 1 -> params unchanged
    big = {k: jnp.asarray(1e3) for k in ("dense/kernel", "dense/bias", "output/kernel")}
    proj, ratios = project(params, anchor, big)
    np.testing.assert_allclose(proj["dense"]["kernel"], params["dense"]["kernel"], rtol=1e-6)
    assert all(float(r) == 1.0 for r in ratios.values())

    # tiny constraint -> clamped at 1e-2 -> pulled nearly to anchor
    small = {k: jnp.asarray(0.0) for k in big}
    proj, ratios = project(params, anchor, small)
    dist = np.abs(proj["dense"]["kernel"] - anchor["dense"]["kernel"]).max()
    assert dist < 0.01
    assert all(0.0 < float(r) < 0.05 for r in ratios.values())


def test_project_halfway():
    anchor = {"w": {"kernel": np.zeros(16, np.float32)}}
    params = {"w": {"kernel": np.full(16, 1.0, np.float32)}}  # ||t|| = 4
    proj, ratios = project(params, anchor, {"w/kernel": jnp.asarray(2.0)})
    # alpha = 2/4 = 0.5
    np.testing.assert_allclose(proj["w"]["kernel"], 0.5, rtol=1e-5)
    assert abs(float(ratios["w/kernel"]) - 0.5) < 1e-6


def test_grads_flow_to_constraints_only():
    anchor = {"w": {"kernel": np.zeros(4, np.float32)}}
    params = {"w": {"kernel": np.full(4, 2.0, np.float32)}}

    def loss(c, p):
        proj, _ = project(p, anchor, c)
        return jnp.sum(proj["w"]["kernel"] ** 2)

    c0 = {"w/kernel": jnp.asarray(1.0)}
    gc = jax.grad(loss, argnums=0)(c0, params)
    gp = jax.grad(loss, argnums=1)(c0, params)
    assert float(jnp.abs(gc["w/kernel"])) > 0
    assert float(jnp.abs(gp["w"]["kernel"]).max()) == 0.0  # stop_gradient


def test_tpgm_trainer_optimizes_and_applies():
    """End-to-end on a linear-probe model: constraints move, apply projects."""
    import flax.linen as nn

    class Seg(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            return nn.Conv(3, (1, 1), name="output")(x)

    model = Seg()
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 8, 8, 1)))
    # pretend fine-tuned params drifted FAR from the anchor — beyond the
    # permissive head init max(10, 5||θ||), so the ratio leaves the
    # hardtanh saturation region and gradients reach the constraints
    drifted = jax.tree.map(lambda x: x + 30.0, params)

    trainer = TPGMTrainer(model, params, proj_lr=0.1, max_iters=10)
    c_before = jax.device_get(trainer.constraints)

    rng = np.random.default_rng(0)
    def batches():
        while True:
            yield {
                "image": rng.normal(size=(2, 8, 8, 1)).astype(np.float32),
                "label": rng.integers(0, 3, size=(2, 8, 8)).astype(np.int32),
            }

    trainer.optimize(drifted, batches(), log=lambda *a: None)
    c_after = jax.device_get(trainer.constraints)
    moved = any(
        abs(float(c_after[k]) - float(c_before[k])) > 1e-6 for k in c_after
    )
    assert moved

    projected = trainer.apply(drifted)
    d_flat = jax.tree.leaves(drifted)
    p_flat = jax.tree.leaves(projected)
    a_flat = jax.tree.leaves(trainer.anchor)
    # projection lies on the segment [anchor, drifted]
    for d, p, a in zip(d_flat, p_flat, a_flat):
        t = np.asarray(d) - np.asarray(a)
        tp = np.asarray(p) - np.asarray(a)
        denom = float((t * t).sum())
        alpha = float((tp * t).sum()) / denom if denom else 0.0
        assert -1e-5 <= alpha <= 1.0 + 1e-5
        np.testing.assert_allclose(tp, alpha * t, atol=1e-5)


def test_ratio_stats():
    assert ratio_stats({}) == (0.0, 0.0, 0.0)
    mn, mx, mean = ratio_stats({"a": jnp.asarray(0.2), "b": jnp.asarray(0.8)})
    assert abs(mn - 0.2) < 1e-6 and abs(mx - 0.8) < 1e-6 and abs(mean - 0.5) < 1e-6


def test_v1_variant_init_and_clip():
    """Legacy TPGM v1 (reference tpgm.py): init c = ||θ−θa||/2, clamp
    (1e-8, n); with that init the projection halves the drift."""
    anchor = {"w": {"kernel": np.zeros(16, np.float32)}}
    params = {"w": {"kernel": np.full(16, 1.0, np.float32)}}  # ||t|| = 4
    c = init_constraints(params, variant="v1", anchor=anchor)
    assert abs(float(c["w/kernel"]) - 2.0) < 1e-6  # 4/2
    proj, ratios = project(params, anchor, c, variant="v1")
    np.testing.assert_allclose(proj["w"]["kernel"], 0.5, rtol=1e-5)
    # v1 clamp has no permissive floor: a tiny constraint stays tiny
    tiny = {"w/kernel": jnp.asarray(1e-6)}
    proj, _ = project(params, anchor, tiny, variant="v1")
    assert np.abs(proj["w"]["kernel"]).max() < 1e-5


def test_v1_mars_rowwise():
    """v1 MARS norms are row-wise -> per-row ratios."""
    anchor = {"w": {"kernel": np.zeros((2, 4), np.float32)}}
    params = {"w": {"kernel": np.stack([np.full(4, 1.0), np.full(4, 2.0)]).astype(np.float32)}}
    # row norms: 4 and 8. c=4 -> ratios 1.0 and 0.5
    proj, _ = project(params, anchor, {"w/kernel": jnp.asarray(4.0)},
                      norm_mode="mars", variant="v1")
    np.testing.assert_allclose(proj["w"]["kernel"][0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(proj["w"]["kernel"][1], 1.0, rtol=1e-5)  # 2*0.5
