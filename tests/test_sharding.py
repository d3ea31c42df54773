"""Data-parallel semantics: the sharded step must equal the single-device
step bit-for-bit (same batch, same params -> same update)."""

import jax
import jax.numpy as jnp
import numpy as np

from cswin_unet_tpu.models import CSWinUNet, CSwinUnet
from cswin_unet_tpu.parallel import batch_sharding, make_mesh, make_mesh_for_batch, replicated_sharding
from cswin_unet_tpu.train.trainer import make_optimizer, make_train_step

SMALL = dict(
    img_size=32, num_classes=4, embed_dim=16,
    depth=(1, 1, 1, 1), split_size=(1, 2, 2, 1), num_heads=(2, 2, 4, 8),
)


def test_dp_matches_single_device():
    model = CSwinUnet(backbone=CSWinUNet(**SMALL))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    optimizer = make_optimizer(0.05, 100)
    opt_state = optimizer.init(jax.device_get(params))
    step = make_train_step(model, optimizer, num_classes=4)

    rng = np.random.default_rng(0)
    image = rng.normal(size=(8, 32, 32, 1)).astype(np.float32)
    label = rng.integers(0, 4, size=(8, 32, 32)).astype(np.int32)
    key = jax.random.PRNGKey(7)

    # single device
    p1, _, aux1 = step(
        jax.device_get(params), jax.device_get(opt_state),
        jnp.asarray(image), jnp.asarray(label), key,
    )

    # 8-device mesh: batch sharded, params replicated
    mesh = make_mesh()
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    p8, _, aux8 = step(
        jax.device_put(jax.device_get(params), rsh),
        jax.device_put(jax.device_get(opt_state), rsh),
        jax.device_put(image, bsh), jax.device_put(label, bsh), key,
    )

    assert abs(float(aux1["loss"]) - float(aux8["loss"])) < 1e-5
    f1 = jax.tree.leaves(jax.device_get(p1))
    f8 = jax.tree.leaves(jax.device_get(p8))
    for a, b in zip(f1, f8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_mesh_for_batch_divisibility():
    assert make_mesh_for_batch(8).devices.size == 8
    assert make_mesh_for_batch(4).devices.size == 4
    assert make_mesh_for_batch(5).devices.size == 5
    assert make_mesh_for_batch(7).devices.size == 7
    assert make_mesh_for_batch(3).devices.size == 3
    assert make_mesh_for_batch(11).devices.size == 1  # prime > 8
