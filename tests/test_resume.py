"""Train-state save/restore (orbax) and trainer resume semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cswin_unet_tpu.utils.checkpoint import restore_train_state, save_train_state


def test_train_state_roundtrip(tmp_path):
    params = {"params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}}
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.1, momentum=0.9))
    opt_state = opt.init(params)

    # take two steps so momentum is nontrivial
    for i in range(2):
        grads = jax.tree.map(lambda x: jnp.ones_like(x) * (i + 1), params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "state")
    save_train_state(path, params, opt_state, step=17)

    params0 = jax.tree.map(jnp.zeros_like, params)
    opt_state0 = opt.init(params0)
    p, s, step = restore_train_state(path, params0, opt_state0)
    assert step == 17
    np.testing.assert_allclose(np.asarray(p["params"]["w"]),
                               np.asarray(params["params"]["w"]))
    # momentum buffers restored exactly
    flat_a = jax.tree.leaves(s)
    flat_b = jax.tree.leaves(opt_state)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
