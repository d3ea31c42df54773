"""Legacy surgical fine-tuning: per-group RGN over an (lr, wd) grid.

Reference ``finetune.py:146-254``: 1/5 data subset, loss 0.2·CE + 0.6·...
— exactly 0.2·CE + 0.8·Dice — Adam(weight_decay) whose per-GROUP learning
rates are recomputed every batch as RGN/max over the architectural groups
(stem / encoderN / mergeN / decoderN / upsampleN / concatN / bottleneck /
norm_up / output), grid over (lr, wd) ∈ {1e-3,1e-4,1e-5}×{1e-4}.

The reference rebuilds the torch Adam optimizer every batch (losing moments,
finetune.py:224-239); here the Adam moments live in optax state and the
per-group weights are a pytree argument of the jitted step — set
``rebuild_moments_every_batch=True`` to reproduce the reference's
moment-resetting behavior exactly.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import DataLoader, RandomGenerator, SynapseDataset, device_prefetch
from ..data.datasets import Subset
from ..losses import cross_entropy_loss, dice_loss
from ..parallel import batch_sharding, make_mesh_for_batch, replicated_sharding
from ..utils.checkpoint import save_checkpoint
from ..utils.logging_utils import setup_logging
from .surgical import (
    get_group_lr_weights,
    group_weights_to_param_weights,
    make_grad_fn,
    weight_tree,
)


def make_finetune_step(model, num_classes: int, weight_decay: float):
    """Adam step with per-leaf lr weights (weights × base_lr)."""
    inner = optax.chain(optax.scale_by_adam(), optax.add_decayed_weights(weight_decay))

    def loss_fn(logits, labels):
        l_ce = cross_entropy_loss(logits, labels)
        l_dice = dice_loss(logits, labels, num_classes)
        total = 0.2 * l_ce + 0.8 * l_dice
        return total, {"loss": total, "loss_ce": l_ce, "loss_dice": l_dice}

    def step(params, opt_state, weights, base_lr, image, label, rng):
        def objective(p):
            logits = model.apply(p, image, deterministic=False, rngs={"dropout": rng})
            return loss_fn(logits, label)

        (_, aux), grads = jax.value_and_grad(objective, has_aux=True)(params)
        updates, opt_state = inner.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, w: -base_lr * w * u, updates, weights)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return inner, jax.jit(step, donate_argnums=(0, 1))


def surgical_trainer(args, model, params, snapshot_path: str,
                     *, rebuild_moments_every_batch: bool = True) -> str:
    """Grid fine-tuning loop (reference finetune.py:146-254)."""
    setup_logging(snapshot_path)
    logging.info(str(args))

    lr_wd_grid = [(1e-3, 1e-4), (1e-4, 1e-4), (1e-5, 1e-4)]

    full_db = SynapseDataset(
        base_dir=args.root_path, list_dir=args.list_dir, split="train",
        transform=RandomGenerator(output_size=[args.img_size, args.img_size]),
    )
    dataset_size = len(full_db)
    subset_size = dataset_size // 5
    rng_np = np.random.default_rng(args.seed)
    indices = rng_np.permutation(dataset_size)[:subset_size]
    db_train = Subset(full_db, indices.tolist())
    print(f"Using subset of {len(db_train)} samples (1/5 of original {dataset_size})")

    batch_size = args.batch_size
    trainloader = DataLoader(db_train, batch_size, shuffle=True, seed=args.seed,
                             num_workers=8)

    mesh = make_mesh_for_batch(batch_size)
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    init_params = jax.device_get(params)

    def seg_loss_for_rgn(logits, labels):
        return 0.2 * cross_entropy_loss(logits, labels) + 0.8 * dice_loss(
            logits, labels, args.num_classes
        )

    grad_fn = make_grad_fn(model, seg_loss_for_rgn)

    for lr, wd in lr_wd_grid:
        params = jax.device_put(init_params, rsh)  # fresh clone per grid cell
        inner, step = make_finetune_step(model, args.num_classes, wd)
        opt_state = inner.init(init_params)
        weights_tree = weight_tree(params, {})  # updated below per batch

        iter_num = 0
        for epoch in range(args.max_epochs):
            logging.info(f"Epoch: {epoch}")
            for batch in device_prefetch(iter(trainloader), bsh):
                if args.auto_tune == "RGN":
                    gw = get_group_lr_weights(model, params, batch,
                                              seg_loss_for_rgn, grad_fn=grad_fn)
                    max_w = max(gw.values()) if gw else 1.0
                    pw = group_weights_to_param_weights(
                        params, {k: v / max_w if max_w > 0 else 0.0 for k, v in gw.items()}
                    )
                    weights_tree = weight_tree(params, pw)
                    if iter_num % 50 == 0:
                        for name, w in sorted(gw.items()):
                            logging.info(
                                f"RGN chosen parameters: {name} = {w * lr / max_w}"
                            )
                    if rebuild_moments_every_batch:
                        opt_state = inner.init(jax.device_get(params))
                else:
                    pw = {k: 1.0 for k in group_weights_to_param_weights(params, {})}
                    weights_tree = weight_tree(params, pw)

                rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), iter_num)
                params, opt_state, aux = step(
                    params, opt_state, weights_tree, jnp.asarray(lr, jnp.float32),
                    batch["image"], batch["label"], rng,
                )
                iter_num += 1
                logging.info(f"Loss: {float(aux['loss'])}")

            if epoch % args.save_interval == 0:
                path = os.path.join(snapshot_path, f"model_lr{lr}_wd{wd}_epoch{epoch}.npz")
                save_checkpoint(path, params)
                logging.info(f"saved {path}")

    return "Surgical Training Finished!"
