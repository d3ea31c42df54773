"""End-to-end continual learning: head expansion + KD + surgical + TPGM
master loop on tiny synthetic data (one epoch-scale smoke run)."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_unet_tpu.data import make_synthetic_dataset
from cswin_unet_tpu.models import CSWinUNet, CSwinUnet
from cswin_unet_tpu.train.continual import trainer_continual_surgical_tpgm
from cswin_unet_tpu.utils.checkpoint import expand_classifier, load_checkpoint, flatten, _backbone_of

SMALL = dict(
    img_size=32, embed_dim=16,
    depth=(1, 1, 1, 1), split_size=(1, 2, 2, 1), num_heads=(2, 2, 4, 8),
    drop_path_rate=0.1,
)


@pytest.mark.parametrize("auto_tune,disable_tpgm", [("RGN", False), ("none", True)])
def test_continual_master_loop(tmp_path, auto_tune, disable_tpgm):
    info = make_synthetic_dataset(str(tmp_path / "data"), num_train_slices=12,
                                  num_volumes=1, size=48, num_classes=4, seed=2)

    old_classes, new_classes = 4, 4
    total_classes = old_classes + new_classes - 1  # 7

    old_model = CSwinUnet(backbone=CSWinUNet(num_classes=old_classes, **SMALL))
    old_params = old_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))

    new_model = CSwinUnet(backbone=CSWinUNet(num_classes=total_classes, **SMALL))
    new_params = expand_classifier(old_params, total_classes, seed=0)

    args = types.SimpleNamespace(
        stage=1, dataset="kits23",
        num_classes_old=old_classes, num_classes_new=new_classes,
        num_classes_lits17=3,
        root_path=info["train_dir"], list_dir=info["list_dir"],
        img_size=32, batch_size=4, n_gpu=1, seed=1234,
        base_lr=1e-3, max_epochs=2,
        data_fraction=1.0, kd_temperature=3.0, kd_weight=0.2,
        auto_tune=auto_tune, gradient_batches=2,
        tpgm_norm_mode="l2", tpgm_lr=0.05, tpgm_iters=4,
        tpgm_exclude=[], tpgm_frequency=1, tpgm_start_epoch=0,
        disable_tpgm=disable_tpgm, tpgm_data_fraction=0.5,
    )
    stage_info = (old_classes, new_classes, total_classes, "kits23")
    out_dir = str(tmp_path / f"out_{auto_tune}")
    os.makedirs(out_dir, exist_ok=True)

    msg = trainer_continual_surgical_tpgm(
        args, new_model, new_params, old_model, old_params, out_dir, stage_info
    )
    assert "Finished" in msg

    final = os.path.join(out_dir, "continual_surgical_tpgm_stage1_final.npz")
    assert os.path.exists(final)
    tree, _ = load_checkpoint(final)
    flat = flatten(_backbone_of(tree))
    assert flat["output/kernel"].shape[-1] == total_classes
    assert all(np.isfinite(v).all() for v in flat.values())
