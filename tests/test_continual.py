"""Continual-learning components: label mapping, sampling, class weights,
loss composition, head expansion integration."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from cswin_unet_tpu.data import DataLoader, make_synthetic_dataset, SynapseDataset, RandomGenerator
from cswin_unet_tpu.train.continual import (
    PositiveSamplingDataset,
    calculate_extreme_class_weights,
    get_stage_info,
    make_continual_loss,
    map_new_dataset_labels,
)


def test_stage_info():
    a = types.SimpleNamespace(stage=1, num_classes_old=9, num_classes_new=4,
                              num_classes_lits17=3, dataset="kits23")
    assert get_stage_info(a) == (9, 4, 12, "kits23")
    a.stage = 2
    a.num_classes_old = 12
    assert get_stage_info(a) == (12, 3, 14, "lits17")


def test_label_mapping_stage1_and_2():
    labels = np.array([0, 1, 2, 3, 0, 1])
    m1 = map_new_dataset_labels(labels, stage=1, num_classes_old=9)
    np.testing.assert_array_equal(m1, [0, 9, 10, 11, 0, 9])
    m2 = map_new_dataset_labels(np.array([0, 1, 2]), stage=2, num_classes_old=12)
    np.testing.assert_array_equal(m2, [0, 12, 13])
    # jnp path identical
    m1j = map_new_dataset_labels(jnp.asarray(labels), 1, 9)
    np.testing.assert_array_equal(np.asarray(m1j), m1)


def test_positive_sampling_oversamples_foreground(tmp_path):
    info = make_synthetic_dataset(str(tmp_path), num_train_slices=30, num_volumes=1,
                                  size=32, num_classes=4, seed=3)
    ds = SynapseDataset(info["train_dir"], info["list_dir"], "train")
    pos = PositiveSamplingDataset(ds, stage=1, seed=0)
    assert len(pos) == len(ds)
    # classes with at least one slice indexed
    assert len(pos.class_indices[0]) > 0
    # draws must come back as samples
    s = pos.__getitem__(0, np.random.default_rng(0))
    assert "label" in s


def test_class_weights_active_only(tmp_path):
    info = make_synthetic_dataset(str(tmp_path), num_train_slices=12, num_volumes=1,
                                  size=32, num_classes=4, seed=1)
    ds = SynapseDataset(info["train_dir"], info["list_dir"], "train",
                        transform=RandomGenerator([32, 32]))
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    stage_info = (9, 4, 12, "kits23")
    w = calculate_extreme_class_weights(loader, 12, 1, stage_info)
    assert w.shape == (12,)
    assert w[0] <= 0.5  # background cap
    # inactive classes (1..8) must have zero weight
    assert np.all(w[1:9] == 0)
    # active mapped classes 9..11 weighted if present
    assert w[9:].sum() > 0


def test_continual_loss_composition():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    old_logits = jnp.asarray(rng.normal(size=(2, 8, 8, 9)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 12, size=(2, 8, 8)).astype(np.int32))
    loss_fn = make_continual_loss(12, 9, kd_weight=0.2, kd_temperature=3.0,
                                  class_weights=np.ones(12, np.float32))
    total, aux = loss_fn(logits, old_logits, labels)
    want = 0.8 * (0.2 * aux["loss_ce"] + 0.8 * aux["loss_dice"]) + 0.2 * aux["loss_kd"]
    assert abs(float(total) - float(want)) < 1e-6
    assert np.isfinite(float(total))
