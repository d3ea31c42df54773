"""Data pipeline: synthetic layout, readers, transforms, loader."""

import numpy as np
import pytest

from cswin_unet_tpu.data import (
    DataLoader,
    RandomGenerator,
    SynapseDataset,
    make_synthetic_dataset,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), num_train_slices=10, num_volumes=2,
                                  size=48, depth=4, num_classes=4)


def test_train_split_reader(synth):
    ds = SynapseDataset(synth["train_dir"], synth["list_dir"], "train")
    assert len(ds) == 10
    s = ds[0]
    assert s["image"].shape == (48, 48)
    assert s["label"].shape == (48, 48)
    assert s["case_name"] == synth["train_names"][0]


def test_vol_split_reader(synth):
    ds = SynapseDataset(synth["vol_dir"], synth["list_dir"], "test_vol")
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (4, 48, 48)
    assert set(np.unique(s["label"])) <= {0, 1, 2, 3}


def test_random_generator_resizes_and_types(synth):
    ds = SynapseDataset(
        synth["train_dir"], synth["list_dir"], "train",
        transform=RandomGenerator([32, 32]),
    )
    rng = np.random.default_rng(0)
    s = ds.__getitem__(0, rng)
    assert s["image"].shape == (32, 32, 1)
    assert s["image"].dtype == np.float32
    assert s["label"].shape == (32, 32)
    assert s["label"].dtype == np.int32


def test_random_generator_deterministic(synth):
    ds = SynapseDataset(
        synth["train_dir"], synth["list_dir"], "train",
        transform=RandomGenerator([32, 32]),
    )
    a = ds.__getitem__(3, np.random.default_rng(7))
    b = ds.__getitem__(3, np.random.default_rng(7))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label"], b["label"])


def test_loader_pads_final_batch(synth):
    ds = SynapseDataset(
        synth["train_dir"], synth["list_dir"], "train",
        transform=RandomGenerator([32, 32]),
    )
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # ceil(10/4)
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 1)
        assert b["label"].shape == (4, 32, 32)
        assert len(b["case_name"]) == 4


def test_loader_epoch_reshuffles(synth):
    ds = SynapseDataset(synth["train_dir"], synth["list_dir"], "train",
                        transform=RandomGenerator([32, 32]))
    loader = DataLoader(ds, batch_size=10, shuffle=True, seed=0, num_workers=2)
    names1 = next(iter(loader))["case_name"]
    names2 = next(iter(loader))["case_name"]
    assert sorted(names1) == sorted(names2)
    assert names1 != names2  # different epoch order (whp for 10 items)


def test_augmentation_branches_cover_rot_flip_and_rotate(synth):
    """Over many seeds both augmentation branches and identity must occur."""
    ds = SynapseDataset(synth["train_dir"], synth["list_dir"], "train")
    base = ds[0]["image"]
    gen = RandomGenerator([48, 48])
    outcomes = set()
    for seed in range(40):
        s = gen({"image": base, "label": base.copy()}, np.random.default_rng(seed))
        img = s["image"][..., 0]
        if np.array_equal(img, base):
            outcomes.add("identity")
        elif any(
            np.array_equal(img, np.flip(np.rot90(base, k), ax))
            for k in range(4)
            for ax in (0, 1)
        ):
            outcomes.add("rot_flip")
        else:
            outcomes.add("rotate")
    assert outcomes == {"identity", "rot_flip", "rotate"}


class _IdxDataset:
    """Minimal dataset: sample i == {'image': [i]} — for sharding math tests."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        return {"image": np.array([i], np.int64)}


def _drain(loader):
    ids = []
    for b in loader:
        ids.extend(int(v) for v in b["image"][:, 0])
    return ids


def test_loader_process_shards_partition_epoch():
    """Multi-host sharding: same-epoch shards are disjoint, cover the
    dataset, and every shard yields the SAME number of batches."""
    n, bs, shards = 23, 4, 3
    per_shard = []
    for r in range(shards):
        dl = DataLoader(_IdxDataset(n), bs, shuffle=True, seed=5,
                        num_workers=2, num_shards=shards, shard_index=r)
        dl.set_epoch(0)
        per_shard.append(_drain(dl))
    lens = {len(s) for s in per_shard}
    assert lens == {8}  # ceil(ceil(23/3)/4)*4 — lockstep across hosts
    seen = set()
    for s in per_shard:
        seen.update(s)
    assert seen == set(range(n))  # union covers the epoch exactly
    # disjoint before padding: first shard_len entries of each shard
    core = [set(s[: (n + shards - 1) // shards]) for s in per_shard]
    assert sum(len(c) for c in core) >= n


def test_loader_shard_epoch_permutation_consistent():
    """All hosts shuffle the same permutation: shard 0 of a 1-shard loader
    equals the interleave of the 2-shard loaders."""
    n, bs = 12, 3
    full = DataLoader(_IdxDataset(n), bs, shuffle=True, seed=9, num_workers=1)
    full.set_epoch(4)
    order = _drain(full)
    parts = []
    for r in range(2):
        dl = DataLoader(_IdxDataset(n), bs, shuffle=True, seed=9,
                        num_workers=1, num_shards=2, shard_index=r)
        dl.set_epoch(4)
        parts.append(_drain(dl))
    interleaved = [parts[i % 2][i // 2] for i in range(n)]
    assert interleaved == order


def test_loader_shard_index_validation():
    with pytest.raises(ValueError):
        DataLoader(_IdxDataset(4), 2, num_shards=2, shard_index=2)


def test_multihost_helpers_single_process():
    import jax

    from cswin_unet_tpu.parallel import (
        make_mesh, multihost_barrier, process_shard_info, replicate,
        replicated_sharding,
    )

    assert process_shard_info() == (0, 1)
    multihost_barrier("noop")  # single-process: must be a no-op
    mesh = make_mesh(8)
    rsh = replicated_sharding(mesh)
    tree = {"w": np.arange(6, dtype=np.float32)}
    out = replicate(tree, rsh)
    assert len(out["w"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
