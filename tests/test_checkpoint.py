"""Checkpoint save/load, torch key mapping, and surgery semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cswin_unet_tpu.models import CSWinUNet, CSwinUnet
from cswin_unet_tpu.utils import checkpoint as ckpt

SMALL = dict(
    img_size=32, num_classes=4, embed_dim=16,
    depth=(1, 1, 1, 1), split_size=(1, 2, 2, 1), num_heads=(2, 2, 4, 8),
)


@pytest.fixture(scope="module")
def params():
    m = CSwinUnet(backbone=CSWinUNet(**SMALL))
    return m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))


def test_flatten_roundtrip(params):
    flat = ckpt.flatten(jax.device_get(params))
    tree = ckpt.unflatten(flat)
    flat2 = ckpt.flatten(tree)
    assert flat.keys() == flat2.keys()
    for k in flat:
        np.testing.assert_array_equal(flat[k], flat2[k])


def test_save_load_roundtrip(params, tmp_path):
    path = str(tmp_path / "model.npz")
    ckpt.save_checkpoint(path, params, extra={"epoch": 7})
    tree, extra = ckpt.load_checkpoint(path)
    assert int(extra["epoch"]) == 7
    f1 = ckpt.flatten(jax.device_get(params))
    f2 = ckpt.flatten(tree)
    assert f1.keys() == f2.keys()
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])


def test_torch_key_mapping_covers_all_params(params):
    """Every param in the model must be reachable from a reference-style
    torch key — guarantees the torch importer has no blind spots."""
    flat = ckpt.flatten(ckpt._backbone_of(jax.device_get(params)))

    # Build a synthetic torch state_dict with reference key names and
    # torch-layout shapes derived from our param shapes.
    torch_state = {}
    for key, val in flat.items():
        tkey, tval = _jax_to_torch_entry(key, val)
        torch_state[tkey] = tval

    mapped = ckpt.torch_to_jax(torch_state)
    missing = set(flat) - set(mapped)
    assert not missing, f"unmapped params: {sorted(missing)[:10]}"
    for k in flat:
        assert mapped[k].shape == flat[k].shape, k
        # roundtrip values: mapping must be layout-exact
        np.testing.assert_array_equal(mapped[k], flat[k])


def _jax_to_torch_entry(key, val):
    """Inverse mapping for test purposes: jax flat key -> (torch key, value)."""
    parts = key.split("/")
    name = "/".join(parts)
    conv_inv = (3, 2, 0, 1)  # HWIO -> OIHW

    if parts[0] == "stage1_conv_embed_conv":
        return (
            "stage1_conv_embed.0." + ("weight" if parts[1] == "kernel" else "bias"),
            val.transpose(conv_inv) if parts[1] == "kernel" else val,
        )
    if parts[0] == "stage1_conv_embed_norm":
        return (
            "stage1_conv_embed.2." + ("weight" if parts[1] == "scale" else "bias"),
            val,
        )
    import re

    m = re.match(r"(stage_up|stage)(\d)_(\d+)", parts[0])
    if m:
        pre, s, i = m.groups()
        tbase = f"{pre}{s}.{i}"
        rest = parts[1:]
        if rest[0] in ("qkv", "proj"):
            wb = "weight" if rest[1] == "kernel" else "bias"
            return f"{tbase}.{rest[0]}.{wb}", (val.T if wb == "weight" else val)
        if rest[0] in ("norm1", "norm2"):
            wb = "weight" if rest[1] == "scale" else "bias"
            return f"{tbase}.{rest[0]}.{wb}", val
        if rest[0] == "mlp":
            wb = "weight" if rest[2] == "kernel" else "bias"
            return f"{tbase}.mlp.{rest[1]}.{wb}", (val.T if wb == "weight" else val)
        if rest[0].startswith("attns_"):
            j = rest[0].split("_")[1]
            if rest[1] == "get_v_kernel":
                return f"{tbase}.attns.{j}.get_v.weight", val.transpose(conv_inv)
            return f"{tbase}.attns.{j}.get_v.bias", val
    m = re.match(r"merge(\d)", parts[0])
    if m:
        if parts[1] == "conv":
            wb = "weight" if parts[2] == "kernel" else "bias"
            return f"{parts[0]}.conv.{wb}", (val.transpose(conv_inv) if wb == "weight" else val)
        wb = "weight" if parts[2] == "scale" else "bias"
        return f"{parts[0]}.norm.{wb}", val
    m = re.match(r"upsample(\d)", parts[0])
    if m:
        mod, kind = parts[1].rsplit("_", 1)
        if kind == "kernel":
            return f"{parts[0]}.{mod}.weight", val.transpose(conv_inv)
        return f"{parts[0]}.{mod}.bias", val
    m = re.match(r"concat_linear(\d)", parts[0])
    if m:
        wb = "weight" if parts[1] == "kernel" else "bias"
        return f"{parts[0]}.{wb}", (val.T if wb == "weight" else val)
    if parts[0] in ("norm", "norm_up"):
        wb = "weight" if parts[1] == "scale" else "bias"
        return f"{parts[0]}.{wb}", val
    if parts[0] == "output":
        return "output.weight", val.transpose(conv_inv)
    raise AssertionError(f"no inverse mapping for {name}")


def test_mirror_encoder_to_decoder():
    flat = {
        "stage1_0/qkv/kernel": np.ones((4, 12)),
        "stage_up2_0/qkv/kernel": np.zeros((4, 12)),
        "merge1/conv/kernel": np.ones((3, 3, 4, 8)),
        "stage1_conv_embed_conv/kernel": np.ones((7, 7, 3, 4)),
    }
    out = ckpt.mirror_encoder_to_decoder(flat)
    assert "stage_up1_0/qkv/kernel" in out            # mirrored
    np.testing.assert_array_equal(out["stage_up1_0/qkv/kernel"], flat["stage1_0/qkv/kernel"])
    np.testing.assert_array_equal(out["stage_up2_0/qkv/kernel"], 0)  # existing not clobbered
    assert "stage_up1_conv_embed_conv/kernel" not in out  # stem excluded


def test_merge_matching_drops_mismatches(capsys):
    tpl = {"a": np.zeros((2, 2)), "b": np.zeros(3)}
    inc = {"a": np.ones((2, 2)), "b": np.ones(4), "c": np.ones(1)}
    out = ckpt.merge_matching(tpl, inc)
    np.testing.assert_array_equal(out["a"], 1)
    np.testing.assert_array_equal(out["b"], 0)  # shape mismatch dropped


def test_expand_classifier(params):
    new = ckpt.expand_classifier(params, 7, seed=0)
    old_flat = ckpt.flatten(ckpt._backbone_of(jax.device_get(params)))
    new_flat = ckpt.flatten(ckpt._backbone_of(new))
    ok, nk = old_flat["output/kernel"], new_flat["output/kernel"]
    assert nk.shape[-1] == 7 and ok.shape[-1] == 4
    np.testing.assert_array_equal(nk[..., :4], ok)
    assert np.abs(nk[..., 4:]).max() > 0  # new rows initialized


def test_load_from_pretrained_npz(params, tmp_path):
    path = str(tmp_path / "pre.npz")
    # pretrained = params with all-ones qkv in encoder stage2
    tree = jax.device_get(params)
    flat = ckpt.flatten(tree)
    key = "params/backbone/stage2_0/qkv/kernel"
    flat[key] = np.ones_like(flat[key])
    # decoder stage_up2_0 absent from checkpoint -> must be mirrored
    del flat["params/backbone/stage_up2_0/qkv/kernel"]
    ckpt.save_checkpoint(path, ckpt.unflatten(flat))

    out = ckpt.load_from_pretrained(params, path, log=lambda *a: None)
    out_flat = ckpt.flatten(ckpt._backbone_of(out))
    np.testing.assert_array_equal(out_flat["stage2_0/qkv/kernel"], 1)
    np.testing.assert_array_equal(out_flat["stage_up2_0/qkv/kernel"], 1)


def test_find_checkpoint_and_detect_classes(params, tmp_path):
    p = str(tmp_path / "run" / "stage1_final.npz")
    ckpt.save_checkpoint(p, params)
    found = ckpt.find_checkpoint(str(tmp_path / "run"))
    assert found.endswith("stage1_final.npz")
    assert ckpt.detect_num_classes(found) == 4


def test_torch_pth_import_end_to_end(params, tmp_path):
    """torch.save a reference-shaped state_dict (cswin_unet. prefix, torch
    layouts, encoder-only) and run the full load_from surgery on it."""
    import torch

    flat = ckpt.flatten(ckpt._backbone_of(jax.device_get(params)))
    state = {}
    for key, val in flat.items():
        if key.startswith("stage_up"):
            continue  # encoder-only checkpoint: decoder must get mirrored
        tkey, tval = _jax_to_torch_entry(key, np.asarray(val))
        state["cswin_unet." + tkey] = torch.from_numpy(np.ascontiguousarray(tval + 1.0))
    path = str(tmp_path / "reference.pth")
    torch.save({"state_dict": state}, path)

    out = ckpt.load_from_pretrained(params, path, log=lambda *a: None)
    out_flat = ckpt.flatten(ckpt._backbone_of(out))
    # encoder weights loaded (+1 marker)
    np.testing.assert_allclose(
        out_flat["stage2_0/qkv/kernel"], flat["stage2_0/qkv/kernel"] + 1.0, rtol=1e-6
    )
    # decoder mirrored from encoder
    np.testing.assert_allclose(
        out_flat["stage_up2_0/qkv/kernel"], flat["stage2_0/qkv/kernel"] + 1.0, rtol=1e-6
    )
    # stem loaded with layout conversion
    np.testing.assert_allclose(
        out_flat["stage1_conv_embed_conv/kernel"],
        flat["stage1_conv_embed_conv/kernel"] + 1.0, rtol=1e-6,
    )
