"""Offline tooling: blur parity (device vs scipy), blur scripts, inspectors."""

import os
import subprocess
import sys

import numpy as np
import pytest

from cswin_unet_tpu.data import make_synthetic_dataset
from cswin_unet_tpu.ops.blur import gaussian_blur_2d, gaussian_blur_host

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_device_blur_matches_scipy(rng):
    img = rng.standard_normal((40, 40)).astype(np.float32)
    for sigma in (1.0, 1.5):
        want = gaussian_blur_host(img, sigma)
        got = np.asarray(gaussian_blur_2d(img, sigma))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_device_blur_batched(rng):
    imgs = rng.standard_normal((3, 24, 24)).astype(np.float32)
    got = np.asarray(gaussian_blur_2d(imgs, 1.0))
    for i in range(3):
        np.testing.assert_allclose(got[i], gaussian_blur_host(imgs[i], 1.0),
                                   rtol=1e-4, atol=1e-5)


def _run(script, *argv):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *argv],
        capture_output=True, text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("toolsdata")
    return make_synthetic_dataset(str(root), num_train_slices=4, num_volumes=1,
                                  size=32, depth=3, num_classes=3)


def test_apply_blur_train_script(data, tmp_path):
    out = tmp_path / "blurred"
    lists = tmp_path / "lists"
    _run("apply_blur_train.py",
         "--input_dir", data["train_dir"],
         "--output_dir", str(out),
         "--list_output_dir", str(lists),
         "--sample_dir", str(tmp_path / "samples"),
         "--num_samples", "1")
    blurred = sorted(os.listdir(out))
    assert len(blurred) == 4
    names = open(lists / "train.txt").read().split()
    assert len(names) == 4
    # labels must be untouched, images blurred
    src = np.load(os.path.join(data["train_dir"], blurred[0]))
    dst = np.load(os.path.join(out, blurred[0]))
    np.testing.assert_array_equal(src["label"], dst["label"])
    assert not np.array_equal(src["image"], dst["image"])
    np.testing.assert_allclose(dst["image"], gaussian_blur_host(src["image"], 1.0),
                               rtol=1e-5, atol=1e-6)


def test_apply_blur_test_script(data, tmp_path):
    import h5py

    out = tmp_path / "blurred_vols"
    _run("apply_blur_test.py",
         "--input_dir", data["vol_dir"],
         "--output_dir", str(out),
         "--sample_dir", str(tmp_path / "samples"),
         "--num_samples", "1")
    fname = sorted(os.listdir(out))[0]
    with h5py.File(os.path.join(data["vol_dir"], fname), "r") as f:
        src_img, src_lab = f["image"][:], f["label"][:]
    with h5py.File(os.path.join(out, fname), "r") as f:
        dst_img, dst_lab = f["image"][:], f["label"][:]
    np.testing.assert_array_equal(src_lab, dst_lab)
    np.testing.assert_allclose(dst_img[1], gaussian_blur_host(src_img[1], 1.5),
                               rtol=1e-5, atol=1e-6)


def test_check_labels_script(data, tmp_path):
    report = tmp_path / "report.txt"
    proc = _run("check_labels.py", "--input_dir", data["train_dir"],
                "--report", str(report), "--num_files", "2")
    assert "label histogram" in proc.stdout
    assert report.exists()


def test_inspect_dataset_script(data, tmp_path):
    vol = os.path.join(data["vol_dir"], data["vol_names"][0] + ".npy.h5")
    out = tmp_path / "inspect"
    proc = _run("inspect_dataset.py", "--volume", vol, "--output_dir", str(out))
    assert "unique labels" in proc.stdout
    assert len(list(out.glob("slice_*.png"))) == 3


def test_visualize_blurs_save(data, tmp_path):
    out_png = tmp_path / "cmp.png"
    _run("visualize_blurs.py", "--mode", "test",
         "--orig_dir", data["vol_dir"], "--blur_dir", data["vol_dir"],
         "--name", data["vol_names"][0], "--save", str(out_png))
    assert out_png.exists()
