"""Serving path: VolumeServer one-shot + watch-loop queue semantics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_unet_tpu.models import CSwinUnet, CSWinUNet
from cswin_unet_tpu.serve import VolumeServer, read_volume, watch_loop

SMALL = dict(
    img_size=32,
    num_classes=4,
    embed_dim=16,
    depth=(1, 1, 1, 1),
    split_size=(1, 2, 2, 1),
    num_heads=(2, 2, 4, 8),
)


@pytest.fixture(scope="module")
def server():
    m = CSwinUnet(backbone=CSWinUNet(**SMALL))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    s = VolumeServer(m, params, img_size=32, batch_slices=4)
    assert s.warmup() > 0
    return s


def _write_volume(path, shape=(3, 48, 48), seed=0):
    vol = np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    if path.endswith(".npz"):
        np.savez(path, image=vol)
    elif path.endswith(".h5"):
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset("image", data=vol)
    else:
        np.save(path, vol)
    return vol


def test_read_volume_formats(tmp_path):
    for name in ("a.npz", "b.npy.h5", "c.npy"):
        p = str(tmp_path / name)
        vol = _write_volume(p, seed=1)
        got = read_volume(p)
        np.testing.assert_array_equal(got, vol)


def test_segment_resizes_back(server):
    vol = np.random.default_rng(0).normal(size=(3, 48, 48)).astype(np.float32)
    pred = server.segment(vol)
    assert pred.shape == (3, 48, 48)
    assert pred.dtype == np.int32
    assert pred.min() >= 0 and pred.max() < 4


def test_process_file_writes_nifti_and_stats(server, tmp_path):
    p = str(tmp_path / "case7.npy.h5")
    _write_volume(p)
    stats = server.process_file(p, str(tmp_path / "out"))
    assert stats["case"] == "case7"
    assert stats["slices"] == 3
    assert os.path.exists(stats["output"])
    import gzip

    with gzip.open(stats["output"], "rb") as f:
        header = f.read(348)
    assert header[344:347] == b"n+1"  # NIfTI-1 magic
    assert stats["slices_per_s"] > 0


def test_watch_loop_drains_and_quarantines(server, tmp_path):
    watch = tmp_path / "incoming"
    watch.mkdir()
    _write_volume(str(watch / "good.npz"))
    (watch / "bad.npz").write_bytes(b"not a volume")
    lines = []
    n = watch_loop(server, str(watch), str(tmp_path / "out"),
                   poll_s=0.01, max_volumes=2, emit=lines.append)
    assert n == 2
    assert os.path.exists(watch / "done" / "good.npz")
    assert os.path.exists(watch / "failed" / "bad.npz")
    stats = [json.loads(l) for l in lines]
    assert any("error" in s for s in stats)
    assert any(s.get("case") == "good" for s in stats)


def test_watch_loop_waits_for_slow_writer(server, tmp_path):
    """A volume still being copied in (size growing across polls) must be
    left alone until quiescent, then processed — not quarantined mid-write."""
    import io
    import threading
    import time as _time

    watch = tmp_path / "incoming"
    watch.mkdir()
    buf = io.BytesIO()
    vol = np.random.default_rng(3).normal(size=(3, 48, 48)).astype(np.float32)
    np.savez(buf, image=vol)
    payload = buf.getvalue()
    dest = watch / "slow.npz"

    def writer():
        step = max(1, len(payload) // 4)
        with open(dest, "wb") as f:
            for off in range(0, len(payload), step):
                f.write(payload[off : off + step])
                f.flush()
                os.fsync(f.fileno())
                _time.sleep(0.12)

    t = threading.Thread(target=writer)
    t.start()
    lines = []
    n = watch_loop(server, str(watch), str(tmp_path / "out"),
                   poll_s=0.05, max_volumes=1, emit=lines.append)
    t.join()
    assert n == 1
    assert os.path.exists(watch / "done" / "slow.npz")
    assert not os.path.exists(watch / "failed" / "slow.npz")
    stats = [json.loads(l) for l in lines]
    assert any(s.get("case") == "slow" for s in stats)
    # final line is the latency aggregate (p50/p95 SLO numbers)
    summary = stats[-1]["summary"]
    assert summary["volumes"] == 1 and summary["failed"] == 0
    assert summary["latency_p95_s"] >= summary["segment_p50_s"] > 0


def test_inferencer_data_parallel_bit_equal():
    """Sharded eval over the 8-virtual-device mesh == single-device output."""
    from cswin_unet_tpu.eval.inference import VolumeInferencer

    m = CSwinUnet(backbone=CSWinUNet(**SMALL))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    assert len(jax.devices()) == 8
    single = VolumeInferencer(m, params, patch_size=(32, 32), batch_slices=8,
                              data_parallel=False)
    sharded = VolumeInferencer(m, params, patch_size=(32, 32), batch_slices=8,
                               data_parallel=True)
    slices = np.random.default_rng(5).normal(size=(11, 32, 32)).astype(np.float32)
    np.testing.assert_array_equal(single.predict_slices(slices),
                                  sharded.predict_slices(slices))
