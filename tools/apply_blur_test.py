#!/usr/bin/env python
"""Slice-wise gaussian blur of test volumes (.npy.h5), preserving HDF5
attrs/compression/chunking, + sample comparison PNGs.

Equivalent of reference ``apply_blur_test.py`` (σ=1.5, per-slice blur of the
image dataset, labels copied verbatim, attrs/compression preserved).
"""

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cswin_unet_tpu.ops.blur import gaussian_blur_host


def normalize_image(img):
    mn, mx = img.min(), img.max()
    return (img - mn) / (mx - mn) if mx > mn else img


def save_sample(original, blurred, out_path, sigma):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(normalize_image(original), cmap="gray")
    axes[0].set_title("Original")
    axes[1].imshow(normalize_image(blurred), cmap="gray")
    axes[1].set_title(f"Blurred (σ={sigma})")
    for ax in axes:
        ax.axis("off")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", default="./datasets/Synapse/test_vol_h5")
    p.add_argument("--output_dir", default="./datasets/Synapse_blurred/test_vol_h5")
    p.add_argument("--sample_dir", default="./blur_samples_test")
    p.add_argument("--sigma", type=float, default=1.5)
    p.add_argument("--num_samples", type=int, default=10)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(args.sample_dir, exist_ok=True)

    files = sorted(f for f in os.listdir(args.input_dir) if f.endswith(".h5"))
    samples_saved = 0
    for fname in files:
        src = os.path.join(args.input_dir, fname)
        dst = os.path.join(args.output_dir, fname)
        with h5py.File(src, "r") as f_in, h5py.File(dst, "w") as f_out:
            for key in f_in.attrs:
                f_out.attrs[key] = f_in.attrs[key]
            image_key = "image" if "image" in f_in else "images"
            for name in f_in:
                ds = f_in[name]
                data = ds[:]
                if name == image_key:
                    blurred = np.empty_like(data, dtype=np.float32)
                    for i in range(data.shape[0]):
                        blurred[i] = gaussian_blur_host(data[i], args.sigma)
                    if samples_saved < args.num_samples:
                        mid = data.shape[0] // 2
                        save_sample(
                            data[mid], blurred[mid],
                            os.path.join(args.sample_dir, f"{fname}_mid.png"),
                            args.sigma,
                        )
                        samples_saved += 1
                    data = blurred
                f_out.create_dataset(
                    name, data=data,
                    compression=ds.compression, chunks=ds.chunks,
                )
        print(f"blurred {fname}")


if __name__ == "__main__":
    main()
