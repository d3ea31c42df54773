#!/usr/bin/env python
"""Dump every slice of one .h5 volume as image/label PNG pairs + a
unique-label check. Equivalent of reference ``inspect_dataset.py``."""

import argparse
import os

import h5py
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--volume", required=True, help="path to .npy.h5 volume")
    p.add_argument("--output_dir", default="./inspect_out")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.output_dir, exist_ok=True)
    with h5py.File(args.volume, "r") as f:
        image = f["image"][:] if "image" in f else f["images"][:]
        label = f["label"][:] if "label" in f else f["segmentations"][:]

    print(f"volume: image {image.shape} {image.dtype}, label {label.shape}")
    print(f"unique labels: {sorted(np.unique(label).tolist())}")

    for z in range(image.shape[0]):
        fig, axes = plt.subplots(1, 2, figsize=(10, 5))
        axes[0].imshow(image[z], cmap="gray")
        axes[0].set_title(f"slice {z}")
        axes[1].imshow(label[z], cmap="jet", vmin=0, vmax=max(1, label.max()))
        axes[1].set_title(f"labels {sorted(np.unique(label[z]).tolist())}")
        for ax in axes:
            ax.axis("off")
        fig.savefig(os.path.join(args.output_dir, f"slice_{z:03d}.png"),
                    bbox_inches="tight")
        plt.close(fig)
    print(f"wrote {image.shape[0]} slice PNGs to {args.output_dir}")


if __name__ == "__main__":
    main()
