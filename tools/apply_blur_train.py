#!/usr/bin/env python
"""Blur every train slice (.npz) into a *_blurred dataset + regenerated
train.txt + sample comparison PNGs.

Equivalent of reference ``apply_blur_train.py`` (σ=1.0 gaussian on images,
labels untouched, compressed npz output, train.txt regeneration, comparison
figures) with the hardcoded paths promoted to CLI flags.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cswin_unet_tpu.ops.blur import gaussian_blur_host


def save_sample_comparison(original, blurred, label, out_path, sigma):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(original, cmap="gray")
    axes[0].set_title("Original")
    axes[1].imshow(blurred, cmap="gray")
    axes[1].set_title(f"Blurred (σ={sigma})")
    axes[2].imshow(label, cmap="jet")
    axes[2].set_title(f"Labels {sorted(np.unique(label).tolist())}")
    for ax in axes:
        ax.axis("off")
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", default="./datasets/Synapse/train_npz")
    p.add_argument("--output_dir", default="./datasets/Synapse_blurred/train_npz")
    p.add_argument("--list_output_dir", default="./lists/lists_Synapse_blurred")
    p.add_argument("--sample_dir", default="./blur_samples_train")
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--num_samples", type=int, default=3)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(args.list_output_dir, exist_ok=True)
    os.makedirs(args.sample_dir, exist_ok=True)

    files = sorted(f for f in os.listdir(args.input_dir) if f.endswith(".npz"))
    processed = []
    samples_saved = 0
    for i, fname in enumerate(files):
        data = np.load(os.path.join(args.input_dir, fname))
        image = data["image"]
        label = data["label"] if "label" in data else data["segmentation"]
        blurred = gaussian_blur_host(image, args.sigma)
        np.savez_compressed(
            os.path.join(args.output_dir, fname),
            image=blurred.astype(np.float32),
            label=label,
        )
        processed.append(os.path.splitext(fname)[0])
        if samples_saved < args.num_samples and len(np.unique(label)) > 1:
            save_sample_comparison(
                image, blurred, label,
                os.path.join(args.sample_dir, f"sample_{samples_saved}.png"),
                args.sigma,
            )
            samples_saved += 1
        if (i + 1) % 200 == 0:
            print(f"{i + 1}/{len(files)} processed")

    list_path = os.path.join(args.list_output_dir, "train.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(processed) + "\n")
    print(f"Successfully wrote {len(processed)} entries to train.txt")


if __name__ == "__main__":
    main()
