#!/usr/bin/env python
"""Interactive original-vs-blurred comparison viewer with slice/window
sliders. Equivalent of reference ``visualize_blurs_train.py`` /
``visualize_blurs_test.py`` merged behind --mode.
"""

import argparse
import os

import numpy as np


def load_pair_train(orig_dir, blur_dir, name):
    a = np.load(os.path.join(orig_dir, name + ".npz"))
    b = np.load(os.path.join(blur_dir, name + ".npz"))
    return a["image"][None], b["image"][None]


def load_pair_test(orig_dir, blur_dir, name):
    import h5py

    with h5py.File(os.path.join(orig_dir, f"{name}.npy.h5"), "r") as f:
        a = (f["image"] if "image" in f else f["images"])[:]
    with h5py.File(os.path.join(blur_dir, f"{name}.npy.h5"), "r") as f:
        b = (f["image"] if "image" in f else f["images"])[:]
    return a, b


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "test"], default="test")
    p.add_argument("--orig_dir", required=True)
    p.add_argument("--blur_dir", required=True)
    p.add_argument("--name", required=True, help="case/slice name (no extension)")
    p.add_argument("--save", help="save a static PNG instead of interactive view")
    args = p.parse_args()

    if args.mode == "train":
        orig, blur = load_pair_train(args.orig_dir, args.blur_dir, args.name)
    else:
        orig, blur = load_pair_test(args.orig_dir, args.blur_dir, args.name)

    import matplotlib

    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    z0 = orig.shape[0] // 2
    ims = [
        axes[0].imshow(orig[z0], cmap="gray"),
        axes[1].imshow(blur[z0], cmap="gray"),
        axes[2].imshow(np.abs(orig[z0] - blur[z0]), cmap="hot"),
    ]
    for ax, title in zip(axes, ("Original", "Blurred", "|difference|")):
        ax.set_title(title)
        ax.axis("off")

    if args.save:
        fig.savefig(args.save, bbox_inches="tight")
        print(f"saved {args.save}")
        return

    if orig.shape[0] > 1:
        from matplotlib.widgets import Slider

        ax_slider = fig.add_axes([0.25, 0.02, 0.5, 0.03])
        slider = Slider(ax_slider, "slice", 0, orig.shape[0] - 1, valinit=z0,
                        valstep=1)

        def update(val):
            z = int(slider.val)
            ims[0].set_data(orig[z])
            ims[1].set_data(blur[z])
            ims[2].set_data(np.abs(orig[z] - blur[z]))
            fig.canvas.draw_idle()

        slider.on_changed(update)
    plt.show()


if __name__ == "__main__":
    main()
