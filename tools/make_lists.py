#!/usr/bin/env python
"""Generate train/test_vol list files by scanning a dataset directory.

The reference ships fixed ``lists/*/{train,test_vol}.txt`` files; this tool
regenerates them for any dataset laid out as ``train_npz/*.npz`` +
``test_vol_h5/*.npy.h5`` so new datasets plug into the CLIs without manual
list authoring.
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help="dir containing train_npz/ and/or test_vol_h5/")
    p.add_argument("--list_dir", required=True, help="output dir for the .txt files")
    args = p.parse_args()

    os.makedirs(args.list_dir, exist_ok=True)

    train_dir = os.path.join(args.data_root, "train_npz")
    if os.path.isdir(train_dir):
        names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(train_dir) if f.endswith(".npz")
        )
        with open(os.path.join(args.list_dir, "train.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
        print(f"train.txt: {len(names)} slices")

    vol_dir = os.path.join(args.data_root, "test_vol_h5")
    if os.path.isdir(vol_dir):
        names = sorted(
            f[: -len(".npy.h5")] for f in os.listdir(vol_dir) if f.endswith(".npy.h5")
        )
        with open(os.path.join(args.list_dir, "test_vol.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
        print(f"test_vol.txt: {len(names)} volumes")


if __name__ == "__main__":
    main()
