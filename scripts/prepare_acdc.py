"""Convert raw ACDC (NIfTI) into the h5 layout chap_tpu's data layer reads.

Produces the SSL-standard layout the reference's list-file enumeration assumes
(test_2D_fully.py:98-101; see chap_tpu/data/datasets.py):
    <out>/train_slices.list, val.list, test.list
    <out>/data/slices/<case>_slice_<i>.h5   'image' [H,W], 'label' [H,W]
    <out>/data/<case>.h5                    'image' [D,H,W], 'label' [D,H,W]

Images are per-volume min-max normalized to [0,1]. Requires nibabel (gated:
absent from the TPU image — run wherever the raw data lives).

Usage:
    python scripts/prepare_acdc.py --raw /path/ACDC/database --out data/ACDC
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

try:
    import h5py
except ImportError:
    sys.exit("h5py required")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--raw", required=True, help="ACDC 'database' dir (training/patientXXX)")
    p.add_argument("--out", required=True)
    p.add_argument("--val_patients", type=int, default=10)
    p.add_argument("--test_patients", type=int, default=20)
    args = p.parse_args()

    try:
        import nibabel as nib
    except ImportError:
        sys.exit("nibabel required to read NIfTI ACDC (pip install nibabel)")

    os.makedirs(os.path.join(args.out, "data", "slices"), exist_ok=True)
    patients = sorted(glob.glob(os.path.join(args.raw, "training", "patient*")))
    if not patients:
        sys.exit(f"no patients under {args.raw}/training")

    # split: last test_patients -> test, previous val_patients -> val
    test_set = set(patients[-args.test_patients:])
    val_set = set(patients[-(args.test_patients + args.val_patients):-args.test_patients])

    train_slices, val_cases, test_cases = [], [], []
    for pdir in patients:
        frames = sorted(glob.glob(os.path.join(pdir, "*_frame*.nii.gz")))
        images = [f for f in frames if "_gt" not in f]
        for img_path in images:
            gt_path = img_path.replace(".nii.gz", "_gt.nii.gz")
            if not os.path.exists(gt_path):
                continue
            case = os.path.basename(img_path).replace(".nii.gz", "")
            image = nib.load(img_path).get_fdata().astype(np.float32)
            label = nib.load(gt_path).get_fdata().astype(np.uint8)
            image = (image - image.min()) / (image.max() - image.min() + 1e-8)
            # to [D,H,W]
            image = np.transpose(image, (2, 0, 1))
            label = np.transpose(label, (2, 0, 1))

            with h5py.File(os.path.join(args.out, "data", f"{case}.h5"), "w") as f:
                f.create_dataset("image", data=image, compression="gzip")
                f.create_dataset("label", data=label, compression="gzip")

            if pdir in test_set:
                test_cases.append(case)
            elif pdir in val_set:
                val_cases.append(case)
            else:
                for i in range(image.shape[0]):
                    sid = f"{case}_slice_{i}"
                    with h5py.File(os.path.join(args.out, "data", "slices",
                                                f"{sid}.h5"), "w") as f:
                        f.create_dataset("image", data=image[i], compression="gzip")
                        f.create_dataset("label", data=label[i], compression="gzip")
                    train_slices.append(sid)

    for name, items in [("train_slices.list", train_slices),
                        ("val.list", val_cases), ("test.list", test_cases)]:
        with open(os.path.join(args.out, name), "w") as f:
            f.write("\n".join(items) + "\n")
    print(f"wrote {len(train_slices)} train slices, {len(val_cases)} val cases, "
          f"{len(test_cases)} test cases to {args.out}")


if __name__ == "__main__":
    main()
