"""Datasets — rebuild of the missing ``dataloaders.dataset.BaseDataSets``
contract (SURVEY.md §2.4): train split yields per-slice {'image': HxW float,
'label': HxW int}; val split yields full 3D volumes consumed slice-wise by the
2D evaluator (val_2D.py:55-57). Plus 3D case datasets for LA/Pancreas/BraTS
(h5 'image'/'label' volumes listed in a .list file, val_3D.py:91-103), and
deterministic synthetic datasets so the whole pipeline runs without data on
disk (tests, benchmarks, smoke configs).

ACDC on-disk layout (SSL-standard, matching the reference's list-file driven
enumeration, test_2D_fully.py:98-101):
    <root>/train_slices.list            one slice id per line
    <root>/val.list / test.list         one case id per line
    <root>/data/slices/<slice_id>.h5    datasets 'image' [H,W], 'label' [H,W]
    <root>/data/<case_id>.h5            datasets 'image' [D,H,W], 'label' [D,H,W]
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


class AcdcSliceDataset:
    """Train-split slice dataset."""

    def __init__(self, base_dir: str, transform: Optional[Callable] = None,
                 num: Optional[int] = None):
        self.base_dir = base_dir
        self.transform = transform
        with open(os.path.join(base_dir, "train_slices.list")) as f:
            self.slice_ids = [line.strip() for line in f if line.strip()]
        if num is not None:
            self.slice_ids = self.slice_ids[:num]

    def __len__(self) -> int:
        return len(self.slice_ids)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path = os.path.join(self.base_dir, "data", "slices", self.slice_ids[idx] + ".h5")
        with h5py.File(path, "r") as h5f:
            sample = {"image": h5f["image"][:], "label": h5f["label"][:]}
        if self.transform:
            sample = self.transform(sample)
        return sample


class AcdcVolumeDataset:
    """Val/test-split full-volume dataset."""

    def __init__(self, base_dir: str, split: str = "val"):
        self.base_dir = base_dir
        with open(os.path.join(base_dir, f"{split}.list")) as f:
            self.case_ids = [line.strip() for line in f if line.strip()]

    def __len__(self) -> int:
        return len(self.case_ids)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path = os.path.join(self.base_dir, "data", self.case_ids[idx] + ".h5")
        with h5py.File(path, "r") as h5f:
            return {"image": h5f["image"][:], "label": h5f["label"][:],
                    "case": self.case_ids[idx]}


class Volume3dDataset:
    """LA / Pancreas / BraTS case dataset: .list file of h5 volumes
    (val_3D.py:92-95 path scheme <root>/data/<case>.h5)."""

    def __init__(self, base_dir: str, test_list: str = "test.list"):
        self.base_dir = base_dir
        with open(os.path.join(base_dir, test_list)) as f:
            self.case_ids = [line.strip().split(",")[0] for line in f if line.strip()]

    def __len__(self) -> int:
        return len(self.case_ids)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path = os.path.join(self.base_dir, "data", self.case_ids[idx] + ".h5")
        with h5py.File(path, "r") as h5f:
            return {"image": h5f["image"][:], "label": h5f["label"][:],
                    "case": self.case_ids[idx]}


# ---------------------------------------------------------------------------
# Synthetic data: deterministic cardiac-MR-like phantoms. Class layout mimics
# ACDC (background + 3 nested structures) so Dice/HD95 and the semi-supervised
# losses exercise realistic label statistics without data on disk.
# ---------------------------------------------------------------------------

def _phantom_slice(rng: np.random.RandomState, size: int, num_classes: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cx, cy = rng.uniform(0.35, 0.65, 2) * size
    label = np.zeros((size, size), np.int32)
    radii = sorted(rng.uniform(0.08, 0.3, num_classes - 1) * size, reverse=True)
    for cls_offset, r in enumerate(radii):
        ecc = rng.uniform(0.7, 1.3)
        mask = ((xx - cx) ** 2 + ecc * (yy - cy) ** 2) < r ** 2
        label[mask] = cls_offset + 1
    image = label.astype(np.float32) / max(num_classes - 1, 1)
    image = image + rng.normal(0, 0.15, image.shape).astype(np.float32)
    return image, label


class SyntheticSliceDataset:
    """Deterministic per-index phantom slices."""

    def __init__(self, size: int = 256, num_classes: int = 4, length: int = 1312,
                 seed: int = 0, transform: Optional[Callable] = None):
        self.size, self.num_classes, self.length = size, num_classes, length
        self.seed = seed
        self.transform = transform

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        image, label = _phantom_slice(rng, self.size, self.num_classes)
        sample = {"image": image, "label": label}
        if self.transform:
            sample = self.transform(sample)
        return sample


class SyntheticVolumeDataset:
    """Deterministic phantom volumes (val path / 3D sliding-window tests)."""

    def __init__(self, shape: Tuple[int, int, int] = (10, 256, 256),
                 num_classes: int = 4, length: int = 8, seed: int = 1):
        self.shape, self.num_classes, self.length, self.seed = shape, num_classes, length, seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 99991 + idx)
        d = self.shape[0]
        images, labels = [], []
        for _ in range(d):
            img, lab = _phantom_slice(rng, self.shape[1], self.num_classes)
            images.append(img)
            labels.append(lab)
        return {"image": np.stack(images), "label": np.stack(labels),
                "case": f"synthetic_{idx:03d}"}


def build_datasets(cfg, transform: Optional[Callable] = None):
    """(train_slices, val_volumes) per the data config."""
    if cfg.dataset == "synthetic":
        train = SyntheticSliceDataset(cfg.image_size[0], cfg.num_classes,
                                      cfg.synthetic_train_size, transform=transform)
        val = SyntheticVolumeDataset((10, cfg.image_size[0], cfg.image_size[1]),
                                     cfg.num_classes, cfg.synthetic_val_volumes)
        return train, val
    train = AcdcSliceDataset(cfg.root_path, transform=transform)
    val = AcdcVolumeDataset(cfg.root_path, split="val")
    return train, val


def patients_to_slices(dataset: str, patients_num: int) -> int:
    """Labeled-patient -> labeled-slice table (train_ours_2D.py:38-48)."""
    acdc = {3: 68, 7: 136, 14: 256, 21: 396, 28: 512, 35: 664, 140: 1312}
    prostate = {2: 27, 4: 53, 8: 120, 12: 179, 16: 256, 21: 312, 42: 623}
    table = acdc if "ACDC" in dataset or dataset == "synthetic" else prostate
    return table[patients_num]
