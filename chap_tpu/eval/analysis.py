"""Confidence/accuracy analysis (rebuild of acc_conf_analysis,
train_ours_2D.py:152-193): per-batch labeled/unlabeled dice + mean confidence
on correct vs. erroneous pixels, appended to an .npy history file.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _avg_dice(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> float:
    scores = []
    for c in range(1, num_classes):
        p, g = pred == c, gt == c
        denom = p.sum() + g.sum()
        scores.append(2.0 * np.logical_and(p, g).sum() / denom if denom else 0.0)
    return float(np.mean(scores))


def acc_conf_analysis(probs: np.ndarray, labels: np.ndarray, labeled_bs: int,
                      filename: str, num_classes: int = 4) -> Dict[str, float]:
    """probs: [B,H,W,C] softmax; labels: [B,H,W]. Appends the 6-metric row
    (lab/unlab dice, correct-pixel conf, error-pixel conf) to `filename`."""
    probs = np.asarray(probs)
    labels = np.asarray(labels)
    conf = probs.max(axis=-1)
    pred = probs.argmax(axis=-1)

    out: Dict[str, float] = {}
    for name, sl in [("lab", slice(None, labeled_bs)), ("unlab", slice(labeled_bs, None))]:
        p, g, cf = pred[sl], labels[sl], conf[sl]
        err = p != g
        corr = ~err
        out[f"{name}_dice"] = _avg_dice(p, g, num_classes)
        out[f"{name}_corr_conf"] = float((cf * corr).sum() / (corr.sum() + 1e-6))
        out[f"{name}_err_conf"] = float((cf * err).sum() / (err.sum() + 1e-6))

    row = np.array(list(out.values()))[None]
    if os.path.exists(filename):
        row = np.vstack([np.load(filename), row])
    np.save(filename, row)
    return out


def save_prediction_nii(prediction: np.ndarray, image: np.ndarray,
                        label: np.ndarray, save_path: str, case: str) -> bool:
    """Write <case>_pred/img/lab.nii.gz like test_3D_util.py:111-124. Gated on
    SimpleITK/nibabel availability (absent from this environment); returns
    whether files were written."""
    try:
        import SimpleITK as sitk  # noqa
    except ImportError:
        try:
            import nibabel as nib
        except ImportError:
            return False
        os.makedirs(save_path, exist_ok=True)
        affine = np.eye(4)
        nib.save(nib.Nifti1Image(prediction.astype(np.uint8), affine),
                 os.path.join(save_path, f"{case}_pred.nii.gz"))
        nib.save(nib.Nifti1Image(image.astype(np.float32), affine),
                 os.path.join(save_path, f"{case}_img.nii.gz"))
        nib.save(nib.Nifti1Image(label.astype(np.uint8), affine),
                 os.path.join(save_path, f"{case}_lab.nii.gz"))
        return True
    os.makedirs(save_path, exist_ok=True)
    sitk.WriteImage(sitk.GetImageFromArray(prediction.astype(np.uint8)),
                    os.path.join(save_path, f"{case}_pred.nii.gz"))
    sitk.WriteImage(sitk.GetImageFromArray(image.astype(np.float32)),
                    os.path.join(save_path, f"{case}_img.nii.gz"))
    sitk.WriteImage(sitk.GetImageFromArray(label.astype(np.uint8)),
                    os.path.join(save_path, f"{case}_lab.nii.gz"))
    return True
