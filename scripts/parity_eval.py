"""Metric parity on converted checkpoints (VERDICT round-1 item 4).

Trains the PyTorch REFERENCE models briefly on the shared synthetic phantoms
(real ACDC/LA h5 volumes are not in this environment), converts the torch
checkpoints with chap_tpu.cli.convert_torch, evaluates the SAME volumes through

  torch side:  line-for-line transcriptions of the reference eval loops
               (test_2D_fully.test_single_volume :54-95 with order-0 zooms;
               val_3D.test_single_case :14-79 sliding window)
  chap side:   the converted snapshot through the same code path the eval CLIs
               use (CheckpointManager restore -> eval2d / SlidingWindowEngine)

and writes PARITY_EVAL.md with per-class Dice/HD95 deltas. Pass criterion:
|dice delta| < 0.5 points (0.005), matching BASELINE.md's parity target.

Usage: JAX_PLATFORMS=cpu python scripts/parity_eval.py
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np  # noqa: E402

from ref_loader import import_ref  # noqa: E402

OUT_MD = "PARITY_EVAL.md"
PTH_2D = "/tmp/parity_dd.pth"
PTH_3D = "/tmp/parity_vnet.pth"
SNAP_2D = "/tmp/parity_snap_2d"
SNAP_3D = "/tmp/parity_snap_3d"
IMG = 64            # 2D protocol size (zoom target), phantoms generated at it
N_VOL_2D = 4
PATCH_3D = (112, 112, 80)
STRIDE_XY, STRIDE_Z = 18, 4


# ---------------------------------------------------------------- torch side

def train_torch_2d():
    import torch
    import torch.nn.functional as F
    from chap_tpu.data.datasets import SyntheticSliceDataset

    ref_unet = import_ref("networks.unet")
    torch.manual_seed(0)
    model = ref_unet.DualDecoder(in_chns=1, class_num=4,
                                 args={"decoder_type": "mcnet"})
    ds = SyntheticSliceDataset(IMG, 4, length=512, seed=7)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    model.train()
    rng = np.random.RandomState(0)
    for step in range(300):
        idx = rng.randint(0, len(ds), size=8)
        batch = [ds[int(i)] for i in idx]
        x = torch.from_numpy(np.stack([b["image"] for b in batch])[:, None])
        y = torch.from_numpy(np.stack([b["label"] for b in batch])).long()
        o1, o2 = model(x)
        loss = F.cross_entropy(o1, y) + F.cross_entropy(o2, y)
        opt.zero_grad(); loss.backward(); opt.step()
        if step % 100 == 0:
            print(f"  2D torch fit step {step}: loss {float(loss):.4f}")
    model.eval()
    torch.save(model.state_dict(), PTH_2D)
    return model


def torch_eval_2d(model, volumes):
    """test_2D_fully.test_single_volume transcription (:54-95): per slice
    order-0 zoom -> forward -> logit mean -> argmax -> order-0 zoom back."""
    import torch
    from scipy.ndimage import zoom
    from chap_tpu.metrics.surface import calculate_metric_percase_full

    per_case = []
    with torch.no_grad():
        for sample in volumes:
            image, label = sample["image"], sample["label"]
            prediction = np.zeros_like(label)
            for ind in range(image.shape[0]):
                sl = image[ind]
                x, y = sl.shape
                sl = zoom(sl, (IMG / x, IMG / y), order=0)
                inp = torch.from_numpy(sl[None, None].astype(np.float32))
                o1, o2 = model(inp)
                out = torch.argmax(torch.softmax((o1 + o2) / 2.0, dim=1),
                                   dim=1).squeeze(0).numpy()
                prediction[ind] = zoom(out, (x / IMG, y / IMG), order=0)
            m = np.array([calculate_metric_percase_full(prediction == c, label == c)
                          for c in range(1, 4)])
            per_case.append(m)
    return np.mean(per_case, axis=0)


def train_torch_3d():
    import torch
    import torch.nn.functional as F

    ref_vnet = import_ref("networks.vnet")
    torch.manual_seed(0)
    model = ref_vnet.VNet(n_channels=1, n_classes=2, normalization="batchnorm",
                          has_dropout=False)
    vols = [make_volume_3d(i) for i in range(2)]
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    model.train()
    rng = np.random.RandomState(0)
    for step in range(40):
        img, lab = vols[step % 2]
        # random (64,64,32) crop
        sx = rng.randint(0, img.shape[0] - 64 + 1)
        sy = rng.randint(0, img.shape[1] - 64 + 1)
        sz = rng.randint(0, img.shape[2] - 32 + 1)
        xi = img[sx:sx + 64, sy:sy + 64, sz:sz + 32]
        yi = lab[sx:sx + 64, sy:sy + 64, sz:sz + 32]
        x = torch.from_numpy(xi[None, None].astype(np.float32))
        y = torch.from_numpy(yi[None].astype(np.int64))
        out = model(x)
        loss = F.cross_entropy(out, y)
        opt.zero_grad(); loss.backward(); opt.step()
        if step % 10 == 0:
            print(f"  3D torch fit step {step}: loss {float(loss):.4f}")
    model.eval()
    torch.save(model.state_dict(), PTH_3D)
    return model


def make_volume_3d(idx):
    """Shared deterministic 3D phantom, [W,H,D] = (120,120,84) >= LA patch."""
    from chap_tpu.data.datasets import SyntheticVolumeDataset
    ds = SyntheticVolumeDataset((84, 120, 120), 2, length=2, seed=11)
    s = ds[idx]
    return (np.transpose(s["image"], (2, 1, 0)).astype(np.float32),
            np.transpose(s["label"], (2, 1, 0)).astype(np.int32))


def torch_eval_3d(model, volumes):
    """val_3D.test_single_case transcription (:14-79): pad-to-patch, ceil-div
    grid with min-clamped strides, per-patch softmax accumulation, argmax."""
    import math
    import torch
    from chap_tpu.metrics.surface import cal_metric_3d_full

    per_case = []
    with torch.no_grad():
        for image, label in volumes:
            ww, hh, dd = image.shape
            sx = math.ceil(max(ww - PATCH_3D[0], 0) / STRIDE_XY) + 1
            sy = math.ceil(max(hh - PATCH_3D[1], 0) / STRIDE_XY) + 1
            sz = math.ceil(max(dd - PATCH_3D[2], 0) / STRIDE_Z) + 1
            score = np.zeros((2,) + image.shape, np.float32)
            cnt = np.zeros(image.shape, np.float32)
            for ix in range(sx):
                xs = min(STRIDE_XY * ix, ww - PATCH_3D[0])
                for iy in range(sy):
                    ys = min(STRIDE_XY * iy, hh - PATCH_3D[1])
                    for iz in range(sz):
                        zs = min(STRIDE_Z * iz, dd - PATCH_3D[2])
                        patch = image[xs:xs + PATCH_3D[0], ys:ys + PATCH_3D[1],
                                      zs:zs + PATCH_3D[2]]
                        t = torch.from_numpy(patch[None, None])
                        y = torch.softmax(model(t), dim=1)[0].numpy()
                        score[:, xs:xs + PATCH_3D[0], ys:ys + PATCH_3D[1],
                              zs:zs + PATCH_3D[2]] += y
                        cnt[xs:xs + PATCH_3D[0], ys:ys + PATCH_3D[1],
                            zs:zs + PATCH_3D[2]] += 1
            pred = np.argmax(score / np.maximum(cnt, 1e-8)[None], axis=0)
            per_case.append(cal_metric_3d_full(label == 1, pred == 1))
    return np.mean(per_case, axis=0)


# ----------------------------------------------------------------- chap side

def chap_eval_2d(volumes):
    import jax
    import jax.numpy as jnp
    from chap_tpu.cli.convert_torch import convert
    from chap_tpu.config import Config
    from chap_tpu.eval.eval2d import make_predictor, test_single_volume
    from chap_tpu.metrics import surface  # noqa: F401
    from chap_tpu.models import net_factory
    from chap_tpu.train.state import create_train_state, make_optimizer
    from chap_tpu.utils.checkpoint import CheckpointManager

    convert(PTH_2D, "dualdecoder", SNAP_2D, num_classes=4,
            decoder_type="mcnet")

    cfg = Config()
    model = net_factory("dualdecoder", 1, 4, cfg.model)
    template = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 1)),
        make_optimizer(0.01, 1000), sim_chns=tuple(cfg.model.feature_chns))
    state = CheckpointManager(SNAP_2D).restore("best", template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predictor = make_predictor(model, "logit_ensemble")

    per_case = []
    for sample in volumes:
        m = np.array(test_single_volume(sample["image"], sample["label"],
                                        predictor, variables, 4, (IMG, IMG),
                                        full_metrics=True))
        per_case.append(m)
    return np.mean(per_case, axis=0)


def chap_eval_3d(volumes):
    import jax
    import jax.numpy as jnp
    from chap_tpu.cli.convert_torch import convert
    from chap_tpu.config import Config
    from chap_tpu.eval.sliding_window import SlidingWindowEngine
    from chap_tpu.metrics.surface import cal_metric_3d_full
    from chap_tpu.models import net_factory_3d
    from chap_tpu.train.state import create_train_state, make_optimizer
    from chap_tpu.utils.checkpoint import CheckpointManager

    convert(PTH_3D, "vnet", SNAP_3D, num_classes=2)

    cfg = Config()
    model = net_factory_3d("vnet", 1, 2, mode="test", cfg=cfg.model)
    template = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 16, 1)),
        make_optimizer(0.01, 1000))
    state = CheckpointManager(SNAP_3D).restore("best", template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    engine = SlidingWindowEngine(model, PATCH_3D, sw_batch=8)
    per_case = []
    for image, label in volumes:
        pred = engine.predict(variables, image, STRIDE_XY, STRIDE_Z, 2)
        per_case.append(cal_metric_3d_full(label == 1, pred == 1))
    return np.mean(per_case, axis=0)


# ----------------------------------------------------------------------- io

def fmt_row(name, t, j, cols):
    cells = []
    for a, b in zip(t, j):
        cells.append(f"{a:.4f} / {b:.4f} / {abs(a - b):.4f}")
    return f"| {name} | " + " | ".join(cells) + " |"


def main():
    from chap_tpu.data.datasets import SyntheticVolumeDataset

    print("== 2D: training reference DualDecoder on phantoms ==")
    model2d = train_torch_2d()
    vols2d = [SyntheticVolumeDataset((10, IMG, IMG), 4, length=N_VOL_2D, seed=3)[i]
              for i in range(N_VOL_2D)]
    t2d = torch_eval_2d(model2d, vols2d)
    print("torch 2D per-class (dice,hd95,asd,jc):\n", t2d)
    j2d = chap_eval_2d(vols2d)
    print("chap 2D per-class:\n", j2d)

    print("== 3D: training reference VNet on phantoms ==")
    model3d = train_torch_3d()
    vols3d = [make_volume_3d(i) for i in range(2)]
    t3d = torch_eval_3d(model3d, vols3d)
    print("torch 3D (dice,ravd,hd95,asd):", t3d)
    j3d = chap_eval_3d(vols3d)
    print("chap 3D:", j3d)

    d2 = np.abs(t2d[:, 0] - j2d[:, 0])
    d3 = abs(t3d[0] - j3d[0])
    ok = bool(np.all(d2 < 0.005) and d3 < 0.005)

    with open(OUT_MD, "w") as f:
        f.write("# PARITY_EVAL — converted-checkpoint metric parity\n\n")
        f.write("Reference torch models briefly fitted on the shared synthetic\n"
                "phantoms (no real ACDC/LA data in this environment), converted\n"
                "with `chap_tpu.cli.convert_torch`, then evaluated on IDENTICAL\n"
                "volumes by (a) transcriptions of the reference eval loops\n"
                "(test_2D_fully.py:54-95, val_3D.py:14-79) running the torch\n"
                "model, and (b) the chap_tpu eval path (CheckpointManager ->\n"
                "eval2d / SlidingWindowEngine) on the converted checkpoint.\n"
                "Cells: torch / chap_tpu / |delta|.\n\n")
        f.write("## 2D ACDC protocol (DualDecoder mcnet, logit ensemble, "
                f"{N_VOL_2D} volumes)\n\n")
        f.write("| class | dice | hd95 | asd | jc |\n|---|---|---|---|---|\n")
        for c in range(3):
            f.write(fmt_row(f"class {c + 1}", t2d[c], j2d[c], 4) + "\n")
        f.write(f"\nmax |dice delta| = {float(np.max(d2)):.5f} "
                f"(criterion < 0.005)\n\n")
        f.write("## 3D LA protocol (VNet, patch (112,112,80), stride 18/4, "
                "2 volumes)\n\n")
        f.write("| class | dice | ravd | hd95 | asd |\n|---|---|---|---|---|\n")
        f.write(fmt_row("class 1", t3d, j3d, 4) + "\n")
        f.write(f"\n|dice delta| = {d3:.5f} (criterion < 0.005)\n\n")
        f.write(f"**Result: {'PASS' if ok else 'FAIL'}** — converted "
                "checkpoints reproduce the reference metrics through the "
                "full eval pipelines.\n")
    print(f"wrote {OUT_MD}; PASS={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
