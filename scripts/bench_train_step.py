"""TPU benchmark of the CHAP train step (2D slices/sec/chip headline and the
3D LA-protocol step, patches/sec/chip).

Usage: python scripts/bench_train_step.py [variant ...]
variants: baseline-f32 full-f32 full-bf16 3d-cps-bf16 3d-full-bf16
(default: all)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.config import Config  # noqa: E402
from chap_tpu.models import net_factory  # noqa: E402
from chap_tpu.train.state import create_train_state, make_optimizer  # noqa: E402
from chap_tpu.train.step_chap import build_chap_train_step  # noqa: E402

VARIANTS = {
    "baseline-f32": ("float32", False, False),
    "full-f32": ("float32", True, True),
    "full-bf16": ("bfloat16", True, True),
    # same-window NMS-share isolation pair
    "full-bf16-nonms": ("bfloat16", True, True, True, False),
    # component decomposition (all NMS-off so shares isolate cleanly)
    "cps-bf16": ("bfloat16", False, False, True, False),
    "cps+drop-bf16": ("bfloat16", False, True, True, False),
    "cps+adv-bf16": ("bfloat16", True, False, True, False),
    # round-5 A/B matrix: sequential (round-4 structure) vs fused passes,
    # GradSim cadence, and both together
    "full-bf16-seq": ("bfloat16", True, True, True, True, False),
    "full-bf16-gs4": ("bfloat16", True, True, True, True, True, 4),
    "full-bf16-seq-gs4": ("bfloat16", True, True, True, True, False, 4),
    "full-bf16-nonms-gs4": ("bfloat16", True, True, True, False, True, 4),
}


def run(tag, dtype, adv, drop, remat=True, use_nms=True, fused=True,
        gradsim_every=1):
    cfg = Config()
    cfg.model.dtype = dtype
    cfg.semi.adv_noise = adv
    cfg.semi.dropout = drop
    cfg.semi.gradsim_every = gradsim_every
    cfg.optim.remat = remat
    cfg.optim.fused_passes = fused
    model = net_factory("dualdecoder", 1, 4, cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    sample = jnp.zeros((24, 256, 256, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    import os
    ckpt_dir = os.environ.get("CHAP_BENCH_CKPT")
    if ckpt_dir:
        # trained weights -> clean pseudo-labels -> the NMS cost of the
        # sustained-training regime instead of the random-weight worst case
        from chap_tpu.utils.checkpoint import CheckpointManager
        restored = CheckpointManager(ckpt_dir).restore_latest(state)
        if restored is not None:
            state = state.replace(params=restored.params,
                                  batch_stats=restored.batch_stats)
            print(f"{tag}: using trained weights from {ckpt_dir}", flush=True)
    step = build_chap_train_step(model, opt, cfg, use_nms=use_nms)
    if ckpt_dir:
        # trained-weights runs must see IN-DISTRIBUTION inputs (the phantoms
        # the checkpoint was trained on): out-of-distribution inputs make the
        # model emit fragmented pseudo-labels — a pathological worst case for
        # the largest-CC loop, not the sustained-training regime
        from chap_tpu.data.datasets import SyntheticSliceDataset
        ds = SyntheticSliceDataset(256, 4, 24, seed=99)
        image = np.stack([ds[i]["image"] for i in range(24)])[..., None]
        label = np.stack([ds[i]["label"] for i in range(24)])
    else:
        rng = np.random.RandomState(0)
        label = np.zeros((24, 256, 256), np.int32)
        label[:, 64:192, 64:192] = 1
        image = (label / 3.0 + rng.normal(0, 0.1, label.shape)).astype(np.float32)[..., None]
    batch = {"image": jnp.asarray(image.astype(np.float32)),
             "label": jnp.asarray(label.astype(np.int32))}
    try:
        t0 = time.perf_counter()
        # THREE warmup calls: checkpoint-restored arrays carry a different
        # on-device layout than the step's outputs, which costs up to two
        # extra tunnel compiles (~60-90 s each) before the program stabilizes
        # — timing must start from the steady state
        for w in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(100 + w))
            _ = float(m["loss"])
        print(f"{tag}: compile+warmup {time.perf_counter() - t0:.0f}s "
              f"loss={float(m['loss']):.3f}", flush=True)
        n = 8   # multiple of gradsim_every so cadence steps amortize honestly
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt * 1000:.0f} ms/step -> {24 / dt:.1f} slices/s/chip",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {str(e)[:200]}", flush=True)


def run3d(tag, mode, dtype="bfloat16"):
    """Full CHAP (or CPS) 3D step, LA protocol: DualDecoder3d, batch 4 of
    (112,112,80), two-stream halves (train_ours_2D.py semantics on the 3D
    path, trainer_3d.py). CHAP_BENCH3D_BATCH overrides the batch size
    (the tunnel's remote TPU compiler crashes on the full-CHAP graph at
    batch 4 — see BENCH_NOTES)."""
    import os
    from chap_tpu.models import net_factory_3d
    from chap_tpu.semi.gradsim import VNET_LEVEL_PATHS
    from chap_tpu.train.trainer_3d import build_cps3d_train_step

    bs = int(os.environ.get("CHAP_BENCH3D_BATCH", "4"))
    pd, ph, pz = (int(x) for x in os.environ.get(
        "CHAP_BENCH3D_PATCH", "112,112,80").split(","))
    cfg = Config()
    cfg.model.dtype = dtype
    cfg.data.num_classes = 2
    cfg.data.batch_size = bs
    cfg.data.labeled_bs = bs // 2
    cfg.optim.remat = os.environ.get("CHAP_BENCH3D_REMAT", "1") == "1"
    cfg.optim.fused_passes = os.environ.get("CHAP_BENCH3D_FUSED", "1") == "1"
    cfg.semi.gradsim_every = int(os.environ.get("CHAP_BENCH3D_GS_EVERY", "1"))
    cfg.semi.adv_noise = cfg.semi.dropout = mode == "chap"
    model = net_factory_3d("dualdecoder", 1, 2, mode="train", cfg=cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    sample = jnp.zeros((bs, pd, ph, pz, 1))
    nf = cfg.model.n_filters_3d
    sim = tuple(nf * m for m in (1, 2, 4, 8, 16)) if mode == "chap" else ()
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=sim)
    split = os.environ.get("CHAP_BENCH3D_SPLIT", "0") == "1"
    if mode == "chap":
        step = build_chap_train_step(model, opt, cfg, use_nms=True,
                                     level_paths=VNET_LEVEL_PATHS,
                                     split=split)
    else:
        step = build_cps3d_train_step(model, opt, cfg)
    rng = np.random.RandomState(0)
    label = np.zeros((bs, pd, ph, pz), np.int32)
    label[:, pd // 4:3 * pd // 4, ph // 4:3 * ph // 4, pz // 4:3 * pz // 4] = 1
    image = (label / 2.0 + rng.normal(0, 0.1, label.shape)).astype(np.float32)[..., None]
    batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}
    try:
        t0 = time.perf_counter()
        for w in range(3):   # see run(): layout-stabilizing warmup
            state, m = step(state, batch, jax.random.PRNGKey(100 + w))
            _ = float(m["loss"])
        print(f"{tag}: compile+warmup {time.perf_counter() - t0:.0f}s "
              f"loss={float(m['loss']):.3f}", flush=True)
        n = 8
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt * 1000:.0f} ms/step -> {bs / dt:.1f} patches/s/chip",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {str(e)[:200]}", flush=True)


VARIANTS_3D = {
    "3d-cps-bf16": ("cps",),
    "3d-full-bf16": ("chap",),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS) + list(VARIANTS_3D)
    for name in names:
        if name in VARIANTS_3D:
            run3d(name, *VARIANTS_3D[name])
        else:
            run(name, *VARIANTS[name])
