"""TPU benchmark of the CHAP train step (2D slices/sec/chip headline).

Usage: python scripts/bench_train_step.py [variant ...]
variants: baseline-f32 full-f32 full-bf16 (default: all)
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
}


def run(tag, dtype, adv, drop, remat=True):
    cfg = Config()
    cfg.model.dtype = dtype
    cfg.semi.adv_noise = adv
    cfg.semi.dropout = drop
    cfg.optim.remat = remat
    model = net_factory("dualdecoder", 1, 4, cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    sample = jnp.zeros((24, 256, 256, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    step = build_chap_train_step(model, opt, cfg, use_nms=True)
    rng = np.random.RandomState(0)
    label = np.zeros((24, 256, 256), np.int32)
    label[:, 64:192, 64:192] = 1
    image = (label / 3.0 + rng.normal(0, 0.1, label.shape)).astype(np.float32)[..., None]
    batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}
    try:
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(1))
        print(f"{tag}: compile {time.perf_counter() - t0:.0f}s "
              f"loss={float(m['loss']):.3f}", flush=True)
        n = 6
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt * 1000:.0f} ms/step -> {24 / dt:.1f} slices/s/chip",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        run(name, *VARIANTS[name])
