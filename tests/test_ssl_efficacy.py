"""SSL-efficacy regression: semi-supervision must beat supervised-only on
the hard synthetic protocol at a matched step budget.

This is the repo's substitute for the reference's entire reason to exist
(train_ours_2D.py:219-464). Primary evidence is the on-chip ladder
(scripts/bench_ssl_efficacy.py; BENCH_NOTES round 4): supervised 0.8872 /
chap-base 0.9129 / chap-full 0.9152 best val dice at 2000 steps, 128².
This CPU test runs the same ladder shrunk to 96² x 1500 steps (the
separation needs a chip-like budget — at 200-1000 steps/64² the rungs are
indistinguishable, measured during calibration) and asserts the seeded gap
(+0.011 measured on this box) with a 3.6x margin. Slow tier: ~5-12 min
depending on compile-cache state.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.config import Config
from chap_tpu.data.datasets import SyntheticSliceDataset
from chap_tpu.models import net_factory
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.train.step_chap import build_chap_train_step
from chap_tpu.train.step_supervised import build_supervised_train_step

SIZE, NC, B, LBS, NLAB, POOL, STEPS = 96, 4, 12, 6, 12, 512, 1500


def _pool(seed, n):
    ds = SyntheticSliceDataset(SIZE, NC, n, seed=seed, hard=True)
    imgs = np.stack([ds[i]["image"] for i in range(n)])
    labs = np.stack([ds[i]["label"] for i in range(n)])
    return imgs.astype(np.float32)[..., None], labs.astype(np.int32)


def _run_rung(rung, imgs, labs):
    cfg = Config()
    cfg.data.num_classes, cfg.data.batch_size, cfg.data.labeled_bs = NC, B, LBS
    cfg.data.image_size = (SIZE, SIZE)
    cfg.optim.max_iterations = 30000      # chip-protocol LR schedule
    cfg.optim.remat = False
    cfg.semi.adv_noise = cfg.semi.dropout = rung == "chap-full"
    if rung == "chap-full":
        # the chip protocol ramps consistency over 7500 steps (rampup 50 x
        # 150-step epochs); at this test's 1500-step budget the branches
        # would never act — shorten the ramp so it completes at step 750
        # and the perturbation branches are exercised at full weight
        cfg.semi.consistency_rampup = 5.0
    model = net_factory("dualdecoder", 1, NC, cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((B, SIZE, SIZE, 1)), opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    if rung == "supervised":
        step = build_supervised_train_step(model, opt, cfg, dual=True)
    else:  # chap rungs: BCP + CPS + on-device NMS (+dropout/VAT for full)
        step = build_chap_train_step(model, opt, cfg, use_nms=True)
    rng = np.random.RandomState(1)
    key = jax.random.PRNGKey(1)
    for _ in range(STEPS):
        if rung == "supervised":
            idx = rng.randint(0, NLAB, B)
        else:
            idx = np.concatenate([rng.randint(0, NLAB, LBS),
                                  rng.randint(NLAB, POOL, B - LBS)])
        batch = {"image": jnp.asarray(imgs[idx]),
                 "label": jnp.asarray(labs[idx])}
        key, r = jax.random.split(key)
        state, _ = step(state, batch, r)
    return model, state


def _mean_fg_dice(model, state, vimgs, vlabs):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    o1, o2 = model.apply(variables, jnp.asarray(vimgs), train=False)
    pred = np.asarray(jnp.argmax(o1 + o2, -1))
    return float(np.mean([
        2 * ((pred == c) & (vlabs == c)).sum()
        / max((pred == c).sum() + (vlabs == c).sum(), 1)
        for c in range(1, NC)]))


@pytest.mark.skipif(not os.environ.get("CHAP_SLOW_TESTS"),
                    reason="chip-like budget (1500 steps x 2 rungs); "
                           "set CHAP_SLOW_TESTS=1")
def test_chap_beats_supervised_on_hard_protocol():
    imgs, labs = _pool(0, POOL)
    vimgs, vlabs = _pool(7, 48)
    sup = _mean_fg_dice(*_run_rung("supervised", imgs, labs), vimgs, vlabs)
    chap = _mean_fg_dice(*_run_rung("chap-base", imgs, labs), vimgs, vlabs)
    # measured seeded gap +0.011 (and +0.026 on-chip at full protocol);
    # assert a 3.6x-margined floor so tolerable numeric drift can't flake it
    assert chap > sup + 0.003, (chap, sup)
    assert sup > 0.75          # the protocol itself must train


@pytest.mark.skipif(not os.environ.get("CHAP_SLOW_TESTS"),
                    reason="chip-like budget (1500 steps x 2 rungs); "
                           "set CHAP_SLOW_TESTS=1")
def test_chap_full_not_below_chap_base():
    """The signature perturbation branches (GradSim dropout + masked VAT)
    must not cost accuracy once their consistency weight is actually live.
    chap-full runs with the ramp shortened to complete at step 750 (see
    _run_rung) so the branches act at full weight inside the test budget.
    Measured seeded values on this box: chap-base 0.8852, chap-full 0.8926
    (+0.74 pts); the 6k-step on-chip ladder with the real 7.5k-step ramp is
    the primary evidence (BENCH_NOTES round 5). Gate is non-inferiority with
    margin so numeric drift across platforms can't flake it."""
    imgs, labs = _pool(0, POOL)
    vimgs, vlabs = _pool(7, 48)
    base = _mean_fg_dice(*_run_rung("chap-base", imgs, labs), vimgs, vlabs)
    full = _mean_fg_dice(*_run_rung("chap-full", imgs, labs), vimgs, vlabs)
    assert full > base - 0.004, (full, base)
    assert base > 0.80         # the base rung must itself train
