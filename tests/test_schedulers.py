"""LR schedule family vs hand-computed torch lr_scheduler semantics
(networks_other.py:95-142)."""
import numpy as np

from chap_tpu.train.schedulers import (ReduceLROnPlateau, get_lr_schedule,
                                       lambda_linear, step_decay,
                                       step_warmstart)


def test_lambda_linear_matches_reference_rule():
    niter, niter_decay, epoch_count = 10, 5, 1
    sched = lambda_linear(niter, niter_decay, epoch_count)
    for epoch in [0, 5, 9, 10, 12, 14]:
        expected = 1.0 - max(0, epoch + 1 + epoch_count - niter) / float(niter_decay + 1)
        np.testing.assert_allclose(float(sched(epoch)), expected, rtol=1e-6)


def test_step_decay():
    s = step_decay(10, 0.5)
    assert float(s(0)) == 1.0
    assert float(s(10)) == 0.5
    assert float(s(25)) == 0.25


def test_step_warmstart_piecewise():
    s = step_warmstart((5, 100, 200))
    np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(150)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 0.01, rtol=1e-6)


def test_plateau_reduces_after_patience():
    c = ReduceLROnPlateau(factor=0.1, patience=2, threshold=0.01)
    assert c.step(1.0) == 1.0            # first metric becomes best
    assert c.step(0.5) == 1.0            # improvement
    # 3 non-improving evals (> patience) -> scale drops
    c.step(0.5)
    c.step(0.5)
    assert c.step(0.5) == 0.1
    # torch semantics: improvement must beat best * (1 - threshold)
    c2 = ReduceLROnPlateau(patience=0)
    c2.step(1.0)
    assert c2.step(0.995) == 0.1         # within threshold: not an improvement


def test_dispatch_names():
    assert callable(get_lr_schedule("lambda", niter=5, niter_decay=5))
    assert callable(get_lr_schedule("step", lr_decay_iters=3))
    assert isinstance(get_lr_schedule("plateau2"), ReduceLROnPlateau)
    try:
        get_lr_schedule("nope")
        raised = False
    except NotImplementedError:
        raised = True
    assert raised
