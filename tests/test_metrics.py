import numpy as np
import pytest

from chap_tpu.metrics import (
    asd,
    calculate_metric_percase,
    calculate_metric_percase_full,
    dc,
    hd95,
    jc,
    ravd,
)
from chap_tpu.metrics.dice import hard_dice
import jax.numpy as jnp


def square(size, lo, hi):
    m = np.zeros((size, size), bool)
    m[lo:hi, lo:hi] = True
    return m


def test_dc_jc_identical():
    a = square(32, 8, 24)
    assert dc(a, a) == pytest.approx(1.0)
    assert jc(a, a) == pytest.approx(1.0)


def test_dc_known_overlap():
    a = square(32, 0, 16)   # 16x32? no: rows 0:16, cols 0:16 -> 256 px
    b = square(32, 8, 24)   # 256 px, overlap rows/cols 8:16 -> 64 px
    expected = 2 * 64 / (256 + 256)
    assert dc(a, b) == pytest.approx(expected)
    assert jc(a, b) == pytest.approx(64 / (256 + 256 - 64))


def test_hd95_asd_shifted_square():
    a = square(64, 10, 30)
    b = np.roll(a, 3, axis=1)  # shift 3 px right
    h = hd95(a, b)
    assert 0 < h <= 3.0 + 1e-6
    assert 0 < asd(a, b) <= 3.0


def test_hd95_identical_zero():
    a = square(32, 8, 24)
    assert hd95(a, a) == pytest.approx(0.0)
    assert asd(a, a) == pytest.approx(0.0)


def test_ravd_signed():
    """medpy.metric.binary.ravd is SIGNED: (vol_result - vol_ref)/vol_ref.
    Under-segmentation is negative, over-segmentation positive, and the two
    cancel when averaged (the reference averages per case,
    test_3D_util.py:147-152)."""
    a = square(32, 8, 24)          # 256 px
    b = square(32, 8, 16)          # 64 px
    assert ravd(b, a) == pytest.approx((64 - 256) / 256)   # under: negative
    assert ravd(a, b) == pytest.approx((256 - 64) / 64)    # over: positive
    assert ravd(a, a) == pytest.approx(0.0)
    # symmetric over/under errors of equal volume cancel in the mean
    c = square(32, 8, 20)          # 144 px
    assert ravd(b, c) + ravd(a, c) == pytest.approx((64 + 256 - 2 * 144) / 144)


def test_percase_empty_guard():
    empty = np.zeros((16, 16))
    full = square(16, 4, 12)
    assert calculate_metric_percase(empty, full) == (0.0, 0.0)
    assert calculate_metric_percase_full(empty, full) == (0.0, 0.0, 0.0, 0.0)


def test_hard_dice_device():
    pred = jnp.array([[0, 1], [2, 1]])
    gt = jnp.array([[0, 1], [2, 2]])
    d = hard_dice(pred, gt, 3)
    # class1: pred {01,11}, gt {01}: inter 1 -> 2*1/(2+1)=2/3 ; class2: inter 1 -> 2/(1+2)
    np.testing.assert_allclose(np.asarray(d), [2 / 3, 2 / 3], rtol=1e-5)


def test_acc_conf_analysis(tmp_path):
    from chap_tpu.eval.analysis import acc_conf_analysis
    rng = np.random.RandomState(0)
    probs = rng.dirichlet(np.ones(4), size=(8, 16, 16)).astype(np.float32)
    labels = rng.randint(0, 4, (8, 16, 16))
    f = str(tmp_path / "conf.npy")
    out = acc_conf_analysis(probs, labels, labeled_bs=4, filename=f)
    assert set(out) == {"lab_dice", "lab_corr_conf", "lab_err_conf",
                        "unlab_dice", "unlab_corr_conf", "unlab_err_conf"}
    acc_conf_analysis(probs, labels, labeled_bs=4, filename=f)
    assert np.load(f).shape == (2, 6)
