import numpy as np

from chap_tpu.data import (
    BatchLoader,
    RandomGenerator,
    SyntheticSliceDataset,
    SyntheticVolumeDataset,
    TwoStreamBatchSampler,
)
from chap_tpu.data.datasets import patients_to_slices


def test_two_stream_sampler_layout():
    sampler = TwoStreamBatchSampler(list(range(20)), list(range(20, 100)),
                                    batch_size=8, secondary_batch_size=4)
    batches = list(sampler)
    assert len(batches) == 5  # 20 // 4
    for batch in batches:
        assert len(batch) == 8
        assert all(i < 20 for i in batch[:4])       # labeled head
        assert all(i >= 20 for i in batch[4:])      # unlabeled tail


def test_two_stream_sampler_epoch_coverage():
    sampler = TwoStreamBatchSampler(list(range(12)), list(range(12, 40)), 6, 3)
    seen = [i for b in sampler for i in b[:3]]
    assert sorted(seen) == list(range(12))  # every labeled idx exactly once


def test_synthetic_slice_deterministic():
    ds = SyntheticSliceDataset(size=64, num_classes=4, length=10)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["label"].max() <= 3
    assert set(np.unique(ds[0]["label"])) <= {0, 1, 2, 3}


def test_synthetic_volume_shape():
    ds = SyntheticVolumeDataset(shape=(5, 64, 64), num_classes=4, length=2)
    v = ds[0]
    assert v["image"].shape == (5, 64, 64)
    assert v["label"].shape == (5, 64, 64)


def test_random_generator_resizes():
    gen = RandomGenerator([64, 64], seed=0)
    out = gen({"image": np.random.rand(100, 90).astype(np.float32),
               "label": np.random.randint(0, 4, (100, 90))})
    assert out["image"].shape == (64, 64)
    assert out["label"].shape == (64, 64)
    assert out["label"].dtype == np.int32


def test_batch_loader_order_and_collation():
    ds = SyntheticSliceDataset(size=32, num_classes=4, length=40)
    sampler = TwoStreamBatchSampler(list(range(16)), list(range(16, 40)), 8, 4)
    loader = BatchLoader(ds, sampler, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b["image"].shape == (8, 32, 32, 1)
        assert b["label"].shape == (8, 32, 32)


def test_patients_to_slices_table():
    assert patients_to_slices("ACDC", 7) == 136
    assert patients_to_slices("synthetic", 3) == 68


def test_batch_loader_propagates_worker_failure():
    """A raising dataset must fail the consumer loudly, not deadlock the
    ordered-emit loop (the reference's DataLoader propagates worker errors,
    train_ours_2D.py:274)."""
    import pytest

    class Corrupt:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            if i == 9:
                raise OSError("corrupt h5 block")
            return {"image": np.zeros((8, 8), np.float32),
                    "label": np.zeros((8, 8), np.int64)}

    sampler = [[0, 1], [2, 3], [8, 9], [10, 11]]
    loader = BatchLoader(Corrupt(), sampler, num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)


def test_synthetic_hard_protocol():
    """synthetic_hard (the SSL-efficacy protocol): distractor blobs wear
    foreground intensities on background labels, boundaries are deformed,
    and build_datasets routes the flag to both train slices and val volumes."""
    from chap_tpu.data.datasets import (SyntheticSliceDataset,
                                        _phantom_slice_hard, build_datasets)

    ds = SyntheticSliceDataset(64, 4, 50, hard=True)
    s0, s1 = ds[0], ds[1]
    assert s0["image"].shape == (64, 64) and s0["label"].dtype == np.int32
    assert not np.array_equal(s0["label"], s1["label"])  # per-index variance
    # nested anatomy present, background dominant
    fracs = [(s0["label"] == c).mean() for c in range(4)]
    assert fracs[0] > 0.5 and all(f > 0 for f in fracs[1:])
    # determinism
    again = SyntheticSliceDataset(64, 4, 50, hard=True)[0]
    np.testing.assert_array_equal(again["label"], s0["label"])
    np.testing.assert_allclose(again["image"], s0["image"])

    class _Cfg:
        dataset = "synthetic_hard"
        image_size = (64, 64)
        num_classes = 4
        synthetic_train_size = 50
        synthetic_val_volumes = 2

    train, val = build_datasets(_Cfg())
    assert len(train) == 50 and len(val) == 2
    assert val[0]["image"].shape == (10, 64, 64)
