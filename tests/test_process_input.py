"""Process-sharded input (parallel/mesh.py): per-process local batches must
assemble to the exact global two-stream batch.

A real multi-process pod cannot run in this environment; these tests cover
the interface contract on the virtual 8-device CPU mesh: (a) the
single-process degenerate case of make_array_from_process_local_data equals
the plain sharded device_put, and (b) simulated per-process sampler slices
concatenate back to the global sampler's batches in order."""
import jax
import numpy as np

from chap_tpu.data.sampler import TwoStreamBatchSampler
from chap_tpu.parallel.mesh import (ProcessLocalBatchSampler, batch_sharding,
                                    build_mesh, process_sharded_batch)


def test_process_sharded_batch_single_process_equals_device_put():
    mesh = build_mesh()
    r = np.random.RandomState(0)
    batch = {"image": r.rand(8, 16, 16, 1).astype(np.float32),
             "label": r.randint(0, 4, (8, 16, 16)).astype(np.uint8)}
    out = process_sharded_batch(mesh, batch)
    ref_img = jax.device_put(batch["image"], batch_sharding(mesh, 4))
    assert out["image"].sharding.is_equivalent_to(ref_img.sharding, 4)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    np.testing.assert_array_equal(np.asarray(out["label"]), batch["label"])


def _make_sampler(seed=3):
    # the sampler is stateful across epochs; every (simulated) process builds
    # its OWN sampler with the same seed, exactly like real multi-host ranks
    return TwoStreamBatchSampler(list(range(20)), list(range(20, 60)),
                                 batch_size=8, secondary_batch_size=4,
                                 seed=seed)


def test_process_local_sampler_reassembles_global_batches():
    global_batches = list(_make_sampler())
    world = 4
    locals_per_rank = [
        list(ProcessLocalBatchSampler(_make_sampler(), process_index=p,
                                      process_count=world))
        for p in range(world)
    ]
    for bi, gbatch in enumerate(global_batches):
        reassembled = sum((locals_per_rank[p][bi] for p in range(world)), [])
        assert list(reassembled) == list(gbatch)
        # each rank's slice is contiguous and equally sized
        for p in range(world):
            assert len(locals_per_rank[p][bi]) == len(gbatch) // world


def test_process_local_sampler_preserves_two_stream_layout():
    """With the standard labeled_bs = B/2 layout, the first half of ranks
    load labeled rows and the rest unlabeled rows — the reassembled global
    array keeps [labeled ; unlabeled] contiguous."""
    def mk():
        return TwoStreamBatchSampler(list(range(10)), list(range(100, 140)),
                                     batch_size=8, secondary_batch_size=4,
                                     seed=0)

    world = 2
    r0_all = list(ProcessLocalBatchSampler(mk(), 0, world))
    r1_all = list(ProcessLocalBatchSampler(mk(), 1, world))
    for bi, gbatch in enumerate(list(mk())):
        lab_half = [ix for ix in gbatch if ix < 100]
        assert gbatch[:len(lab_half)] == lab_half  # labeled first globally
        assert r0_all[bi] + r1_all[bi] == list(gbatch)
