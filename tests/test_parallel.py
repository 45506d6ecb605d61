"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    build_mesh,
    replicate,
    shard_batch,
)


def test_mesh_has_8_devices():
    mesh = build_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == 8


def test_mesh_dcn_axis():
    mesh = build_mesh(spec=MeshSpec(dcn_size=2))
    assert mesh.shape["dcn"] == 2
    assert mesh.shape["data"] == 4


def test_batch_sharding_distributes():
    mesh = build_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = jax.device_put(x, batch_sharding(mesh, 2))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 4)


def test_data_parallel_grad_matches_single_device():
    """psum-reduced gradient over a sharded batch == single-device gradient."""
    mesh = build_mesh()
    w = jnp.ones((4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, x)
    w_rep = replicate(mesh, w)
    x_sh = jax.device_put(x, batch_sharding(mesh, 2))
    g_sharded = jax.jit(jax.grad(loss))(w_rep, x_sh)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded),
                               rtol=1e-5)


def test_sliding_window_mesh_matches_single_device():
    """The mesh-sharded patch grid (shard_map + one psum per volume) must
    reproduce the single-device engine's label map exactly — the multi-device
    eval contract (SURVEY §2.3: eval rides the same mesh as training)."""
    from chap_tpu.eval.sliding_window import SlidingWindowEngine
    from tests.test_sliding_window import ArgmaxModel

    rng = np.random.RandomState(0)
    image = rng.rand(40, 36, 20).astype(np.float32)
    patch = (16, 16, 8)
    single = SlidingWindowEngine(ArgmaxModel(), patch, sw_batch=8)
    want = single.predict({}, image, stride_xy=12, stride_z=6, num_classes=2)
    mesh = build_mesh()
    sharded = SlidingWindowEngine(ArgmaxModel(), patch, sw_batch=8, mesh=mesh)
    got = sharded.predict({}, image, stride_xy=12, stride_z=6, num_classes=2)
    np.testing.assert_array_equal(got, want)


def test_eval2d_mesh_matches_single_device():
    """Sharded slice-batch 2D eval == single-device eval (identical label
    maps and metrics)."""
    from chap_tpu.eval.eval2d import predict_volume

    def predict(variables, x):
        fg = (x[..., 0] > 0.5).astype(jnp.float32)
        return jnp.argmax(jnp.stack([(1 - fg), fg], -1), -1).astype(jnp.int8)

    predict = jax.jit(predict)
    rng = np.random.RandomState(2)
    image = rng.rand(11, 32, 32).astype(np.float32)
    want = predict_volume(predict, {}, image, (32, 32), slice_batch=4)
    mesh = build_mesh()
    got = predict_volume(predict, {}, image, (32, 32), slice_batch=4,
                         mesh=mesh)
    np.testing.assert_array_equal(got, want)


def test_share_acal_steps_on_mesh():
    """The ACAL trainer's three jitted programs (joint CPS, decoder-max,
    encoder-min) over the 8-device mesh: sharded batches + replicated state
    must reproduce the single-device losses (trainer_share.py mesh sharding,
    reference train_share_encoder_2D.py:139-467)."""
    from chap_tpu.models import net_factory
    from chap_tpu.train.step_share import (build_acal_steps,
                                           build_share_joint_step,
                                           create_share_state)
    from tests.test_share_steps import make_batch, small_cfg

    cfg = small_cfg()
    # both batch halves must divide over the 8 devices (the ACAL replay
    # shards the labeled and replayed-unlabeled halves separately)
    cfg.data.batch_size = 16
    cfg.data.labeled_bs = 8
    model = net_factory("acalnet", 1, 4, cfg.model)
    sample = jnp.zeros((cfg.data.batch_size, 32, 32, 1))
    state, opt_g, opt_f = create_share_state(model, jax.random.PRNGKey(0),
                                             sample, cfg)
    joint = build_share_joint_step(model, opt_g, opt_f, cfg)
    dec_max, enc_min = build_acal_steps(model, opt_g, opt_f, cfg)
    batch = make_batch(cfg)
    lbs = cfg.data.labeled_bs
    mask = jnp.asarray(np.ones((cfg.data.batch_size - lbs, 32, 32), np.float32))
    rngs = [jax.random.PRNGKey(i) for i in (1, 2, 3)]

    # single-device reference trajectory
    s1, m1, k1 = joint(state, batch, rngs[0])
    s1, f1 = dec_max(s1, batch["image"], batch["label"], mask, rngs[1])
    s1, g1 = enc_min(s1, batch["image"], mask, rngs[2])

    # mesh: re-create state (joint donates its input), shard the batch
    mesh = build_mesh()
    state2, _, _ = create_share_state(model, jax.random.PRNGKey(0), sample, cfg)
    state2 = replicate(mesh, state2)
    sb = {"image": jax.device_put(batch["image"], batch_sharding(mesh, 4)),
          "label": jax.device_put(batch["label"], batch_sharding(mesh, 3))}
    smask = jax.device_put(mask, batch_sharding(mesh, 3))
    s2, m2, k2 = joint(state2, sb, rngs[0])
    s2, f2 = dec_max(s2, sb["image"], sb["label"], smask, rngs[1])
    s2, g2 = enc_min(s2, sb["image"], smask, rngs[2])

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(f1["dis_loss"]), float(f2["dis_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(g1["dis_loss_g"]), float(g2["dis_loss_g"]),
                               rtol=1e-5)
    # per-pixel CE knowledge map: BN statistics reduce in a different order
    # under SPMD, so allow float reduction-order noise (observed <=9e-5)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-3)


@pytest.mark.skipif(not os.environ.get("CHAP_SLOW_TESTS"),
                    reason="duplicates the driver-run dryrun_multichip "
                           "(~90 s compile); set CHAP_SLOW_TESTS=1")
def test_chap_step_on_mesh():
    """Full CHAP train step over the 8-device mesh (the dryrun_multichip path).
    The driver executes __graft_entry__.dryrun_multichip separately every
    round (MULTICHIP_r*.json), so the default suite run skips this; the
    mesh-step contract itself is still covered by
    test_data_parallel_grad_matches_single_device and the trainer e2e tests."""
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)
