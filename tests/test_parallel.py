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
