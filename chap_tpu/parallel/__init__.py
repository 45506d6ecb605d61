from chap_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
