"""Device-mesh parallelism: the first-class comm module the reference lacks.

The reference's only distributed artifact is a disabled NCCL config block
(``config/yolo_config.yaml:197-202``). Here, data/model parallelism is built
on ``jax.sharding.Mesh`` over ICI with XLA collectives (SURVEY.md §2a/§5.8).
"""

from iqc_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    create_mesh,
    shard_batch,
    replicate,
    data_parallel_sharding,
    cross_replica_mean,
)
