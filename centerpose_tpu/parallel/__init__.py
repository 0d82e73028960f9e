from centerpose_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_spec,
    shard_batch,
)
