from neural_vit_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
