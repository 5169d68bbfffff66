"""Device-mesh parallelism: sharding rules and multi-host init.

The reference's multi-device story is single-process nn.DataParallel over 3
GPUs plus dead NCCL helpers (SURVEY.md §2c). Here parallelism is expressed
once, declaratively: a `jax.sharding.Mesh` with ('data', 'model') axes,
NamedSharding rules for parameters and batches, and XLA/GSPMD inserting the
collectives (psum over ICI) — no hand-written communication.
"""

from .mesh import (
    batch_sharding,
    data_parallel_sharding,
    init_distributed,
    is_main_process,
    make_mesh,
    on_main_process,
    replicated,
    vit_param_sharding,
)

# Pipeline parallelism lives in .pp — imported explicitly
# (`from vit_ocm_wmsegmentation_tpu.parallel import pp`), NOT re-exported
# here: pp pulls the models package, whose import touches the XLA backend,
# and this package must stay importable BEFORE jax.distributed.initialize
# (parallel.mesh.init_distributed is called by multi-process workers that
# import nothing heavier than .mesh).
