from thinkdiff_tpu.parallel.mesh import (
    AXES, DATA_AXIS, FSDP_AXIS, MODEL_AXIS,
    make_mesh, mesh_from_config, batch_sharding, replicated,
)
from thinkdiff_tpu.parallel.sharding import (
    DEFAULT_RULES, shard_spec_tree, sharding_tree, shard_params,
    with_batch_constraint,
)
