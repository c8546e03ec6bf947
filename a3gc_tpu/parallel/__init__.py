from a3gc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding,
    replicate,
    shard_batch,
    shard_map_compat,
    shard_params,
)
from a3gc_tpu.parallel.multihost import (  # noqa: F401
    fetch_replicated,
    initialize_multihost,
    is_coordinator,
)
from a3gc_tpu.parallel.serving import cascade_apply_sharded  # noqa: F401
