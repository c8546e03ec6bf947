r"""Multi-chip serving: shard the stream axis of the cascade over a mesh.

The multi-stream cascade folds B sequences onto the Pallas kernel row axis
(models/nets.py); one chip saturates around 16 streams (docs/PERFORMANCE.md).
Scaling past that is data-parallel: split the B streams over the mesh's
``data`` axis so every device runs the whole cascade — including its own
Pallas kernel launches — on its local B/n_data streams.

This must be ``shard_map``, not plain ``jit`` sharding propagation: a
``pallas_call`` has no SPMD partitioning rule, so under ``jit`` XLA would
gather the sharded batch onto one device before the kernel. ``shard_map``
pins the per-device block shapes instead, and the per-stream independence of
the folded kernel (block-diagonal adjacency, segment-matrix attention,
per-stream n_valid) means the shards need no collectives at all — the only
communication is the output layout.

The reference has no multi-device anything (single ``cuda:0``,
ref: evaluate_a3gc_tp.py:96-192); this is the TPU-native scale-out of its
batch-eval role (ref: evaluate_a3gc_tp.py:164-179).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from a3gc_tpu.models.pipeline import CascadeConfig, cascade_apply
from a3gc_tpu.parallel.mesh import shard_map_compat as shard_map

__all__ = ["cascade_apply_sharded"]


def cascade_apply_sharded(params3: Tuple, cfg: CascadeConfig, model,
                          imu: jnp.ndarray, mesh: Mesh,
                          frame_mask: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    r"""``cascade_apply`` with the stream axis sharded over ``mesh['data']``.

    imu [B, T, ...] with B divisible by the data-axis size; params are
    replicated. Returns the same [B·T, 24, 3, 3] as ``cascade_apply``
    (stream-major, so shard-local blocks concatenate in order).
    """
    n_data = mesh.shape["data"]
    B = imu.shape[0]
    assert B % n_data == 0, (
        f"the data axis ({n_data} devices) must divide the {B} streams")

    if frame_mask is None:
        def local(p3, x):
            return cascade_apply(p3, cfg, model, x)
        in_specs = (P(), P("data"))
        args = (params3, imu)
    else:
        def local(p3, x, fm):
            return cascade_apply(p3, cfg, model, x, frame_mask=fm)
        in_specs = (P(), P("data"), P("data"))
        args = (params3, imu, frame_mask)

    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=P("data"), check_rep=False)
    return fn(*args)
