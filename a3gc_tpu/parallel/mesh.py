r"""Device mesh + sharding policies.

The reference is strictly single-GPU (``torch.device("cuda:0")``,
ref: train_a3gc_tp.py:158) with host-process data loading as its only
parallelism (ref: train_a3gc_tp.py:209-211). Here the device mesh is a
first-class config object (``a3gc_tpu.config.MeshConfig``):

  * axis ``data`` — batch (DP) for training, sequence-set for bulk eval;
  * axis ``model`` — hidden-feature sharding (TP) for the dense/recurrent
    kernels, available though rarely warranted at these model sizes.

With a 1×1 mesh all shardings degenerate to single-device placement and the
semantics match the reference exactly. Collectives (psum of gradients under
``data``) are inserted by XLA from the sharding annotations — no explicit
communication code, and they ride ICI when the mesh maps onto a TPU slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from a3gc_tpu.config import MeshConfig

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate",
           "param_sharding", "shard_params", "shard_map_compat"]


def shard_map_compat(f, mesh, in_specs, out_specs, check_rep=True):
    r"""``shard_map`` across jax versions: the stable ``jax.shard_map``
    (keyword-only, ``check_vma``) when present, else the experimental one
    (``check_rep``). ``check_rep=False`` is needed around ``pallas_call``
    bodies, which have no replication rule."""
    try:
        from jax import shard_map as sm
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=check_rep)
    except ImportError:      # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map as sm
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=check_rep)


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    r"""Build a (data, model) mesh. Defaults to all visible devices on the
    data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(data=len(devices), model=1)
    assert cfg.n_devices <= len(devices), (
        f"mesh {cfg.data}x{cfg.model} needs {cfg.n_devices} devices, "
        f"have {len(devices)}")
    grid = np.asarray(devices[: cfg.n_devices]).reshape(cfg.data, cfg.model)
    return Mesh(grid, cfg.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with B sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / opt state) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def param_sharding(mesh: Mesh, x) -> NamedSharding:
    r"""Tensor-parallel placement policy for one parameter array.

    The gate/feature axis is always the LAST axis of our kernels
    ([in, 4H] gate kernels, [H, H] attention kernels, [F, 3H] GRU input
    kernels, optionally behind a leading direction axis) and of the
    matching bias vectors — so TP = split the last axis over ``model``
    when it divides evenly and is wide enough to be worth it. Everything
    else (15×15 adjacencies, tiny output projections) is replicated; with
    ``model=1`` everything is replicated and semantics equal the
    reference's single device.
    """
    m = mesh.shape.get("model", 1)
    if (m > 1 and hasattr(x, "ndim") and x.ndim >= 2
            and x.shape[-1] % m == 0 and x.shape[-1] >= 32):
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
    return NamedSharding(mesh, P())


def shard_params(tree, mesh: Mesh):
    """Place a params / optimizer-state pytree per ``param_sharding``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, param_sharding(mesh, x)), tree)
