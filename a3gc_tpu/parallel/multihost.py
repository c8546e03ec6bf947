r"""Multi-host (DCN) scale-out: a process-level ``jax.distributed`` runtime.

The reference is strictly single-process, single-accelerator
(``torch.device("cuda:0")``, ref: train_a3gc_tp.py:158) — its only
scale-out story is "run it again". Here N controller processes (one per
TPU host of a pod slice, or per machine in a CPU test rig) join ONE jax
runtime; the rest of the framework's mesh machinery then spans every
process's devices with no further changes:

  * ``make_mesh`` builds the (data, model) grid over the GLOBAL device
    list (``jax.devices()`` is global after :func:`initialize_multihost`);
  * ``jax.device_put(host_array, NamedSharding(...))`` materializes only
    this process's addressable shards from its local copy of the batch,
    so the existing ``shard_batch`` / ``shard_params`` /
    ``put_device_sharded`` paths work verbatim;
  * the jitted train step is one SPMD program — XLA inserts the gradient
    psum across hosts (ICI inside a slice, DCN between slices);
  * loss scalars come back fully replicated, so ``float(loss)`` and the
    early-stopping decisions are identical on every process.

The contract each process must uphold: identical flags, dataset files and
seeds. The Sampler's deterministic per-(stage, epoch) salted shuffle then
produces the SAME global batch order everywhere; every process assembles
the full batch on host while only its own device shards are uploaded.

IO is coordinator-gated (process 0 writes the JSONL log and stdout);
checkpointing stays on the existing orbax path, which is natively
multi-process — every process calls ``save`` at the same (deterministic)
point and orbax's primary host writes the replicated arrays. Wired into
``cli train --coordinator`` (see :func:`a3gc_tpu.cli.cmd_train`).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

__all__ = ["initialize_multihost", "is_coordinator", "process_index",
           "process_count", "fetch_replicated", "any_flag",
           "interrupt_checker"]

# jitted helpers are cached at module level — any_flag/fetch_replicated
# run at EVERY epoch boundary of a multihost run, and a fresh jax.jit
# wrapper per call would retrace+recompile each time on every process
_JITS: dict = {}


def initialize_multihost(coordinator: str, num_processes: int,
                         process_id: int,
                         platform: Optional[str] = None) -> Tuple[int, int]:
    r"""Join the distributed runtime. MUST run before any jax backend use
    (device queries, placements, jits) in the process.

    ``coordinator`` is ``host:port`` of process 0. The CPU backend's
    cross-process collectives implementation is switched to gloo
    unconditionally (the in-tree default cannot reduce across
    processes, and the option only affects the CPU client — TPU slices
    use the native ICI/DCN fabric regardless, so this is safe even when
    the CPU backend is merely a bystander). Keying the switch off
    ``JAX_PLATFORMS`` would silently miss auto-detected-CPU rigs where
    neither the env var nor the config is set. Returns
    ``(process_index, process_count)``.
    """
    import jax

    del platform            # kept for API compatibility; see docstring
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_coordinator() -> bool:
    r"""True on the process that owns logging/stdout (single-process runs
    are their own coordinator)."""
    import jax
    return jax.process_index() == 0


def any_flag(flag: bool, mesh) -> bool:
    r"""Collective OR of a per-process host-side flag over ``mesh`` —
    e.g. "this host received SIGTERM". Signal delivery timing differs
    per host, so decisions that must be taken at the SAME step on every
    process (preemption checkpointing) sync through this; it costs one
    tiny all-reduce. All processes must call together."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    shape = mesh.devices.shape
    sh = NamedSharding(mesh, P(*mesh.axis_names))
    local = np.full([1] * len(shape), 1.0 if flag else 0.0, np.float32)
    arr = jax.make_array_from_callback(shape, sh, lambda idx: local)
    if "max" not in _JITS:
        _JITS["max"] = jax.jit(jnp.max)
    return bool(_JITS["max"](arr))


def fetch_replicated(tree, mesh):
    r"""Local host-numpy copy of a global pytree: gather any sharded
    leaves to fully-replicated via a jit identity over ``mesh``, then
    read the local shard. Safe on every process (collective — all
    processes must call together when leaves span hosts)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    key = ("identity", repl)
    if key not in _JITS:
        _JITS[key] = jax.jit(lambda t: t, out_shardings=repl)
    gathered = _JITS[key](tree)
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), gathered)


def interrupt_checker(interrupt, mesh):
    r"""Build the per-epoch "stop now?" predicate shared by the training
    drivers (:func:`a3gc_tpu.train.loop.run_cascade_training` and the
    CLI's DIP path). Single-process: reads the flag directly.
    Multi-process: the flag is collectively OR-ed over ``mesh``
    (:func:`any_flag`) so every process stops at the SAME epoch boundary
    and reaches the cooperative orbax save together. Multi-process with
    ``mesh=None`` is rejected up front — with nothing spanning the
    processes to sync through, the signaled process would return alone
    and deadlock the survivors' next collective."""
    import jax

    if interrupt is None:
        return lambda: False
    multihost = jax.process_count() > 1
    if multihost and mesh is None:
        raise ValueError(
            "multi-process training needs a process-spanning mesh to "
            "sync the interrupt flag (run with --mesh, or build runners "
            "with mesh=)")

    def _interrupted() -> bool:
        trig = bool(interrupt())
        return any_flag(trig, mesh) if multihost else trig

    return _interrupted
