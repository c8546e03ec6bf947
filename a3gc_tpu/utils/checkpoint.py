r"""Checkpoint save / resume with the reference's naming & discovery semantics.

The reference saves ``checkpoint_model{stage}_{pretrain|finetuning}_{epoch}.tar``
on every validation improvement and resumes by regex-parsing the max epoch per
stage, preferring 'pretrain' files when both phases exist
(ref: train_a3gc_tp.py:127-131,164-197,257-258). This module keeps those
on-disk semantics (directory names instead of tar files) over orbax
checkpoints, so preemption recovery falls out for free.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_params", "restore_params", "discover_latest"]

_NAME = "checkpoint_model{stage}_{phase}_{epoch}"
_RE = re.compile(r"checkpoint_model(\d+)_(pretrain|finetuning)_(\d+)$")


def _ckptr():
    return ocp.StandardCheckpointer()


def save_params(params, directory: str, stage: int, epoch: int,
                finetuning: bool = False) -> str:
    r"""Save a parameter pytree under the reference naming scheme."""
    phase = "finetuning" if finetuning else "pretrain"
    path = os.path.join(
        os.path.abspath(directory),
        _NAME.format(stage=stage, phase=phase, epoch=epoch))
    ckptr = _ckptr()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def discover_latest(directory: str, stage: int,
                    phase: Optional[str] = None,
                    epoch: Optional[int] = None) -> Optional[Tuple[str, int]]:
    r"""Find the checkpoint to resume for a stage (ref discovery semantics:
    max epoch per stage; when both phases exist and none is requested,
    'pretrain' wins — ref: train_a3gc_tp.py:169-187; an explicit ``epoch``
    pins it like the eval scripts' ``--mid{1,2,3}``,
    ref: evaluate_a3gc_tp.py:108-119)."""
    entries = []
    for p in glob.glob(os.path.join(directory, "checkpoint_model*")):
        m = _RE.search(os.path.basename(p.rstrip("/")))
        if m and int(m.group(1)) == stage:
            entries.append((p, m.group(2), int(m.group(3))))
    if not entries:
        return None
    if phase is None:
        phases = {e[1] for e in entries}
        phase = "pretrain" if "pretrain" in phases else "finetuning"
    entries = [e for e in entries if e[1] == phase]
    if epoch is not None:
        entries = [e for e in entries if e[2] == epoch]
    if not entries:
        return None
    path, _, ep = max(entries, key=lambda e: e[2])
    return path, ep


def restore_params(path: str, template) -> object:
    r"""Restore a parameter pytree (template provides structure/dtypes).

    The abstract tree carries an EXPLICIT local placement: without one,
    orbax falls back to the sharding recorded at save time, which cannot
    map when the topology changed — e.g. evaluating a checkpoint written
    by a multi-host ``train --coordinator`` run (device ids from other
    processes) on a single host, or a TPU-saved one on CPU. With it, the
    restore is topology-agnostic: orbax reads the (fully-written) array
    bytes and places them locally; callers re-shard as needed
    (StageRunner re-applies the mesh policy)."""
    ckptr = _ckptr()
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                       sharding=sharding), template)
    return ckptr.restore(os.path.abspath(path), abstract)
