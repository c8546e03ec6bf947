r"""Typed configuration: paths, the SMPL joint sets, and model/run defaults.

Replaces the reference's ``config.py`` (ref: config.py:5-43) with frozen
dataclasses. The reference had config drift (undefined ``paths.smpl_file``,
``amass_data``, ``amass_dir_ankle`` — ref: preprocess.py:12,40 and
train_tp.py:195); here every referenced field exists.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclasses.dataclass(frozen=True)
class Paths:
    """Dataset / asset locations. All overridable via constructor or env."""

    data_root: str = dataclasses.field(
        default_factory=lambda: _env("A3GC_DATA_ROOT", "data")
    )

    # raw datasets
    raw_dipimu_dir: str = "raw_datasets/DIP_IMU"
    raw_totalcapture_dir: str = "raw_datasets/TotalCapture/DIP_recalculate"
    raw_amass_dir: str = "raw_datasets/AMASS"

    # preprocessed (stage 1 of the data factory)
    dipimu_dir_pre: str = "preprocessed/dip-imu"
    dipimu_dir_pre_sym: str = "preprocessed/dip-imu_sym"
    totalcapture_dir_pre: str = "preprocessed/total_capture"
    amass_dir_pre: str = "preprocessed/amass"
    amass_dir_pre_sym: str = "preprocessed/amass_sym"

    # processed (stage 2: normalized, chunked, packed)
    dipimu_dir: str = "dip-imu"
    dipimu_dir_sym: str = "dip-imu_sym"
    totalcapture_dir: str = "total_capture"
    amass_dir: str = "amass"
    amass_dir_sym: str = "amass_sym"

    # SMPL body models (official pickles; not redistributable, user-provided)
    male_smpl_file: str = dataclasses.field(
        default_factory=lambda: _env(
            "A3GC_SMPL_MALE", "models/basicModel_m_lbs_10_207_0_v1.1.0.pkl"
        )
    )
    female_smpl_file: str = dataclasses.field(
        default_factory=lambda: _env(
            "A3GC_SMPL_FEMALE", "models/basicModel_f_lbs_10_207_0_v1.1.0.pkl"
        )
    )

    # normalization statistics (npz; see a3gc_tpu/data/stats.py)
    train_stats: str = "stats/all_train_stats.npz"
    train_stats_sym: str = "stats/all_sym_train_stats.npz"

    def resolve(self, rel: str) -> str:
        """Join a config-relative path onto the data root."""
        return rel if os.path.isabs(rel) else os.path.join(self.data_root, rel)


@dataclasses.dataclass(frozen=True)
class JointSet:
    """SMPL joint subsets used throughout the pipeline (ref: config.py:26-43)."""

    leaf: Tuple[int, ...] = (7, 8, 12, 20, 21)
    full: Tuple[int, ...] = tuple(range(1, 24))
    reduced: Tuple[int, ...] = (1, 2, 3, 4, 5, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19)
    ignored: Tuple[int, ...] = (0, 7, 8, 10, 11, 20, 21, 22, 23)

    lower_body: Tuple[int, ...] = (0, 1, 2, 4, 5, 7, 8, 10, 11)
    lower_body_parent: Tuple[Optional[int], ...] = (None, 0, 0, 1, 2, 3, 4, 5, 6)

    sensor: Tuple[int, ...] = (18, 19, 4, 5, 15, 0, 1, 2, 9)
    dip_imu: Tuple[int, ...] = (7, 8, 11, 12, 0, 2, 9, 10, 1)
    vertex_ids: Tuple[int, ...] = (1962, 5431, 1096, 4583, 412, 3021, 949, 4434, 3506)
    smpl_sensor: Tuple[str, ...] = (
        "L_Elbow", "R_Elbow", "L_Knee", "R_Knee", "Head", "Pelvis"
    )

    # graph wiring of the 15-node reduced skeleton (ref: datasets.py:20-23)
    input_joints: Tuple[int, ...] = (3, 4, 13, 14, 10)
    leaf_nodes: Tuple[int, ...] = (4, 5, 15, 18, 19)
    leaf_nodes_reduced: Tuple[int, ...] = (3, 4, 10, 13, 14)

    # SIP error mask: hips + shoulders (ref: evaluate_a3gc_tp.py:35)
    sip_joints: Tuple[int, ...] = (1, 2, 16, 17)

    @property
    def n_leaf(self) -> int:
        return len(self.leaf)

    @property
    def n_full(self) -> int:
        return len(self.full)

    @property
    def n_reduced(self) -> int:
        return len(self.reduced)

    @property
    def n_ignored(self) -> int:
        return len(self.ignored)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map execution.

    The reference is single-GPU (ref: train_a3gc_tp.py:158); here parallelism
    is a first-class config field. ``data`` shards the batch (DP), ``model``
    shards hidden features (TP). Defaults to 1 chip ⇒ identical semantics.
    """

    data: int = 1
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")

    @property
    def n_devices(self) -> int:
        return self.data * self.model


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of the 3-stage trainer (ref: train_a3gc_tp.py:16-43)."""

    batch_size: int = 32
    lr: float = 1e-3
    lr_decay: float = 0.8        # ExponentialLR gamma, stepped per epoch
    weight_decay: float = 0.0
    max_epochs: int = 500
    patience: int = 3            # early-stopping tolerance on val loss
    hidden_units: Tuple[int, int, int] = (256, 64, 128)   # per cascade stage
    seq_len: int = 300           # training chunk length (fixed, TPU-friendly)
    leaf_noise_std: float = 0.04   # teacher-forcing noise (ref: datasets.py:117)
    full_noise_std: float = 0.025  # (ref: datasets.py:54,116)
    normalize: bool = False
    cda: bool = False            # contralateral data augmentation (sym data)
    finetuning: bool = False
    start_stage: int = 1
    start_epoch: int = 0
    seed: int = 0
    dtype: str = "float32"       # compute dtype ("float32" or "bfloat16")
    accum_steps: int = 1         # microbatch gradient accumulation: the
                                 # per-step batch splits into this many
                                 # sequential microbatches (peak activation
                                 # memory of ONE microbatch), grads averaged
                                 # before the single Adam update — reaches
                                 # effective batches past the OOM knee
    steps_per_dispatch: int = 1  # device-resident corpora only: fold this
                                 # many consecutive optimizer steps into ONE
                                 # lax.scan dispatch (same parameter
                                 # trajectory as sequential steps). Breaks
                                 # the per-step host round-trip bound of
                                 # small-batch epochs on a relay-attached
                                 # TPU; losses are fetched per dispatch, so
                                 # logging granularity is unchanged.
    keep_checkpoints: int = 0    # retention: keep only the newest N
                                 # improvement checkpoints written by THIS
                                 # run (0 = reference behavior, keep all,
                                 # ref: train_a3gc_tp.py:254-258). Long
                                 # natural-stop runs at deep LR decay
                                 # otherwise pile up 50+ noise-level
                                 # improvements (TRAIN_NATURAL_STOP.md).
                                 # Checkpoints from previous runs and
                                 # preemption/interrupt checkpoints are
                                 # never pruned.
    min_save_delta: float = 0.0  # retention: only WRITE an improvement
                                 # checkpoint when valid loss improved on
                                 # the last SAVED one by more than this
                                 # (early-stop bookkeeping is unchanged —
                                 # this bounds disk writes, not training)
    eval_batch_size: int = 0     # validation forward batch. 0 = auto:
                                 # min(batch_size, 128). Eval has no remat
                                 # (nothing to rematerialize without a
                                 # backward) and hoists the bidirectional
                                 # input projections ([T,2,B,J,4H] resident),
                                 # so at large batch the VALIDATION pass can
                                 # OOM where training fits — chunking the
                                 # eval batch bounds it (loss is an exact
                                 # size-weighted mean, order-independent)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


# module-level defaults, mirroring how the reference exposes `paths`/`joint_set`
paths = Paths()
joint_set = JointSet()

# reduced-graph constants
N_GRAPH_NODES = 15
ACC_SCALE = 30.0  # IMU acceleration normalizer (ref: postprocess_data.py:74)
SMPL_N_JOINTS = 24

# contralateral mirroring permutations (ref: preprocess.py:17-19)
SMPL_MIRROR: Sequence[int] = (
    0, 2, 1, 3, 5, 4, 6, 8, 7, 9, 11, 10, 12, 14, 13, 15, 17, 16, 19, 18,
    21, 20, 23, 22,
)
ORI_MIRROR: Sequence[int] = (1, 0, 3, 2, 4, 5)
ACC_MIRROR: Sequence[int] = (1, 0, 3, 2, 4, 5)
