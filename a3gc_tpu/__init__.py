r"""a3gc_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for human pose
estimation from sparse inertial sensors.

Re-designed from scratch with the capability surface of the A3GC-IP reference
(see SURVEY.md): five model families (DIP biLSTM, TransPose cascade, G-GRU,
AGC / AAGC / A3GC graph-recurrent cells), a 3-stage inference cascade, the SMPL
parametric body model (FK / IK / LBS), a full metrics suite, a data factory for
AMASS / DIP-IMU / TotalCapture, and training / evaluation drivers — all built
TPU-first: everything on-device, jit + lax.scan, device meshes via
jax.sharding, fused Pallas kernels for the hot recurrent cells.

Layering (bottom → top):
    ops/        rotation & kinematic math                 (ref: articulate/math/)
    smpl/       SMPL parametric model, FK/IK/LBS          (ref: articulate/model.py)
    metrics/    motion-error evaluators                   (ref: articulate/evaluator.py)
    data/       input pipeline + offline data factory     (ref: datasets.py, preprocess.py)
    models/     cells, layers, nets, pose pipelines       (ref: net_aagc.py)
    parallel/   device mesh + sharding policies           (ref: none — single-GPU)
    train/      jitted train steps, multi-stage driver    (ref: train_*.py)
    eval/       cascade evaluation, streaming mode        (ref: evaluate_*.py)
    compat/     PyTorch checkpoint importers              (for parity testing)
"""

__version__ = "0.2.0"

from a3gc_tpu import ops  # noqa: F401
