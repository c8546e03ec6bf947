r"""Rotation representations and conversions — pure jnp, fully on-device.

Capability parity with the reference's ``articulate/math/angular.py`` and
``general.py`` (ref: articulate/math/angular.py:20-309), redesigned for TPU:
the reference round-trips through ``cv2.Rodrigues`` (angular.py:161-164) and
``scipy.spatial.transform`` (angular.py:249-268) on the host for R→axis-angle
and euler conversions; here both are closed-form jnp so every conversion stays
inside jit/XLA.

Conventions match the reference: quaternions are wxyz; euler angles use
scipy-style sequences ('XYZ' intrinsic / 'xyz' extrinsic); 6D rotation vectors
are the first two *rows* of the rotation matrix (Zhou et al.), flattened
row-major, as produced by ref angular.py:185-192.

All functions accept arbitrary leading batch dims where the reference accepted
"anything reshapable to [N, rep_dim]" and return the same [N, ...] layout.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RotationRepresentation", "to_rotation_matrix", "radian_to_degree",
    "degree_to_radian", "normalize_angle", "angle_difference", "angle_between",
    "svd_rotate", "generate_random_rotation_matrix",
    "axis_angle_to_rotation_matrix", "rotation_matrix_to_axis_angle",
    "project_to_rotation",
    "r6d_to_rotation_matrix", "rotation_matrix_to_r6d",
    "quaternion_to_axis_angle", "axis_angle_to_quaternion",
    "quaternion_to_rotation_matrix", "rotation_matrix_to_quaternion",
    "rotation_matrix_to_euler_angle", "euler_angle_to_rotation_matrix",
    "lerp", "normalize_tensor", "append_value", "append_zero", "append_one",
    "vector_cross_matrix", "vector_cross_matrix_np",
    "block_diagonal_matrix_np", "rotation_matrix_to_euler_angle_np",
    "euler_angle_to_rotation_matrix_np", "euler_convert_np",
]

_EPS = 1e-8


class RotationRepresentation(enum.Enum):
    r"""Rotation representations (ref: angular.py:20-28)."""

    AXIS_ANGLE = 0
    ROTATION_MATRIX = 1
    QUATERNION = 2
    R6D = 3
    EULER_ANGLE = 4


# ---------------------------------------------------------------------------
# general utils (ref: articulate/math/general.py)
# ---------------------------------------------------------------------------

def lerp(a, b, t):
    r"""Unclamped linear interpolation (ref: general.py:15-24)."""
    return a * (1 - t) + b * t


def normalize_tensor(x: jnp.ndarray, axis: int = -1, return_norm: bool = False):
    r"""Normalize to unit norm along ``axis`` (ref: general.py:27-39).

    Like the reference, a zero vector produces NaN unless the caller scrubs it;
    the conversion functions below scrub explicitly where the reference did.
    """
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    normalized = x / norm
    return (normalized, norm) if return_norm else normalized


def append_value(x: jnp.ndarray, value: float, axis: int = -1) -> jnp.ndarray:
    r"""Append a constant slice along ``axis`` (ref: general.py:42-56)."""
    shape = list(x.shape)
    shape[axis] = 1
    app = jnp.full(shape, value, dtype=x.dtype)
    return jnp.concatenate((x, app), axis=axis)


append_zero = partial(append_value, value=0.0)
append_one = partial(append_value, value=1.0)


def vector_cross_matrix(x: jnp.ndarray) -> jnp.ndarray:
    r"""Skew-symmetric matrix :math:`[v]_\times` per vector (ref: general.py:63-74)."""
    x = x.reshape(-1, 3)
    zeros = jnp.zeros(x.shape[0], dtype=x.dtype)
    m = jnp.stack(
        (zeros, -x[:, 2], x[:, 1],
         x[:, 2], zeros, -x[:, 0],
         -x[:, 1], x[:, 0], zeros), axis=1)
    return m.reshape(-1, 3, 3)


# ---------------------------------------------------------------------------
# angles
# ---------------------------------------------------------------------------

def radian_to_degree(q):
    return q * (180.0 / np.pi)


def degree_to_radian(q):
    return q * (np.pi / 180.0)


def normalize_angle(q: jnp.ndarray) -> jnp.ndarray:
    r"""Normalize radians into [-pi, pi) (ref: angular.py:67-76)."""
    mod = q % (2 * np.pi)
    return jnp.where(mod >= np.pi, mod - 2 * np.pi, mod)


def angle_difference(target, source):
    r"""Normalized target - source (ref: angular.py:79-83)."""
    return normalize_angle(target - source)


# Largest 3x3-SVD batch lowered as ONE XLA QrDecompositionBlock: the TPU
# lowering scopes vmem proportional to the batch (measured: 49152 rows =
# 12M fits the 16M scoped-vmem limit, 98304 rows = 24M hard-fails the
# compile), so long sequences (T=4096 x 24 joints in the metrics suite)
# must run the SVD in lax.map chunks. 16384 rows = ~4M scoped.
_SVD_CHUNK = 16384


def _project_block(m: jnp.ndarray) -> jnp.ndarray:
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(jnp.matmul(u, vt,
                                    precision=jax.lax.Precision.HIGHEST))
    u = u.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    return jnp.matmul(u, vt, precision=jax.lax.Precision.HIGHEST)


def project_to_rotation(m: jnp.ndarray) -> jnp.ndarray:
    r"""Project matrices to the nearest proper rotation (batched 3×3 SVD with
    the reflection fix). cv2.Rodrigues does this implicitly on every input
    (verified numerically to 1e-13), so any path that must match the
    reference's angles on NON-orthonormal input — e.g. the raw 9D 'rotation'
    outputs of the nets (ref: net_aagc.py:759 view(-1,15,3,3) with no
    orthonormalization) — must project first. Batches past ``_SVD_CHUNK``
    rows run chunk-serially (identity-padded tail) to bound TPU scoped
    vmem; results are identical."""
    m = m.reshape(-1, 3, 3)
    n = m.shape[0]
    if n <= _SVD_CHUNK:
        return _project_block(m)
    k = -(-n // _SVD_CHUNK)
    pad = k * _SVD_CHUNK - n
    if pad:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), (pad, 3, 3))
        m = jnp.concatenate((m, eye))
    out = jax.lax.map(_project_block, m.reshape(k, _SVD_CHUNK, 3, 3))
    return out.reshape(-1, 3, 3)[:n]


def angle_between(rot1: jnp.ndarray, rot2: jnp.ndarray,
                  rep: RotationRepresentation = RotationRepresentation.ROTATION_MATRIX,
                  project: bool = True) -> jnp.ndarray:
    r"""Angle in radians between two batches of rotations (ref: angular.py:86-99).

    The reference converts the relative rotation to axis-angle via
    cv2.Rodrigues and takes its norm; cv2 implicitly projects its input to
    the nearest rotation, which matters because the nets emit unconstrained
    9D matrices. ``project=True`` reproduces that exactly (on true rotations
    it is an epsilon-size no-op); the angle itself is then read off with the
    atan2 form — exact over [0, pi] and stable at both endpoints, no host
    round-trip.
    """
    r1 = to_rotation_matrix(rot1, rep)
    r2 = to_rotation_matrix(rot2, rep)
    offset = jnp.einsum("nji,njk->nik", r1, r2,
                        precision=jax.lax.Precision.HIGHEST)  # r1^T @ r2
    if project:
        offset = project_to_rotation(offset)
    trace = offset[..., 0, 0] + offset[..., 1, 1] + offset[..., 2, 2]
    w = jnp.stack((
        offset[..., 2, 1] - offset[..., 1, 2],
        offset[..., 0, 2] - offset[..., 2, 0],
        offset[..., 1, 0] - offset[..., 0, 1]), axis=-1)
    sin_theta = 0.5 * jnp.linalg.norm(w, axis=-1)
    cos_theta = 0.5 * (trace - 1.0)
    return jnp.arctan2(sin_theta, cos_theta)


# ---------------------------------------------------------------------------
# axis-angle <-> rotation matrix
# ---------------------------------------------------------------------------

def axis_angle_to_rotation_matrix(a: jnp.ndarray) -> jnp.ndarray:
    r"""Rodrigues formula, batch (ref: angular.py:139-151). Returns [N, 3, 3]."""
    a = a.reshape(-1, 3)
    angle = jnp.linalg.norm(a, axis=-1, keepdims=True)
    axis = jnp.where(angle > _EPS, a / jnp.maximum(angle, _EPS), jnp.zeros_like(a))
    angle = angle[..., None]  # [N,1,1]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), (a.shape[0], 3, 3))
    outer = axis[:, :, None] * axis[:, None, :]
    return c * eye + (1 - c) * outer + s * vector_cross_matrix(axis)


def rotation_matrix_to_axis_angle(r: jnp.ndarray,
                                  project: bool = False) -> jnp.ndarray:
    r"""Closed-form SO(3) log map, batch (ref: angular.py:154-164). [N, 3].

    ``project=True`` additionally snaps the input to the nearest rotation
    first, matching cv2.Rodrigues' behavior on non-orthonormal input.

    Replaces the reference's per-matrix cv2.Rodrigues host loop with a branch-
    free on-device formulation covering all three regimes:

      * generic:    axis = vee(R - R^T) / (2 sin θ), θ = atan2(|w|, (tr-1)/2)
      * θ → 0:      aa ≈ vee(R - R^T)/2 · (1 + θ²/6 + 7θ⁴/360)  (Taylor)
      * θ → π:      axis² from diag((R + I)/2); signs from the off-diagonals

    The output matches cv2.Rodrigues (θ ∈ [0, π]) to fp32 precision, which the
    SIP-error parity budget of 0.1° requires (SURVEY.md §7 hard part #2).
    """
    r = r.reshape(-1, 3, 3)
    if project:
        r = project_to_rotation(r)
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    w = 0.5 * jnp.stack((
        r[..., 2, 1] - r[..., 1, 2],
        r[..., 0, 2] - r[..., 2, 0],
        r[..., 1, 0] - r[..., 0, 1]), axis=-1)          # = sin(θ) * axis
    sin_theta = jnp.linalg.norm(w, axis=-1)
    cos_theta = 0.5 * (trace - 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)

    # generic / small-angle factor:  θ / sinθ, Taylor-expanded near 0
    small = theta < 1e-3
    t2 = theta * theta
    factor = jnp.where(
        small,
        1.0 + t2 / 6.0 + 7.0 * t2 * t2 / 360.0,
        theta / jnp.where(small, 1.0, jnp.maximum(sin_theta, _EPS)),
    )
    aa_generic = w * factor[..., None]

    # near-π branch: sinθ ≈ 0 but axis recoverable from the symmetric part.
    # B = (R + I)/2 = cosθ/2·(…) has diagonal  axis_i² (1-cosθ)/2 + cosθ …
    # exactly:  R = I cosθ + (1-cosθ) aaᵀ + sinθ [a]ₓ  ⇒
    #           diag(R) = cosθ + (1-cosθ) axis²
    one_minus_cos = jnp.maximum(1.0 - cos_theta, _EPS)
    diag = jnp.stack((r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]), axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / one_minus_cos[..., None], 0.0, 1.0)
    axis_abs = jnp.sqrt(axis_sq)
    # signs: pick the dominant component positive, then use the symmetric
    # off-diagonal products  (R_ij + R_ji)/2 = (1-cosθ) a_i a_j  to sign the rest.
    s01 = r[..., 0, 1] + r[..., 1, 0]
    s02 = r[..., 0, 2] + r[..., 2, 0]
    s12 = r[..., 1, 2] + r[..., 2, 1]
    dominant = jnp.argmax(axis_abs, axis=-1)
    sign0 = jnp.ones_like(sin_theta)
    ax = axis_abs[..., 0]
    ay = axis_abs[..., 1]
    az = axis_abs[..., 2]
    # dominant = 0: a0 = +|a0|, a1 sign from s01, a2 sign from s02
    cand0 = jnp.stack((ax * sign0, ay * jnp.sign(s01), az * jnp.sign(s02)), axis=-1)
    # dominant = 1: a1 = +|a1|, a0 from s01, a2 from s12
    cand1 = jnp.stack((ax * jnp.sign(s01), ay * sign0, az * jnp.sign(s12)), axis=-1)
    # dominant = 2: a2 = +|a2|, a0 from s02, a1 from s12
    cand2 = jnp.stack((ax * jnp.sign(s02), ay * jnp.sign(s12), az * sign0), axis=-1)
    axis_pi = jnp.where(
        (dominant == 0)[..., None], cand0,
        jnp.where((dominant == 1)[..., None], cand1, cand2))
    # orient with the (tiny but signed) antisymmetric part when available so
    # that the result is continuous with the generic branch.
    w_dot = jnp.sum(axis_pi * w, axis=-1, keepdims=True)
    axis_pi = jnp.where(w_dot < 0, -axis_pi, axis_pi)
    aa_pi = axis_pi * theta[..., None]

    near_pi = cos_theta < -1.0 + 1e-4
    return jnp.where(near_pi[..., None], aa_pi, aa_generic)


# ---------------------------------------------------------------------------
# 6D representation
# ---------------------------------------------------------------------------

def r6d_to_rotation_matrix(r6d: jnp.ndarray) -> jnp.ndarray:
    r"""Gram-Schmidt 6D → R, batch (ref: angular.py:167-182). [N, 3, 3].

    Like the reference, NaNs from degenerate input are scrubbed to 0.
    """
    r6d = r6d.reshape(-1, 6)
    col0 = normalize_tensor(r6d[:, 0:3])
    col1 = r6d[:, 3:6] - jnp.sum(col0 * r6d[:, 3:6], axis=1, keepdims=True) * col0
    col1 = normalize_tensor(col1)
    col2 = jnp.cross(col0, col1)
    r = jnp.stack((col0, col1, col2), axis=-1)
    return jnp.nan_to_num(r, nan=0.0)


def rotation_matrix_to_r6d(r: jnp.ndarray) -> jnp.ndarray:
    r"""R → 6D: first two columns, column-major flatten (ref: angular.py:185-192)."""
    r = r.reshape(-1, 3, 3)
    return jnp.swapaxes(r[:, :, :2], 1, 2).reshape(-1, 6)


# ---------------------------------------------------------------------------
# quaternions (wxyz)
# ---------------------------------------------------------------------------

def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    r"""Quaternion wxyz → axis-angle (ref: angular.py:195-208). [N, 3].

    Matches the reference's convention: the returned angle is in [0, 2π)
    (2·acos(w) with w clamped), NaN at zero rotation scrubbed to 0.
    """
    q = normalize_tensor(q.reshape(-1, 4))
    theta_half = jnp.arccos(jnp.clip(q[:, 0], -1.0, 1.0))
    sin_half = jnp.sin(theta_half)
    scale = jnp.where(
        jnp.abs(sin_half) > _EPS,
        2.0 * theta_half / jnp.where(jnp.abs(sin_half) > _EPS, sin_half, 1.0),
        2.0)  # limit: 2θ/sinθ → 2 as θ→0
    return q[:, 1:] * scale[:, None]


def axis_angle_to_quaternion(a: jnp.ndarray) -> jnp.ndarray:
    r"""Axis-angle → quaternion wxyz (ref: angular.py:211-221). [N, 4]."""
    a = a.reshape(-1, 3)
    angle = jnp.linalg.norm(a, axis=-1, keepdims=True)
    axis = jnp.where(angle > _EPS, a / jnp.maximum(angle, _EPS), jnp.zeros_like(a))
    half = angle / 2
    return jnp.concatenate((jnp.cos(half), jnp.sin(half) * axis), axis=1)


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    r"""(Unnormalized) quaternion wxyz → R (ref: angular.py:224-236). [N, 3, 3]."""
    q = normalize_tensor(q.reshape(-1, 4))
    a, b, c, d = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack((
        1 - 2 * (c * c + d * d), 2 * (b * c - a * d), 2 * (a * c + b * d),
        2 * (b * c + a * d), 1 - 2 * (b * b + d * d), 2 * (c * d - a * b),
        2 * (b * d - a * c), 2 * (a * b + c * d), 1 - 2 * (b * b + c * c)),
        axis=1)
    return r.reshape(-1, 3, 3)


def rotation_matrix_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    r"""R → quaternion wxyz via Shepperd's method, batch. [N, 4].

    Not present in the reference's public API but needed internally; the
    branch-free max-trace selection is TPU-friendly.
    """
    r = r.reshape(-1, 3, 3)
    m00, m01, m02 = r[:, 0, 0], r[:, 0, 1], r[:, 0, 2]
    m10, m11, m12 = r[:, 1, 0], r[:, 1, 1], r[:, 1, 2]
    m20, m21, m22 = r[:, 2, 0], r[:, 2, 1], r[:, 2, 2]
    tr = m00 + m11 + m22

    qw0 = jnp.sqrt(jnp.maximum(1 + tr, _EPS)) / 2
    q0 = jnp.stack((qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)), axis=-1)
    qx1 = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, _EPS)) / 2
    q1 = jnp.stack(((m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)), axis=-1)
    qy2 = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, _EPS)) / 2
    q2 = jnp.stack(((m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)), axis=-1)
    qz3 = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, _EPS)) / 2
    q3 = jnp.stack(((m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3), axis=-1)

    cases = jnp.stack((tr, m00, m11, m22), axis=-1)
    idx = jnp.argmax(cases, axis=-1)
    q = jnp.where((idx == 0)[:, None], q0,
                  jnp.where((idx == 1)[:, None], q1,
                            jnp.where((idx == 2)[:, None], q2, q3)))
    return normalize_tensor(q)


# ---------------------------------------------------------------------------
# euler angles (closed-form; replaces scipy round-trips, ref: angular.py:239-296)
# ---------------------------------------------------------------------------

_AXIS_IDX = {"X": 0, "Y": 1, "Z": 2, "x": 0, "y": 1, "z": 2}


def _single_axis_matrix(axis: int, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == 0:
        rows = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == 1:
        rows = (c, zero, s, zero, one, zero, -s, zero, c)
    else:
        rows = (c, -s, zero, s, c, zero, zero, zero, one)
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angle_to_rotation_matrix(q: jnp.ndarray, seq: str = "XYZ") -> jnp.ndarray:
    r"""Euler → R, scipy-compatible sequences (ref: angular.py:255-268). [N, 3, 3].

    Uppercase = intrinsic (R = R1 @ R2 @ R3), lowercase = extrinsic
    (R = R3 @ R2 @ R1); matches scipy.spatial.transform.Rotation.
    """
    assert len(seq) == 3
    intrinsic = seq.isupper()
    q = q.reshape(-1, 3)
    ms = [_single_axis_matrix(_AXIS_IDX[ax], q[:, i]) for i, ax in enumerate(seq)]
    hi = jax.lax.Precision.HIGHEST
    if intrinsic:
        return jnp.matmul(jnp.matmul(ms[0], ms[1], precision=hi), ms[2], precision=hi)
    return jnp.matmul(jnp.matmul(ms[2], ms[1], precision=hi), ms[0], precision=hi)


def rotation_matrix_to_euler_angle(r: jnp.ndarray, seq: str = "XYZ") -> jnp.ndarray:
    r"""R → euler, scipy-compatible (ref: angular.py:239-252). [N, 3].

    Implemented for proper sequences (all three axes distinct), which covers
    every use in the reference. Extrinsic 'abc' is the reverse of intrinsic
    'CBA'.
    """
    assert len(seq) == 3
    if not seq.isupper():
        # extrinsic xyz == reversed intrinsic ZYX
        return rotation_matrix_to_euler_angle(r, seq[::-1].upper())[:, ::-1]

    i, j, k = (_AXIS_IDX[ax] for ax in seq)
    assert len({i, j, k}) == 3, "only proper (Tait-Bryan) sequences supported"
    r = r.reshape(-1, 3, 3)
    # parity of the axis permutation
    eps = 1.0 if (i, j, k) in ((0, 1, 2), (1, 2, 0), (2, 0, 1)) else -1.0
    # R = Ri(a) Rj(b) Rk(c);  R[i,k] = eps * sin(b)
    sin_b = jnp.clip(eps * r[:, i, k], -1.0, 1.0)
    b = jnp.arcsin(sin_b)
    # generic case
    a = jnp.arctan2(-eps * r[:, j, k], r[:, k, k])
    c = jnp.arctan2(-eps * r[:, i, j], r[:, i, i])
    # gimbal lock: |sin b| ≈ 1 → fold everything into a, set c = 0 (scipy does this)
    locked = jnp.abs(sin_b) > 1.0 - 1e-7
    a_locked = jnp.arctan2(eps * r[:, j, i], r[:, j, j])
    a = jnp.where(locked, a_locked, a)
    c = jnp.where(locked, 0.0, c)
    return jnp.stack((a, b, c), axis=-1)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def to_rotation_matrix(r: jnp.ndarray, rep: RotationRepresentation) -> jnp.ndarray:
    r"""Convert any representation to rotation matrices (ref: angular.py:31-50)."""
    if rep == RotationRepresentation.AXIS_ANGLE:
        return axis_angle_to_rotation_matrix(r)
    if rep == RotationRepresentation.QUATERNION:
        return quaternion_to_rotation_matrix(r)
    if rep == RotationRepresentation.R6D:
        return r6d_to_rotation_matrix(r)
    if rep == RotationRepresentation.EULER_ANGLE:
        return euler_angle_to_rotation_matrix(r)
    if rep == RotationRepresentation.ROTATION_MATRIX:
        return r.reshape(-1, 3, 3)
    raise ValueError(f"unknown rotation representation: {rep}")


def svd_rotate(source_points: jnp.ndarray, target_points: jnp.ndarray) -> jnp.ndarray:
    r"""Kabsch: rotation mapping source→target point sets (ref: angular.py:102-118).

    Batched jnp SVD with the reflection fix applied branch-free.
    """
    m = jnp.einsum("bmi,bmj->bij", source_points, target_points,
                   precision=jax.lax.Precision.HIGHEST)
    u, _, vt = jnp.linalg.svd(m)
    v = jnp.swapaxes(vt, -1, -2)
    vut = jnp.matmul(v, jnp.swapaxes(u, -1, -2), precision=jax.lax.Precision.HIGHEST)
    det = jnp.linalg.det(vut)
    # flip the last column of v where det < 0
    flip = jnp.where(det < 0, -1.0, 1.0)[..., None]
    v = v.at[..., :, 2].multiply(flip)
    return jnp.matmul(v, jnp.swapaxes(u, -1, -2), precision=jax.lax.Precision.HIGHEST)


def generate_random_rotation_matrix(key: jax.Array, n: int = 1) -> jnp.ndarray:
    r"""Uniform random rotations (ref: angular.py:121-136), via normalized
    Gaussian quaternions (exactly uniform on SO(3), no rejection loop)."""
    q = jax.random.normal(key, (n, 4))
    return quaternion_to_rotation_matrix(q)


# ---------------------------------------------------------------------------
# numpy single-item helpers kept for API parity (ref: general.py:77-103,
# angular.py:271-309) — host-side utility surface, not compute paths
# ---------------------------------------------------------------------------

def vector_cross_matrix_np(x) -> np.ndarray:
    r"""Skew-symmetric matrix for one vector3 (ref: general.py:77-86)."""
    x = np.asarray(x).reshape(3)
    return np.array([[0, -x[2], x[1]],
                     [x[2], 0, -x[0]],
                     [-x[1], x[0], 0]], dtype=float)


def block_diagonal_matrix_np(matrix2d_list) -> np.ndarray:
    r"""Block-diagonal matrix from 2-D blocks (ref: general.py:89-103)."""
    shapes = np.array([np.asarray(m).shape for m in matrix2d_list])
    out = np.zeros(shapes.sum(axis=0))
    r = c = 0
    for m in matrix2d_list:
        m = np.asarray(m)
        lr, lc = m.shape
        out[r:r + lr, c:c + lc] = m
        r += lr
        c += lc
    return out


def rotation_matrix_to_euler_angle_np(r, seq: str = "XYZ") -> np.ndarray:
    r"""R → euler, numpy batch (ref: angular.py:271-282)."""
    return np.asarray(rotation_matrix_to_euler_angle(
        jnp.asarray(np.asarray(r, np.float64).reshape(-1, 3, 3),
                    jnp.float32), seq))


def euler_angle_to_rotation_matrix_np(q, seq: str = "XYZ") -> np.ndarray:
    r"""Euler → R, numpy batch (ref: angular.py:285-296)."""
    return np.asarray(euler_angle_to_rotation_matrix(
        jnp.asarray(np.asarray(q, np.float64).reshape(-1, 3),
                    jnp.float32), seq))


def euler_convert_np(q, from_seq: str = "XYZ", to_seq: str = "XYZ") -> np.ndarray:
    r"""Re-express euler angles in another axis order (ref: angular.py:299-309)
    — closed-form via the rotation matrix, no scipy."""
    q = np.asarray(q, np.float64)
    single = q.ndim == 1
    mats = euler_angle_to_rotation_matrix_np(q.reshape(-1, 3), from_seq)
    out = rotation_matrix_to_euler_angle_np(mats, to_seq)
    return out[0] if single else out.reshape(q.shape)
