r"""The 15-node reduced-skeleton adjacency template.

The reference ships ``nira_template_15_norm.pkl`` — a 15×15 float64
normalized, non-symmetric adjacency of the reduced SMPL skeleton, used to
initialize every graph layer's (learnable) adjacency (ref:
train_a3gc_tp.py:154-156, net_aagc.py:56,88-91). This framework ships the
same numbers as a checked-in ``.npy`` asset (data, not code).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["load_adjacency_template"]

_ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "nira_template_15_norm.npy")


def load_adjacency_template(path: str = None, dtype=np.float32) -> np.ndarray:
    r"""Load the normalized reduced-skeleton adjacency template A₀ [15, 15]."""
    arr = np.load(path or _ASSET)
    return arr.astype(dtype)
