r"""Normalization statistics: computation, storage, and conversion.

Capability parity with ``save_all_stats`` (ref: postprocess_data.py:331-376)
and the ``data/all*_train_stats.pt`` assets. Stored as npz with keys
``{field}_{mean_channel,std_channel,mean_all,std_all}`` for fields
acc(18) / ori(54) / pose(135) / leaf_pos(5,3) / full_pos(24,3).

``convert_torch_stats`` imports the reference's .pt stats files so
reference-normalized checkpoints evaluate identically.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Mapping

import numpy as np

__all__ = ["compute_stats", "save_stats", "load_stats", "convert_torch_stats",
           "StreamingStats"]

STAT_KEYS = ("mean_channel", "std_channel", "mean_all", "std_all")


class StreamingStats:
    r"""One-pass streaming mean/std (Chan's parallel variance), so the data
    factory never has to concatenate every split in RAM like the reference
    does (ref: postprocess_data.py:343-355)."""

    def __init__(self):
        self.n = 0
        self.mean = None
        self.m2 = None

    def update(self, x: np.ndarray):
        """x: [n_samples, ...channel dims]."""
        x = np.asarray(x, np.float64)
        if x.ndim == 1:
            x = x[:, None]
        n_b = x.shape[0]
        mean_b = x.mean(axis=0)
        m2_b = ((x - mean_b) ** 2).sum(axis=0)
        if self.mean is None:
            self.n, self.mean, self.m2 = n_b, mean_b, m2_b
            return
        delta = mean_b - self.mean
        n = self.n + n_b
        self.mean = self.mean + delta * (n_b / n)
        self.m2 = self.m2 + m2_b + delta ** 2 * (self.n * n_b / n)
        self.n = n

    def finalize(self, ddof: int = 1):
        """(mean_channel, std_channel) with torch-matching ddof=1."""
        std = np.sqrt(self.m2 / max(self.n - ddof, 1))
        return self.mean, std


def compute_stats(arrays: Mapping[str, Iterable[np.ndarray]]) -> Dict[str, np.ndarray]:
    r"""Per-channel and global mean/std per field (ref:
    postprocess_data.py:357-370). ``arrays[field]`` iterates [Ni, ...] chunks;
    frames are concatenated along axis 0 statistically (streaming)."""
    out = {}
    for field, chunks in arrays.items():
        ch = StreamingStats()
        al = StreamingStats()
        for c in chunks:
            c = np.asarray(c)   # [frames, ...channel dims]
            ch.update(c)
            al.update(c.reshape(-1, 1))
        mean_c, std_c = ch.finalize()
        mean_a, std_a = al.finalize()
        out[f"{field}_mean_channel"] = mean_c.astype(np.float32)
        out[f"{field}_std_channel"] = std_c.astype(np.float32)
        out[f"{field}_mean_all"] = np.float32(mean_a[0])
        out[f"{field}_std_all"] = np.float32(std_a[0])
    return out


def save_stats(stats: Mapping[str, np.ndarray], path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **stats)
    return path


def load_stats(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def convert_torch_stats(pt_path: str, npz_path: str) -> str:
    r"""Convert a reference ``all*_train_stats.pt`` (ref schema:
    {field: {mean_channel, std_channel, mean_all, std_all}},
    postprocess_data.py:357-375) into this framework's npz layout."""
    import torch

    data = torch.load(pt_path, map_location="cpu", weights_only=False)
    flat = {}
    for field, entry in data.items():
        for k in STAT_KEYS:
            flat[f"{field}_{k}"] = np.asarray(entry[k], np.float32)
    return save_stats(flat, npz_path)
