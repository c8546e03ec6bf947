r"""Online input pipeline: packed arrays → device batches.

Capability parity with ``datasets.py`` (ref: datasets.py:9-171 —
GraphDataset_tp / Dataset_tp / Dataset_dip), redesigned for TPU:

  * the reference assembles every sample on the CPU inside DataLoader worker
    processes (normalization, graph scatter, gaussian teacher-forcing noise —
    ref: datasets.py:45-73) and ships the result over PCIe; here the packed
    arrays live as plain numpy (host RAM), the sampler yields index slices,
    and ALL per-sample math — (x−μ)/σ, scatter onto the 15-node graph,
    noise via ``jax.random`` — runs **inside the jitted train step** on
    device, where XLA fuses it into the first matmul's prologue;
  * batches have static shapes [B, T=300, ...] (the factory pre-chunks,
    ref: postprocess_data.py:42-43), so one compilation serves the epoch.

Layout of a packed dataset (npz or dict of arrays):
  acc [N, T, 18]  ori [N, T, 54]  pose [N, T, 135]
  leaf_pos [N, T, 5, 3]  full_pos [N, T, 24, 3]
(same content as the reference's ``*_pos.pt``, ref: postprocess_data.py:186).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.ops import rotations as R

__all__ = [
    "normalize_imu", "scatter_graph_inputs", "graph_batch", "flat_batch",
    "dip_batch", "Sampler", "load_packed", "put_device",
    "put_device_sharded", "GraphBatch",
]


# ---------------------------------------------------------------------------
# device-side batch assembly (pure, jit-able)
# ---------------------------------------------------------------------------

def normalize_imu(ori: jnp.ndarray, acc: jnp.ndarray,
                  stats: Optional[Dict[str, jnp.ndarray]]):
    r"""Per-channel (x − μ)/σ (ref: datasets.py:40-43)."""
    if stats is None:
        return ori, acc
    ori = (ori - stats["ori_mean_channel"]) / stats["ori_std_channel"]
    acc = (acc - stats["acc_mean_channel"]) / stats["acc_std_channel"]
    return ori, acc


def scatter_graph_inputs(ori: jnp.ndarray, acc: jnp.ndarray) -> jnp.ndarray:
    r"""Scatter the 5 non-root sensors' (acc3 + ori9) onto the 15-node graph
    (ref: datasets.py:56-59). ori [..., 54], acc [..., 18] → [..., 15, 12]."""
    lead = ori.shape[:-1]
    acc5 = acc.reshape(lead + (6, 3))[..., :5, :]
    ori5 = ori.reshape(lead + (6, 9))[..., :5, :]
    feats = jnp.concatenate((acc5, ori5), axis=-1)            # [..., 5, 12]
    out = jnp.zeros(lead + (15, 12), dtype=ori.dtype)
    return out.at[..., jnp.asarray(JS.input_joints), :].set(feats)


def _scatter_leaf(full_pos: jnp.ndarray) -> jnp.ndarray:
    r"""Scatter the 5 leaf-joint positions onto their reduced-graph nodes
    (ref: datasets.py:61-65). full_pos [..., 24, 3] → [..., 15, 3]."""
    lead = full_pos.shape[:-2]
    out = jnp.zeros(lead + (15, 3), dtype=full_pos.dtype)
    return out.at[..., jnp.asarray(JS.leaf_nodes_reduced), :].set(
        full_pos[..., jnp.asarray(JS.leaf_nodes), :])


GraphBatch = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                   jnp.ndarray, jnp.ndarray]


def pose_to_r6d(pose135: jnp.ndarray) -> jnp.ndarray:
    r"""Reduced-global rotmats [..., 135] → 6D [..., 90]
    (ref: datasets.py:47-48 rotsize=6 path)."""
    lead = pose135.shape[:-1]
    r6d = R.rotation_matrix_to_r6d(pose135.reshape(-1, 3, 3))
    return r6d.reshape(lead + (90,))


def graph_batch(raw: Dict[str, jnp.ndarray],
                stats: Optional[Dict[str, jnp.ndarray]] = None,
                rng: Optional[jax.Array] = None,
                noise_std: float = 0.025,
                rotsize: int = 9) -> GraphBatch:
    r"""Assemble a graph-model batch (ref: datasets.py:45-73).

    :param raw: dict with acc [B,T,18], ori [B,T,54], pose [B,T,135],
        full_pos [B,T,24,3] (root-relative).
    :param rng: teacher-forcing noise key; None ⇒ no noise (validation,
        ref: train_a3gc_tp.py:101-109 feeds clean positions).
    :return: (inputs [B,T,15,12], leaf_pos_input [B,T,15,3],
        full_pos_input [B,T,15,3], leaf_pos [B,T,45], full_pos [B,T,45],
        smpl [B,T,135]).
    """
    ori, acc = normalize_imu(raw["ori"], raw["acc"], stats)
    full_pos = raw["full_pos"]
    if rng is not None:
        noisy = full_pos + noise_std * jax.random.normal(
            rng, full_pos.shape, full_pos.dtype)
    else:
        noisy = full_pos

    inputs = scatter_graph_inputs(ori, acc)
    leaf_pos = _scatter_leaf(full_pos)
    leaf_pos_input = _scatter_leaf(noisy)
    reduced = jnp.asarray(JS.reduced)
    full15 = full_pos[..., reduced, :]
    full15_input = noisy[..., reduced, :]

    B, T = inputs.shape[:2]
    smpl = pose_to_r6d(raw["pose"]) if rotsize == 6 else raw["pose"]
    return (inputs, leaf_pos_input, full15_input,
            leaf_pos.reshape(B, T, 45), full15.reshape(B, T, 45),
            smpl)


def flat_batch(raw: Dict[str, jnp.ndarray],
               stats: Optional[Dict[str, jnp.ndarray]] = None,
               rng: Optional[jax.Array] = None,
               leaf_noise_std: float = 0.04,
               full_noise_std: float = 0.025,
               rotsize: int = 9):
    r"""Assemble a flat TransPose batch (ref: datasets.py:106-125).

    :return: (inputs [B,T,72], leaf_pos_input [B,T,15], full_pos_input
        [B,T,69], leaf_pos [B,T,15], full_pos [B,T,69], smpl [B,T,135]).
    """
    ori, acc = normalize_imu(raw["ori"], raw["acc"], stats)
    leaf = raw["leaf_pos"]                       # [B,T,5,3]
    full = raw["full_pos"][..., 1:, :]           # drop root (ref: :114)
    if rng is not None:
        r1, r2 = jax.random.split(rng)
        leaf_in = leaf + leaf_noise_std * jax.random.normal(
            r1, leaf.shape, leaf.dtype)
        full_in = full + full_noise_std * jax.random.normal(
            r2, full.shape, full.dtype)
    else:
        leaf_in, full_in = leaf, full
    B, T = ori.shape[:2]
    smpl = pose_to_r6d(raw["pose"]) if rotsize == 6 else raw["pose"]
    return (jnp.concatenate((acc, ori), axis=-1),
            leaf_in.reshape(B, T, 15), full_in.reshape(B, T, 69),
            leaf.reshape(B, T, 15), full.reshape(B, T, 69), smpl)


def dip_batch(raw: Dict[str, jnp.ndarray],
              stats: Dict[str, jnp.ndarray],
              no_root: bool = True, rotsize: int = 9):
    r"""Assemble a DIP batch (ref: datasets.py:156-168): drop the root
    sensor's channels, normalize, concat acc‖ori. ``rotsize=6`` converts
    the stored 3x3 targets to 6D, matching the intent of train_dip.py's
    ``--rotsize`` flag (ref: train_dip.py:35,146 — its Dataset_dip call
    passes rotsize=, though the shipped datasets.py ctor has bit-rotted
    and no longer accepts it).

    :return: (inputs [B,T,60], smpl [B,T,...])."""
    ori, acc = raw["ori"], raw["acc"]
    om, os_ = stats["ori_mean_channel"], stats["ori_std_channel"]
    am, as_ = stats["acc_mean_channel"], stats["acc_std_channel"]
    if no_root:
        ori, om, os_ = ori[..., :-9], om[..., :-9], os_[..., :-9]
        acc, am, as_ = acc[..., :-3], am[..., :-3], as_[..., :-3]
    ori = (ori - om) / os_
    acc = (acc - am) / as_
    smpl = pose_to_r6d(raw["pose"]) if rotsize == 6 else raw["pose"]
    return jnp.concatenate((acc, ori), axis=-1), smpl


# ---------------------------------------------------------------------------
# host-side sampling
# ---------------------------------------------------------------------------

def load_packed(path: str) -> Dict[str, np.ndarray]:
    """Load a packed npz dataset into host numpy (mmap-friendly)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def put_device(data: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    r"""Upload a packed corpus to device memory ONCE, for device-resident
    training (``Sampler(device_data=...)`` / ``cli train --device_data``):
    epochs then gather batches BY INDEX inside the jitted step, so the
    per-step host→device traffic drops from tens of MB (the whole batch)
    to a [B] int32 index vector. This is the fix for the feed-bound epoch
    regime measured in docs/validation/TRAIN_FULLSCALE.md (epoch wall 2-6×
    the device-step time at B=256). Costs corpus-size HBM on top of the
    training working set — AMASS-scale (10k × 300-frame chunks) ≈ 3.2 GB
    fp32. Arrays already on device pass through untouched, so one upload
    can be shared by several samplers/runners."""
    _hbm_advisory(data)
    return {k: (v if isinstance(v, jax.Array) else
                jax.device_put(np.ascontiguousarray(v)))
            for k, v in data.items()}


def _hbm_advisory(data, shards: int = 1):
    r"""Print a heads-up when a device-resident corpus will occupy a
    large fraction of HBM: the first OOM then shows up mid-epoch as an
    opaque RESOURCE_EXHAUSTED (measured: 10k-chunk corpus + monolithic
    B=256 bf16 does not fit a 16 GB chip; ``--accum 2`` does)."""
    import sys

    gb = sum(getattr(v, "nbytes", 0) for v in data.values()) / shards / 1e9
    try:
        limit = jax.local_devices()[0].memory_stats().get("bytes_limit", 0)
    except Exception:
        limit = 0
    if limit and gb > 0.15 * limit / 1e9:
        print(f"[a3gc_tpu] device-resident corpus ≈ {gb:.1f} GB of "
              f"{limit / 1e9:.1f} GB HBM per device; if the train step "
              f"OOMs, add --accum 2 (halves activation residency)",
              file=sys.stderr)


def put_device_sharded(data: Dict[str, np.ndarray], mesh
                       ) -> Dict[str, jnp.ndarray]:
    r"""Row-shard a packed corpus over the mesh 'data' axis for
    device-resident MESH training: each chip holds 1/D of the corpus in
    its own HBM (so corpus memory ALSO scales with the mesh, unlike a
    replicated upload) and every train step gathers its local batch rows
    with a shard_map — no per-step host feed, no cross-chip corpus
    traffic. Row count pads up to a multiple of the axis by repeating
    row 0; pad rows are never indexed (``Sampler.iter_indices_sharded``
    excludes them). Pair with ``Sampler(device_data=<this>)`` under a
    mesh runner."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = mesh.shape["data"]
    _hbm_advisory(data, shards=d)
    n = len(next(iter(data.values())))
    n_pad = -(-n // d) * d
    sh = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in data.items():
        if isinstance(v, jax.Array):
            out[k] = v
            continue
        v = np.ascontiguousarray(v)
        if len(v) < n_pad:
            v = np.concatenate([v, np.repeat(v[:1], n_pad - len(v), 0)])
        out[k] = jax.device_put(v, sh)
    return out


class Sampler:
    r"""Epoch sampler over a packed dataset: shuffles sequence indices and
    yields raw [B, T, ...] numpy slices. Replaces the reference's 4-worker
    DataLoader (ref: train_a3gc_tp.py:209-211) — there is nothing to
    parallelize on host since all math moved on-device; slicing contiguous
    numpy is memory-bandwidth only.

    With ``device_data`` (a :func:`put_device` upload of the SAME packed
    dict) the epoch loops in ``train.loop`` switch to the device-resident
    path: they draw ``iter_indices()`` and gather on device, and the host
    arrays here are never materialized into batches.
    """

    def __init__(self, data: Dict[str, np.ndarray], batch_size: int,
                 shuffle: bool = True, drop_remainder: bool = True,
                 seed=0, pad_remainder: bool = False, device_data=None):
        # ``seed`` is anything np.random.default_rng accepts; the training
        # driver passes (base_seed, epoch_salt) so each epoch reshuffles
        # like the reference's DataLoader(shuffle=True) while staying
        # deterministic for resume (ref: train_a3gc_tp.py:209-210)
        #
        # ``pad_remainder``: keep the partial tail batch (the reference's
        # DataLoaders do — ``drop_last`` defaults False,
        # ref: train_a3gc_tp.py:209-221) WITHOUT breaking XLA's static
        # shapes: the tail is padded to ``batch_size`` by cyclically
        # repeating the epoch's sequences, and every yielded batch carries
        # a ``"_weight"`` [B] array (1 real / 0 pad) that the loss uses to
        # reproduce the native-size mean exactly. Full batches carry all-1
        # weights so the jitted step sees ONE input structure.
        self.data = data
        self.device_data = device_data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pad_remainder = pad_remainder
        self.drop_remainder = drop_remainder and not pad_remainder
        self._rng = np.random.default_rng(seed)
        self.n = len(next(iter(data.values())))
        if device_data is not None:
            nd = len(next(iter(device_data.values())))
            # put_device_sharded pads rows up to a multiple of the axis
            assert nd >= self.n and set(device_data) == set(data), (
                "device_data must be put_device(_sharded)() of the same "
                "packed dict")
        if self.drop_remainder and self.n < batch_size:
            raise ValueError(
                f"batch_size {batch_size} exceeds the dataset's "
                f"{self.n} sequences — every epoch would be empty "
                f"(loss 0.0). Lower --batch_size, or pass "
                f"pad_remainder=True (the reference's drop_last=False "
                f"semantics).")

    def __len__(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def iter_indices(self) -> Iterator[Tuple[np.ndarray,
                                             Optional[np.ndarray]]]:
        r"""The epoch's batch INDEX stream: yields ``(take [B] int, weight
        [B] f32 | None)`` with the identical permutation/padding logic as
        ``__iter__`` (which is implemented on top of this) — the contract
        the device-resident path relies on for host==device equality."""
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = (self.n - self.n % self.batch_size
                if self.drop_remainder else self.n)
        for s in range(0, stop, self.batch_size):
            take = idx[s:s + self.batch_size]
            if not self.pad_remainder:
                yield take, None
                continue
            n_real = len(take)
            if n_real < self.batch_size:
                take = np.concatenate(
                    [take, np.resize(idx, self.batch_size - n_real)])
            w = np.zeros(self.batch_size, np.float32)
            w[:n_real] = 1.0
            yield take, w

    def iter_indices_sharded(self, n_shards: int
                             ) -> Iterator[Tuple[np.ndarray,
                                                 Optional[np.ndarray]]]:
        r"""Per-shard epoch index stream for a :func:`put_device_sharded`
        corpus: each shard shuffles ITS OWN rows and contributes B/D rows
        to every batch (the distributed-sampler pattern — per-shard
        shuffling replaces the single-host global shuffle; statistically
        equivalent, not batch-identical). Yields ``(local_idx [D, B/D]``
        — row d holds LOCAL row numbers into shard d — ``, weight
        [D, B/D] | None)``; the assembled batch is shard-major. With
        ``pad_remainder`` every real row appears exactly once per epoch
        with weight 1 and short shards cycle with weight 0; with
        ``drop_remainder`` the epoch stops at the shortest shard's last
        full contribution."""
        d = n_shards
        assert self.batch_size % d == 0, (
            f"batch_size={self.batch_size} must divide over {d} shards")
        assert self.pad_remainder or self.drop_remainder, (
            "sharded sampling needs pad_remainder (weighted tail) or "
            "drop_remainder — a bare variable-size tail can't shard")
        b = self.batch_size // d
        cap = -(-self.n // d)                  # shard row capacity
        real = [min(cap, max(0, self.n - s * cap)) for s in range(d)]
        perms = []
        for s in range(d):
            p = np.arange(real[s])
            if self.shuffle:
                self._rng.shuffle(p)
            perms.append(p)
        if self.drop_remainder:
            steps = min(r // b for r in real)
            if steps == 0:
                raise ValueError(
                    f"sharded epoch is empty: the shortest shard holds "
                    f"fewer than batch_size/{d}={b} rows (shard rows "
                    f"{real}) — every epoch would be a silent no-op. "
                    f"Lower the batch size or use pad_remainder=True.")
        else:
            steps = max(-(-r // b) for r in real)
        for t in range(steps):
            idx = np.zeros((d, b), np.int64)
            w = None if not self.pad_remainder else np.zeros((d, b),
                                                             np.float32)
            for s in range(d):
                sl = perms[s][t * b:(t + 1) * b]
                idx[s, :len(sl)] = sl
                if w is None:
                    continue       # drop_remainder: sl is always full
                if len(sl) < b:    # cycle this shard's rows, weight 0
                    idx[s, len(sl):] = (np.resize(perms[s], b - len(sl))
                                        if len(perms[s]) else 0)
                w[s, :len(sl)] = 1.0
            yield idx, w

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for take, w in self.iter_indices():
            out = {k: v[take] for k, v in self.data.items()}
            if w is not None:
                out["_weight"] = w
            yield out
