r"""Cascade evaluation: variable-length sequences → metrics + reports.

Capability parity with the eval entry points (ref: evaluate_a3gc_tp.py:96-192,
evaluate_tp.py, evaluate_dip.py), redesigned for TPU:

  * the reference evaluates each sequence at batch 1 with a fresh graph
    break between the three stages, IK, and host-side metrics
    (ref: evaluate_a3gc_tp.py:164-179); here the cascade + IK + the full
    metric suite run as ONE jitted program per padded bucket length, with
    frame masking giving native-length-exact results (see layers.bi_rnn);
  * sequences are grouped into power-of-two buckets so a handful of
    compilations serve any test set;
  * per-sequence predictions can be returned for qualitative tooling
    (the reference's ``--save_preds``, ref: evaluate_a3gc_tp.py:155-178).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.data import pipeline as DPipe
from a3gc_tpu.metrics import PoseEvaluator, full_motion_metrics
from a3gc_tpu.models.pipeline import CascadeConfig, cascade_apply
from a3gc_tpu.smpl.model import ParametricModel

__all__ = ["bucket_length", "prepare_graph_inputs", "CascadeEvaluator",
           "evaluate_sequences"]


def bucket_length(n: int, minimum: int = 128) -> int:
    """Round a sequence length up to the next power-of-two bucket."""
    b = minimum
    while b < n:
        b *= 2
    return b


def prepare_graph_inputs(ori: np.ndarray, acc: np.ndarray,
                         stats: Optional[Dict[str, np.ndarray]] = None
                         ) -> np.ndarray:
    r"""Host-side convenience mirroring ``prepare_input``
    (ref: evaluate_a3gc_tp.py:64-94): normalize + scatter one sequence
    [T, 54], [T, 18] → [T, 15, 12]. (The jitted path uses
    data.pipeline.scatter_graph_inputs directly.)"""
    ori = jnp.asarray(ori, jnp.float32)
    acc = jnp.asarray(acc, jnp.float32)
    ori, acc = DPipe.normalize_imu(ori, acc, stats)
    return np.asarray(DPipe.scatter_graph_inputs(ori, acc))


def reduced_to_full(reduced_pose: np.ndarray) -> np.ndarray:
    r"""Ground-truth expansion: 15 reduced rotmats → 24-joint frame with
    identity elsewhere (ref: evaluate_a3gc_tp.py:59-62)."""
    n = reduced_pose.shape[0]
    full = np.tile(np.eye(3, dtype=np.float32), (n, 24, 1, 1))
    full[:, np.asarray(JS.reduced)] = reduced_pose.reshape(n, 15, 3, 3)
    return full


class CascadeEvaluator:
    r"""Evaluates a 3-stage cascade over a set of variable-length sequences.

    One jit cache entry per bucket length; masked metrics make padding
    invisible. Reports the reference's 5-metric table plus throughput.
    """

    def __init__(self, params3: Tuple, cfg: CascadeConfig,
                 model: ParametricModel,
                 stats: Optional[Dict[str, np.ndarray]] = None,
                 normalize: bool = False, fps: int = 60, mesh=None):
        self.params3 = params3
        self.cfg = cfg
        self.model = model
        self.stats = ({k: jnp.asarray(v) for k, v in stats.items()}
                      if (normalize and stats is not None) else None)
        self.fps = fps
        # optional device mesh: evaluate_batched shards the stream axis
        # over 'data' via shard_map (parallel/serving.py) so every device
        # runs its own Pallas kernels on its local streams
        self.mesh = mesh

        @partial(jax.jit, static_argnames=())
        def _run(params3, ori, acc, pose_t_full, n_valid):
            # ori [1,T,54] acc [1,T,18] pose_t_full [T,24,3,3]
            o, a = DPipe.normalize_imu(ori, acc, self.stats)
            if cfg.is_graph:
                imu = DPipe.scatter_graph_inputs(o, a)     # [1,T,15,12]
            else:
                imu = jnp.concatenate((a, o), axis=-1)     # [1,T,72]
            T = imu.shape[1]
            mask = (jnp.arange(T)[None, :] < n_valid).astype(imu.dtype)
            pose_p = cascade_apply(params3, cfg, self.model, imu,
                                   frame_mask=mask)         # [T,24,3,3]
            eye = jnp.eye(3, dtype=pose_p.dtype)
            ign = jnp.asarray(JS.ignored)
            pose_p = pose_p.at[:, ign].set(eye)
            pose_t = pose_t_full.at[:, ign].set(eye)
            errs = full_motion_metrics(
                self.model, pose_p, pose_t, n_valid=n_valid, fps=fps,
                joint_mask=JS.sip_joints)
            metric = jnp.stack((errs[9], errs[3], errs[0] * 100,
                                errs[10] / 1000, errs[4] / 100))
            return metric, pose_p

        self._run = _run

    def evaluate_batched(self, sequences: List[Dict[str, np.ndarray]],
                         streams: int = 8):
        r"""Batched test-set evaluation: sequences are grouped by bucket
        length and evaluated ``streams`` at a time through the multi-stream
        kernel path (per-stream n_valid), cutting the reference's headline
        "offline time" by roughly the stream count. Results are identical to
        per-sequence evaluation (masked state carry + masked metrics).

        :return: (mean metric [5, 2], total seconds, total frames)."""
        fps = self.fps

        def make_runner(S):
            @jax.jit
            def _run_b(params3, ori, acc, pose_t_full, n_valid):
                # ori [S,L,54] acc [S,L,18] pose_t_full [S,L,24,3,3]
                o, a = DPipe.normalize_imu(ori, acc, self.stats)
                if self.cfg.is_graph:
                    imu = DPipe.scatter_graph_inputs(o, a)
                else:
                    imu = jnp.concatenate((a, o), axis=-1)
                L = imu.shape[1]
                mask = (jnp.arange(L)[None, :]
                        < n_valid[:, None]).astype(imu.dtype)
                if self.mesh is not None:
                    from a3gc_tpu.parallel.serving import (
                        cascade_apply_sharded)
                    pose_p = cascade_apply_sharded(
                        params3, self.cfg, self.model, imu,
                        self.mesh, frame_mask=mask)
                else:
                    pose_p = cascade_apply(params3, self.cfg,
                                           self.model, imu,
                                           frame_mask=mask)
                pose_p = pose_p.reshape(S, L, 24, 3, 3)
                eye = jnp.eye(3, dtype=pose_p.dtype)
                ign = jnp.asarray(JS.ignored)
                pose_p = pose_p.at[:, :, ign].set(eye)
                pose_t = pose_t_full.at[:, :, ign].set(eye)

                def one(args):
                    pp, tt, nv = args
                    errs = full_motion_metrics(
                        self.model, pp, tt, n_valid=nv, fps=fps,
                        joint_mask=JS.sip_joints)
                    return jnp.stack((errs[9], errs[3], errs[0] * 100,
                                      errs[10] / 1000, errs[4] / 100))

                # lax.map (a scan), not vmap: vmapping the metrics einsums
                # trips an XLA hlo-verifier bug on this toolchain, and a
                # python loop would retrace the metric suite S times —
                # compile time must stay flat as streams scale to 32+
                return jax.lax.map(one, (pose_p, pose_t, n_valid))

            return _run_b

        runner = make_runner(streams)
        buckets: Dict[int, List[int]] = {}
        for i, s in enumerate(sequences):
            buckets.setdefault(bucket_length(s["ori"].shape[0]), []).append(i)

        metrics: List[Optional[np.ndarray]] = [None] * len(sequences)
        total_time, total_frames = 0.0, 0
        for L, idxs in sorted(buckets.items()):
            for g0 in range(0, len(idxs), streams):
                group = idxs[g0:g0 + streams]
                ori = np.zeros((streams, L, 54), np.float32)
                acc = np.zeros((streams, L, 18), np.float32)
                gt = np.tile(np.eye(3, dtype=np.float32),
                             (streams, L, 24, 1, 1))
                nval = np.zeros((streams,), np.int32)
                for slot, si in enumerate(group):
                    seq = sequences[si]
                    T = seq["ori"].shape[0]
                    ori[slot, :T] = seq["ori"].reshape(T, 54)
                    acc[slot, :T] = seq["acc"].reshape(T, 18)
                    gt[slot, :T] = reduced_to_full(
                        seq["pose"].reshape(T, 15, 3, 3))
                    nval[slot] = T
                t0 = time.perf_counter()
                out = runner(self.params3, jnp.asarray(ori), jnp.asarray(acc),
                             jnp.asarray(gt), jnp.asarray(nval))
                out = np.asarray(out)          # host fetch fences execution
                total_time += time.perf_counter() - t0
                for slot, si in enumerate(group):
                    metrics[si] = out[slot]
                    total_frames += int(nval[slot])
        mean = np.stack([m for m in metrics if m is not None]).mean(axis=0)
        return mean, total_time, total_frames

    def evaluate_streaming(self, sequences: List[Dict[str, np.ndarray]],
                           window: int, lookahead: int = 0,
                           history: int = 0, return_preds: bool = False,
                           batch_streams: int = 1, mesh=None):
        r"""The published-protocol metric table UNDER STREAMING: every
        sequence is fed window-by-window through the deployment path
        (:class:`~a3gc_tpu.eval.streaming.StreamingCascade` — the same
        code ``cli stream``/``serve`` run) with the chosen quality levers
        (``lookahead=K`` future windows / ``history=P`` past-context
        windows), and the emitted poses are scored with the SAME masked
        metric suite as the offline evaluator. This prices a streaming
        config directly in the reference's 5 metrics instead of as
        divergence-vs-offline (the reference's online mode,
        ref: net_aagc.py:802-812, has no quantitative harness at all —
        its metrics, ref: evaluate_a3gc_tp.py:152-187, are offline-only).

        Timing counts the streaming loop only (one warmup stream
        pre-compiles every emission/advance/flush program shape).

        ``batch_streams=S`` multiplexes S sequences per device tick over
        the serving slots (per-slot carried state + active masking —
        :func:`~a3gc_tpu.eval.streaming.streaming_predictions_multi`);
        per-sequence results are equal to the single-slot path, wall
        time drops ~S× on a dispatch-bound link. ``mesh`` additionally
        shards the slots over the mesh's data axis (S must divide).

        :return: (mean metric [5, 2], total seconds, total frames
            [, list of [T,24,3,3] predictions]).
        """
        from a3gc_tpu.eval.streaming import (StreamingCascade,
                                             streaming_predictions,
                                             streaming_predictions_multi)
        sc = StreamingCascade(
            self.params3, self.cfg, self.model, window=window,
            stats=self.stats, normalize=self.stats is not None,
            lookahead=lookahead, history=history,
            streams=batch_streams, mesh=mesh)
        # the SAME reporting evaluator as the offline paths (ignored-joint
        # substitution + 5-metric scaling live in ONE place)
        pe = PoseEvaluator(self.model, fps=self.fps)
        _metrics = jax.jit(pe.__call__)

        # warmup: a (P+K+2)-window zero stream walks every buffer fill
        # level (1..capacity), the fused at-capacity program and the
        # flush program, so the timed loop never compiles
        wT = (history + lookahead + 2) * window
        zero = (np.zeros((wT, 54), np.float32),
                np.zeros((wT, 18), np.float32))
        all_preds = None
        if batch_streams > 1:
            streaming_predictions_multi(sc, [zero] * batch_streams)
            pairs = [(s["ori"].reshape(-1, 54), s["acc"].reshape(-1, 18))
                     for s in sequences]
            t0 = time.perf_counter()
            all_preds = streaming_predictions_multi(sc, pairs)
            mplex_time = time.perf_counter() - t0
        else:
            streaming_predictions(sc, *zero)

        metrics, preds = [], []
        total_time, total_frames = 0.0, 0
        for k, seq in enumerate(sequences):
            T = seq["ori"].shape[0]
            if all_preds is not None:
                pose_p = all_preds[k]
            else:
                t0 = time.perf_counter()
                pose_p = streaming_predictions(
                    sc, seq["ori"].reshape(T, 54), seq["acc"].reshape(T, 18))
                total_time += time.perf_counter() - t0
            total_frames += T
            pad = bucket_length(T) - T
            gt = reduced_to_full(seq["pose"].reshape(T, 15, 3, 3))
            pp = pose_p
            if pad:
                eye = np.tile(np.eye(3, dtype=np.float32),
                              (pad, 24, 1, 1))
                pp = np.concatenate([pose_p.astype(np.float32), eye])
                gt = np.concatenate([gt, eye])
            metrics.append(np.asarray(_metrics(
                jnp.asarray(pp), jnp.asarray(gt), jnp.asarray(T))))
            if return_preds:
                preds.append(pose_p)
        mean = np.stack(metrics).mean(axis=0)
        if all_preds is not None:
            total_time = mplex_time
        out = (mean, total_time, total_frames)
        return out + (preds,) if return_preds else out

    def warmup(self, lengths: Sequence[int]):
        """Pre-compile the bucket lengths (excluded from timing)."""
        for L in sorted({bucket_length(n) for n in lengths}):
            ori = jnp.zeros((1, L, 54), jnp.float32)
            acc = jnp.zeros((1, L, 18), jnp.float32)
            pose = jnp.tile(jnp.eye(3, dtype=jnp.float32), (L, 24, 1, 1))
            jax.block_until_ready(
                self._run(self.params3, ori, acc, pose, jnp.asarray(L)))

    def evaluate(self, sequences: List[Dict[str, np.ndarray]],
                 return_preds: bool = False):
        r"""Evaluate sequences (each: ori [T,54], acc [T,18], pose [T,135]
        reduced global rotmats — the reference test_tp schema,
        ref: evaluate_a3gc_tp.py:147-150).

        :return: (mean metric [5,2] over sequences, total offline seconds,
            total frames[, list of pred poses])."""
        metrics, preds = [], []
        total_time = 0.0
        total_frames = 0
        for seq in sequences:
            T = seq["ori"].shape[0]
            L = bucket_length(T)
            pad = L - T
            ori = np.pad(seq["ori"].reshape(T, 54),
                         ((0, pad), (0, 0)))[None]
            acc = np.pad(seq["acc"].reshape(T, 18),
                         ((0, pad), (0, 0)))[None]
            gt = reduced_to_full(seq["pose"].reshape(T, 15, 3, 3))
            gt = np.concatenate(
                [gt, np.tile(np.eye(3, dtype=np.float32), (pad, 24, 1, 1))])
            t0 = time.perf_counter()
            metric, pose_p = self._run(
                self.params3, jnp.asarray(ori), jnp.asarray(acc),
                jnp.asarray(gt), jnp.asarray(T))
            metric = jax.block_until_ready(metric)
            total_time += time.perf_counter() - t0
            total_frames += T
            metrics.append(np.asarray(metric))
            if return_preds:
                preds.append(np.asarray(pose_p[:T]))
        mean = np.stack(metrics).mean(axis=0)
        out = (mean, total_time, total_frames)
        return out + (preds,) if return_preds else out


class DipEvaluator:
    r"""Single-net DIP evaluation (ref: evaluate_dip.py:60-118): input drops
    the root sensor's channels (acc[..., :-3], ori[..., :-9]), normalizes
    with train stats, runs ONE net, converts reduced rotations → full local
    pose, and reports the 5-metric table."""

    def __init__(self, params, cfg, model: ParametricModel,
                 stats: Dict[str, np.ndarray], fps: int = 60):
        from a3gc_tpu.models.pipeline import (
            pose_net_forward, reduced_global_to_full_local)
        self.params = params
        self.model = model
        self.cfg = cfg
        self.fps = fps

        stats = {k: jnp.asarray(v) for k, v in stats.items()}
        self.stats = stats

        @partial(jax.jit)
        def _run(params, ori, acc, pose_t_full, n_valid):
            imu, _ = DPipe.dip_batch(
                {"ori": ori, "acc": acc, "pose": pose_t_full}, stats,
                no_root=True)
            mask = (jnp.arange(imu.shape[1])[None] < n_valid).astype(
                imu.dtype)
            out, _ = pose_net_forward(params, cfg, imu, frame_mask=mask)
            # rotsize-aware conversion (ref: net_aagc.py:1060-1075 —
            # n_output 90 takes the r6d path, 135 the 3x3 path)
            rep = (3, 3) if cfg.rotsize == 9 else (cfg.rotsize,)
            pose_p = reduced_global_to_full_local(
                out.reshape((-1, JS.n_reduced) + rep), self.model,
                rotsize=cfg.rotsize)
            eye = jnp.eye(3, dtype=pose_p.dtype)
            ign = jnp.asarray(JS.ignored)
            pose_p = pose_p.at[:, ign].set(eye)
            pose_t = pose_t_full.at[:, ign].set(eye)
            errs = full_motion_metrics(
                self.model, pose_p, pose_t, n_valid=n_valid, fps=fps,
                joint_mask=JS.sip_joints)
            return jnp.stack((errs[9], errs[3], errs[0] * 100,
                              errs[10] / 1000, errs[4] / 100))

        self._run = _run

    def evaluate(self, sequences: List[Dict[str, np.ndarray]]):
        metrics = []
        total_time, total_frames = 0.0, 0
        for seq in sequences:
            T = seq["ori"].shape[0]
            L = bucket_length(T)
            pad = L - T
            ori = np.pad(seq["ori"].reshape(T, 54), ((0, pad), (0, 0)))[None]
            acc = np.pad(seq["acc"].reshape(T, 18), ((0, pad), (0, 0)))[None]
            gt = reduced_to_full(seq["pose"].reshape(T, 15, 3, 3))
            gt = np.concatenate(
                [gt, np.tile(np.eye(3, dtype=np.float32), (pad, 24, 1, 1))])
            t0 = time.perf_counter()
            m = self._run(self.params, jnp.asarray(ori), jnp.asarray(acc),
                          jnp.asarray(gt), jnp.asarray(T))
            metrics.append(np.asarray(m))
            total_time += time.perf_counter() - t0
            total_frames += T
        return np.stack(metrics).mean(axis=0), total_time, total_frames

    def evaluate_streaming(self, sequences: List[Dict[str, np.ndarray]],
                           window: int, lookahead: int = 0,
                           history: int = 0, batch_streams: int = 1):
        r"""The 5-metric table through the reference's per-net ONLINE
        mode (ref: net_aagc.py:802-812 — ``forward(imu, rnn_state)`` with
        carried state, run window-by-window; the reference never scores
        it). Input prep is byte-identical to offline evaluation (stats
        normalization + no-root trim on the full sequence); a partial
        final window uses the sensor-hold tail policy of
        :func:`~a3gc_tpu.eval.streaming.streaming_predictions`.

        ``lookahead=K`` / ``history=P`` price the same streaming-quality
        levers as the cascade path on the single-net online mode (its
        bidirectional LSTM has the identical window-seam problem): K
        future windows of backward-direction context per emission (+K
        windows latency), ≤P past windows of leading context (zero
        added latency) — see :class:`~a3gc_tpu.eval.streaming.
        StreamingSession`.

        ``batch_streams=S`` multiplexes S sequences per device tick over
        the serving slots with per-slot active masking and slot
        RECYCLING on ragged test sets
        (:func:`~a3gc_tpu.eval.streaming.streaming_outputs_multi` — the
        same recycle loop as the cascade path); results equal the
        per-sequence path, wall time drops ~S×.

        :return: (mean metric [5, 2], total seconds, total frames)."""
        from a3gc_tpu.eval.streaming import (StreamingSession,
                                             streaming_outputs_multi)
        from a3gc_tpu.models.pipeline import reduced_global_to_full_local

        S = max(1, batch_streams)
        sess = StreamingSession(self.params, self.cfg, window=window,
                                streams=S, lookahead=lookahead,
                                history=history)
        pe = PoseEvaluator(self.model, fps=self.fps)
        _metrics = jax.jit(pe.__call__)
        cfg = self.cfg

        @jax.jit
        def _prep(ori, acc, pose_t_full):
            imu, _ = DPipe.dip_batch(
                {"ori": ori, "acc": acc, "pose": pose_t_full}, self.stats,
                no_root=True)
            return imu

        @jax.jit
        def _to_pose(out):
            rep = (3, 3) if cfg.rotsize == 9 else (cfg.rotsize,)
            return reduced_global_to_full_local(
                out.reshape((-1, JS.n_reduced) + rep), self.model,
                rotsize=cfg.rotsize)

        prepped = []
        for seq in sequences:
            T = seq["ori"].shape[0]
            gt = reduced_to_full(seq["pose"].reshape(T, 15, 3, 3))
            imu = np.asarray(_prep(
                jnp.asarray(seq["ori"].reshape(T, 54)[None]),
                jnp.asarray(seq["acc"].reshape(T, 18)[None]),
                jnp.asarray(gt)))[0]                      # [T, 60]
            prepped.append((imu, gt, T))

        def score(out, gt, T):
            pose_p = _to_pose(jnp.asarray(out))
            pad = bucket_length(T) - T
            eye = jnp.eye(3, dtype=pose_p.dtype)
            if pad:
                pose_p = jnp.concatenate(
                    [pose_p, jnp.tile(eye, (pad, 24, 1, 1))])
                gt = np.concatenate(
                    [gt,
                     np.tile(np.eye(3, dtype=np.float32),
                             (pad, 24, 1, 1))])
            return np.asarray(_metrics(
                pose_p, jnp.asarray(gt), jnp.asarray(T)))

        # warmup: a (P+K+2)-window zero stream per slot walks every
        # buffer fill level, the fused at-capacity program and the
        # flush program, so the timed loop never compiles (the cascade
        # streaming path's warmup policy)
        wT = (history + lookahead + 2) * window
        streaming_outputs_multi(
            sess, [np.zeros((wT, cfg.net.n_input), np.float32)] * S)

        t0 = time.perf_counter()
        outs = streaming_outputs_multi(sess,
                                       [imu for imu, _, _ in prepped])
        total_time = time.perf_counter() - t0

        metrics, total_frames = [], 0
        for out, (_, gt, T) in zip(outs, prepped):
            total_frames += T
            metrics.append(score(out, gt, T))
        return np.stack(metrics).mean(axis=0), total_time, total_frames


def evaluate_sequences(params3, cfg: CascadeConfig, model: ParametricModel,
                       sequences, stats=None, normalize=False,
                       report_path: Optional[str] = None,
                       dataset_name: str = "dataset"):
    r"""One-call evaluation with the reference's text report
    (ref: evaluate_a3gc_tp.py:181-187)."""
    ev = CascadeEvaluator(params3, cfg, model, stats, normalize)
    ev.warmup([s["ori"].shape[0] for s in sequences])
    mean, seconds, frames = ev.evaluate(sequences)
    if report_path:
        from a3gc_tpu.utils import write_eval_report
        write_eval_report(report_path, dataset_name, seconds, mean,
                          PoseEvaluator.METRIC_NAMES)
    return mean, seconds, frames
