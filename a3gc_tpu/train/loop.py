r"""Training: jitted per-batch steps, per-stage epoch driver, early stopping.

Capability parity with the reference trainers (ref: train_a3gc_tp.py:45-312,
train_dip.py:37-193), redesigned for TPU:

  * ONE jit-compiled ``train_step`` per stage fuses batch assembly
    (normalization, graph scatter, teacher-forcing noise), the forward pass,
    the loss, backward, and the Adam update — the reference crosses the
    host↔device boundary per batch with CPU-side assembly
    (ref: train_a3gc_tp.py:57-68);
  * the batch axis is sharded over the mesh's ``data`` axis; gradients are
    combined by XLA-inserted psums (no DDP analogue needed);
  * optimizer semantics match torch exactly: Adam with L2-into-gradient
    weight decay (torch style, not AdamW) and per-epoch ExponentialLR γ=0.8
    (ref: train_a3gc_tp.py:234-239); AGC's shared adjacency is frozen via an
    optax mask like the reference's ``requires_grad=False``
    (ref: net_aagc.py:238).

Stage input wiring (ref: train_a3gc_tp.py:57-65 train / :101-109 valid):
  stage 1: inputs = imu,                        target = leaf positions
  stage 2: inputs = imu ‖ noisy leaf positions, target = all positions
  stage 3: inputs = imu ‖ noisy all positions,  target = rotations
Validation feeds *clean* positions.
"""

from __future__ import annotations

import dataclasses
import inspect
import time
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from a3gc_tpu.config import TrainConfig
from a3gc_tpu.data import pipeline as DP
from a3gc_tpu.models import cells as C
from a3gc_tpu.models.pipeline import PoseNetConfig, pose_loss, pose_net_forward

__all__ = [
    "TrainState", "make_optimizer", "StageRunner", "run_cascade_training",
    "stage_inputs_graph", "stage_inputs_flat", "GracefulInterrupt",
]


class GracefulInterrupt:
    r"""Cooperative SIGTERM/SIGINT stop for preemption-safe training.

    TPU pool preemptions deliver SIGTERM with a grace window; the
    reference has no story for it (a signal mid-epoch loses everything
    since its last improvement save, ref: train_a3gc_tp.py:241-312).
    Wrap training in this context manager and pass it to
    :func:`run_cascade_training`: the first signal makes training stop
    at the next step boundary, write a checkpoint of the CURRENT params
    through the normal save path, log an ``"interrupted"`` event, and
    return cleanly — ``--resume`` picks the run back up. A second
    signal restores the previous handler and re-raises (escape hatch
    for a stuck save).

    Handlers only install in the main thread (signal-module rule);
    elsewhere the instance is inert and ``triggered`` stays False.
    """

    def __init__(self, signums=None):
        import signal
        self.signums = tuple(signums or (signal.SIGTERM, signal.SIGINT))
        self.triggered = False
        self._prev = {}

    def __call__(self) -> bool:
        return self.triggered

    def __enter__(self):
        import signal
        import threading
        if threading.current_thread() is threading.main_thread():
            for s in self.signums:
                self._prev[s] = signal.signal(s, self._handle)
        return self

    def _handle(self, signum, frame):
        import signal
        if self.triggered:              # second signal: hard escape
            signal.signal(signum, self._prev.get(signum,
                                                 signal.SIG_DFL))
            raise KeyboardInterrupt
        self.triggered = True

    def __exit__(self, *exc):
        import signal
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev.clear()
        return False


@struct.dataclass
class TrainState:
    params: object
    opt_state: object
    step: jnp.ndarray


def _donate_state():
    r"""Donation spec for the train step's TrainState argument. Empty when
    jax_debug_nans is active: the flag's eager NaN-locating re-run reads
    the original inputs, which donation would already have deleted.

    NOTE: evaluated once at RUNNER CONSTRUCTION (the jit decorator is
    applied in ``__init__``) — enable jax_debug_nans BEFORE building a
    StageRunner/DIPRunner; flipping it afterwards does not un-donate."""
    return () if jax.config.jax_debug_nans else (0,)


def _gather_batch(data, take, weight):
    r"""Assemble a raw batch from a device-resident corpus: gather rows
    by index, attach the padded-tail weight when present. The ONE place
    the device-resident batch structure is defined — train, eval, and
    sharded paths all reuse it."""
    raw = {k: v[take] for k, v in data.items()}
    if weight is not None:
        raw["_weight"] = weight
    return raw


def _make_eval_step_dev(eval_step):
    r"""Device-resident eval step: gather-by-index wrapper around a
    runner's jitted ``eval_step``."""
    @jax.jit
    def eval_step_dev(params, data, take, weight):
        return eval_step(params, _gather_batch(data, take, weight))
    return eval_step_dev


def _make_train_step(loss_fn, optimizer, accum_steps: int = 1,
                     gather: bool = False, multi: bool = False):
    r"""Build the jitted per-batch train step.

    ``accum_steps=1``: one fused program — value_and_grad + Adam update.

    ``accum_steps=k>1``: microbatch gradient accumulation — the [B, ...]
    batch splits into k sequential microbatches of B/k inside a
    ``lax.scan``, so peak activation memory is that of ONE microbatch
    while the single Adam update sees the exact mean-of-microbatch
    gradients. Because the loss is a mean over batch elements and the
    microbatches are equal-sized, the accumulated gradient equals the
    full-batch gradient (up to summation order), reaching effective
    batch sizes past the activation-memory OOM knee (B=512 OOMs
    monolithically on a 16 GB chip; k=2 halves the residency). The rng
    splits per microbatch, so dropout/noise draws differ from the
    monolithic step's — same distribution, different stream.

    When the batch carries a ``"_weight"`` array (padded tail batch, see
    :class:`a3gc_tpu.data.pipeline.Sampler`) microbatch gradients combine
    weighted by their real-sample counts — the result is exactly the
    weighted-mean gradient of the whole batch, even when the pad samples
    land unevenly across microbatches.

    ``gather=True`` builds the device-resident-corpus variant: signature
    ``(state, data, take, weight, rng)`` where ``data`` is a
    :func:`a3gc_tpu.data.pipeline.put_device` upload and ``take`` a [B]
    index vector — the batch is gathered ON DEVICE, so the per-step
    host→device transfer is just the indices (see ``--device_data``).

    ``multi=True`` (implies the gathered corpus layout) builds the
    multi-step-per-dispatch variant: signature ``(state, data,
    takes [M,B], weights [M,B]|None, rng, offsets [M])`` runs M
    consecutive optimizer steps as ONE ``lax.scan`` inside ONE jit call
    and returns ``(state, losses [M])``. Per-step keys are
    ``fold_in(rng, offsets[i])`` computed in-jit, so the parameter
    trajectory is that of M sequential ``gather=True`` calls — but the
    host pays one dispatch instead of M. This is the lever for the
    dispatch-bound regime (small batches through a relay-attached TPU:
    the reference-protocol b=16 config runs 625 steps/epoch, each
    paying the ~30 ms relay round trip — see
    docs/validation/DEVICE_DATA_b16.md)."""
    def _single_core(state: TrainState, raw, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, raw, rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def _accum_step(state: TrainState, raw, rng):
        k = accum_steps
        weighted = "_weight" in raw         # static per input structure
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:]), raw)
        rngs = jax.random.split(rng, k)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, inp):
            mb, r = inp
            loss, grads = jax.value_and_grad(loss_fn)(state.params, mb, r)
            # each microbatch loss/grad is a mean over its real samples;
            # scaling by that count makes the accumulated result the exact
            # full-batch weighted mean
            w = jnp.sum(mb["_weight"]) if weighted else 1.0
            c_loss, c_w, c_grads = carry
            return (c_loss + loss * w, c_w + w,
                    jax.tree_util.tree_map(
                        lambda c, g: c + g * w, c_grads, grads)), None

        (loss_sum, w_sum, grad_sum), _ = jax.lax.scan(
            body, (jnp.zeros(()), jnp.zeros(()), zeros), (micro, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / w_sum, grad_sum)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                loss_sum / w_sum)

    core = _single_core if accum_steps == 1 else _accum_step

    if multi:
        @partial(jax.jit, donate_argnums=_donate_state())
        def multi_step(state: TrainState, data, takes, weights, rng,
                       offsets):
            def body(st, inp):
                take, off, w = inp if weights is not None else (*inp, None)
                return core(st, _gather_batch(data, take, w),
                            jax.random.fold_in(rng, off))
            xs = ((takes, offsets, weights) if weights is not None
                  else (takes, offsets))
            return jax.lax.scan(body, state, xs)
        return multi_step
    if gather:
        @partial(jax.jit, donate_argnums=_donate_state())
        def train_step(state: TrainState, data, take, weight, rng):
            return core(state, _gather_batch(data, take, weight), rng)
        return train_step
    return partial(jax.jit, donate_argnums=_donate_state())(core)


def _make_caster(train_cfg: TrainConfig):
    r"""Mixed precision (the reference's --half flag, ref:
    train_a3gc_tp.py:24-25 — except bf16 and with fp32 master params, which
    is the TPU-correct version of it): cast fp32 leaves to bf16 for the
    forward/backward; the optimizer update stays fp32."""
    if train_cfg.dtype != "bfloat16":
        return lambda tree: tree
    return lambda tree: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, tree)


def _adjacency_freeze_mask(params, cfg: PoseNetConfig):
    r"""True = trainable. Freezes the AGC cells' shared adjacency
    (requires_grad=False in the reference, ref: net_aagc.py:238)."""
    if not (cfg.is_graph and cfg.net.cell == "agc"):
        return jax.tree_util.tree_map(lambda _: True, params)

    def mark(p):
        return jax.tree_util.tree_map(lambda _: True, p)

    def mark_cell(cell: C.GCNLSTMCellParams):
        return dataclasses.replace(mark(cell), adj=False)

    m = mark(params)
    return dataclasses.replace(
        m, rnn1=mark_cell(params.rnn1), rnn2=mark_cell(params.rnn2))


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int,
                   params=None, stage_cfg: Optional[PoseNetConfig] = None):
    r"""torch-equivalent Adam + per-epoch ExponentialLR(γ)
    (ref: train_a3gc_tp.py:234-239). A nonzero ``start_epoch`` fast-forwards
    the schedule like the reference's resume path
    (ref: train_a3gc_tp.py:287-290 — which the reference only applies to
    stage 3 and crashes on in two trainers via the ``sheduler3`` typo; here
    it works uniformly)."""
    base = optax.exponential_decay(
        init_value=cfg.lr, transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.lr_decay, staircase=True)
    offset = cfg.start_epoch * max(steps_per_epoch, 1)
    schedule = (base if offset == 0
                else (lambda step: base(step + offset)))
    chain = []
    if cfg.weight_decay:
        # torch Adam folds weight decay into the gradient (L2), unlike AdamW
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain += [optax.scale_by_adam(), optax.scale_by_learning_rate(schedule)]
    opt = optax.chain(*chain)
    if params is not None and stage_cfg is not None:
        mask = _adjacency_freeze_mask(params, stage_cfg)
        opt = optax.multi_transform(
            {True: opt, False: optax.set_to_zero()}, mask)
    return opt


# ---------------------------------------------------------------------------
# stage input wiring
# ---------------------------------------------------------------------------

def stage_inputs_graph(batch: DP.GraphBatch, stage: int, train: bool):
    r"""Graph-model wiring (ref: train_a3gc_tp.py:57-65 / :101-109)."""
    imu, leaf_in, full_in, leaf, full, smpl = batch
    B, T = imu.shape[:2]
    if stage == 1:
        return imu, leaf
    if stage == 2:
        pos = leaf_in if train else leaf.reshape(B, T, 15, 3)
        return jnp.concatenate((imu, pos), axis=-1), full
    pos = full_in if train else full.reshape(B, T, 15, 3)
    return jnp.concatenate((imu, pos), axis=-1), smpl


def stage_inputs_flat(batch, stage: int, train: bool):
    r"""Flat TransPose wiring (ref: train_tp.py:57-65 / :105-112)."""
    imu, leaf_in, full_in, leaf, full, smpl = batch
    if stage == 1:
        return imu, leaf
    if stage == 2:
        pos = leaf_in if train else leaf
        return jnp.concatenate((imu, pos), axis=-1), full
    pos = full_in if train else full
    return jnp.concatenate((imu, pos), axis=-1), smpl


# ---------------------------------------------------------------------------
# per-stage runner
# ---------------------------------------------------------------------------

def _mesh_eval_chunk(eval_b: int, mesh) -> int:
    r"""Eval chunks flow through ``shard_batch``: their leading axis must
    divide evenly over the mesh 'data' axis, so round the chunk size down
    to a multiple of it (minimum one sample per data shard). Without this
    a ``--mesh --eval_batch`` run would crash at the first validation
    pass — after a full training epoch's work."""
    if mesh is None:
        return eval_b
    d = mesh.shape.get("data", 1)
    return max(d, eval_b // d * d)


class StageRunner:
    r"""Owns the jitted train/eval steps of one cascade stage."""

    def __init__(self, stage: int, stage_cfg: PoseNetConfig, params,
                 train_cfg: TrainConfig, steps_per_epoch: int,
                 stats: Optional[Dict[str, jnp.ndarray]] = None,
                 graph: bool = True,
                 mesh=None):
        self.stage = stage
        self.stage_cfg = stage_cfg
        self.cfg = train_cfg
        self.stats = stats if train_cfg.normalize else None
        self.graph = graph
        self.mesh = mesh
        self.optimizer = make_optimizer(train_cfg, steps_per_epoch, params,
                                        stage_cfg)
        # private copy: train_step donates the state, which would otherwise
        # delete the caller's aliased param buffers after the first step
        params = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
        opt_state = self.optimizer.init(params)
        if mesh is not None:
            # DP: batch over 'data' (see _put); TP: wide gate/feature
            # kernels split over 'model' (param_sharding policy) — the
            # Adam moments follow the same policy since they share the
            # parameter shapes. XLA inserts the collectives.
            from a3gc_tpu.parallel import shard_params
            params = shard_params(params, mesh)
            opt_state = shard_params(opt_state, mesh)
        self.state = TrainState(params=params,
                                opt_state=opt_state,
                                step=jnp.zeros((), jnp.int32))

        assemble = DP.graph_batch if graph else DP.flat_batch
        wire = stage_inputs_graph if graph else stage_inputs_flat
        noise_kw = ({"noise_std": train_cfg.full_noise_std} if graph else
                    {"leaf_noise_std": train_cfg.leaf_noise_std,
                     "full_noise_std": train_cfg.full_noise_std})
        noise_kw["rotsize"] = stage_cfg.rotsize if stage == 3 else 9

        _cast = _make_caster(train_cfg)

        def loss_fn(params, raw, rng):
            raw = dict(raw)
            weight = raw.pop("_weight", None)  # padded-tail batch (Sampler)
            rng_noise, rng_drop = jax.random.split(rng)
            batch = assemble(raw, self.stats, rng_noise, **noise_kw)
            inputs, target = wire(batch, stage, train=True)
            pred, _ = pose_net_forward(_cast(params), stage_cfg,
                                       _cast(inputs), rng=rng_drop)
            return pose_loss(
                pred.reshape(target.shape).astype(jnp.float32), target,
                sample_weight=weight)

        # the old TrainState is dead after every step (train_epoch
        # rebinds), so donate it: params + Adam moments update in place
        # instead of double-buffering — lower peak HBM at large batch.
        # Not under jax_debug_nans: its eager NaN-locating re-run would
        # read the already-deleted donated buffers.
        assert train_cfg.batch_size % train_cfg.accum_steps == 0, (
            f"accum_steps={train_cfg.accum_steps} must divide "
            f"batch_size={train_cfg.batch_size}")
        if mesh is not None:
            d = mesh.shape.get("data", 1)
            assert train_cfg.batch_size % d == 0, (
                f"batch_size={train_cfg.batch_size} must divide evenly "
                f"over the mesh data axis ({d} devices)")
        self._loss_fn = loss_fn
        self.train_step = _make_train_step(loss_fn, self.optimizer,
                                           train_cfg.accum_steps)
        self.train_step_dev = _make_train_step(loss_fn, self.optimizer,
                                               train_cfg.accum_steps,
                                               gather=True)
        self.train_step_multi = _make_train_step(loss_fn, self.optimizer,
                                                 train_cfg.accum_steps,
                                                 multi=True)

        @jax.jit
        def eval_step(params, raw):
            # same compute dtype as the train forward (fp32 loss), so the
            # early-stopping signal tracks what training actually optimizes
            raw = dict(raw)
            weight = raw.pop("_weight", None)
            batch = assemble(raw, self.stats, None, **noise_kw)
            inputs, target = wire(batch, stage, train=False)
            pred, _ = pose_net_forward(_cast(params), stage_cfg,
                                       _cast(inputs))
            return pose_loss(
                pred.reshape(target.shape).astype(jnp.float32), target,
                sample_weight=weight)

        self.eval_step = eval_step
        self.eval_step_dev = _make_eval_step_dev(eval_step)
        self._eval_b = _mesh_eval_chunk(
            train_cfg.eval_batch_size or min(train_cfg.batch_size, 128),
            mesh)

    def _put(self, raw: Dict[str, np.ndarray]):
        if self.mesh is not None:
            from a3gc_tpu.parallel import shard_batch
            return shard_batch(raw, self.mesh)
        return raw

    def _device_sharded_steps(self):
        r"""Jitted steps for a :func:`put_device_sharded` corpus on a
        mesh: a shard_map gathers each shard's B/D batch rows from ITS
        OWN corpus shard (local [N/D] rows, local indices — no
        cross-chip corpus traffic), producing the [B]-over-'data' batch
        layout the mesh loss path already expects. Built lazily, cached."""
        if getattr(self, "_dev_sharded", None) is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from a3gc_tpu.parallel import shard_map_compat

            mesh = self.mesh
            idx_sh = NamedSharding(mesh, P("data"))
            midx_sh = NamedSharding(mesh, P(None, "data"))  # [M, D, b]

            def gather(data, idx):
                def local(blk, i):
                    return jax.tree_util.tree_map(lambda v: v[i[0]], blk)
                return shard_map_compat(
                    local, mesh, in_specs=(P("data"), P("data")),
                    out_specs=P("data"))(data, idx)

            loss_fn, optimizer = self._loss_fn, self.optimizer
            k = self.cfg.accum_steps

            def _update(state, loss, grads):
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(params, opt_state, state.step + 1),
                        loss)

            def core(state, data, idx, weight, rng):
                if k == 1:
                    raw = gather(data, idx)
                    if weight is not None:
                        raw["_weight"] = weight.reshape(-1)
                    loss, grads = jax.value_and_grad(loss_fn)(
                        state.params, raw, rng)
                    return _update(state, loss, grads)
                # --accum composes with the sharded corpus: each scan
                # iteration gathers ITS OWN B/k microbatch rows (each
                # shard contributes b/k of its local rows, so every
                # microbatch stays 'data'-sharded with no cross-chip
                # corpus traffic) — peak activation memory is one
                # microbatch, and the weighted accumulation is the same
                # exact-mean math as _make_train_step's _accum_step.
                D, b = idx.shape
                idxs = jnp.moveaxis(
                    idx.reshape(D, k, b // k), 1, 0)    # [k, D, b/k]
                ws = (None if weight is None
                      else jnp.moveaxis(
                          weight.reshape(D, k, b // k), 1, 0))
                rngs = jax.random.split(rng, k)
                zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                               state.params)

                def body(carry, inp):
                    if ws is not None:
                        i, w_mb, r = inp
                    else:
                        (i, r), w_mb = inp, None
                    raw = gather(data, i)
                    if w_mb is not None:
                        raw["_weight"] = w_mb.reshape(-1)
                    loss, grads = jax.value_and_grad(loss_fn)(
                        state.params, raw, r)
                    w = jnp.sum(w_mb) if w_mb is not None else 1.0
                    c_loss, c_w, c_grads = carry
                    return (c_loss + loss * w, c_w + w,
                            jax.tree_util.tree_map(
                                lambda c, g: c + g * w, c_grads,
                                grads)), None

                xs = (idxs, ws, rngs) if ws is not None else (idxs, rngs)
                (loss_sum, w_sum, grad_sum), _ = jax.lax.scan(
                    body, (jnp.zeros(()), jnp.zeros(()), zeros), xs)
                grads = jax.tree_util.tree_map(lambda g: g / w_sum,
                                               grad_sum)
                return _update(state, loss_sum / w_sum, grads)

            train_step = partial(jax.jit,
                                 donate_argnums=_donate_state())(core)

            @partial(jax.jit, donate_argnums=_donate_state())
            def multi_step(state, data, idxs, weights, rng, offsets):
                # M sharded steps per dispatch (see _make_train_step's
                # ``multi`` doc): idxs [M, D, b] sharded P(None, 'data'),
                # the shard_map gather runs inside the scan body
                def body(st, inp):
                    idx, off, w = (inp if weights is not None
                                   else (*inp, None))
                    return core(st, data, idx, w,
                                jax.random.fold_in(rng, off))
                xs = ((idxs, offsets, weights) if weights is not None
                      else (idxs, offsets))
                return jax.lax.scan(body, state, xs)

            eval_core = self.eval_step

            @jax.jit
            def eval_step(params, data, idx, weight):
                raw = gather(data, idx)
                if weight is not None:
                    raw["_weight"] = weight
                return eval_core(params, raw)

            self._dev_sharded = (train_step, eval_step, idx_sh,
                                 multi_step, midx_sh)
        return self._dev_sharded

    def train_epoch(self, sampler: DP.Sampler, rng: jax.Array) -> float:
        # losses stay on device until the epoch ends: a per-step float()
        # would block the host on every step, serializing the next batch's
        # host->device transfer behind the current step's execution (jax
        # dispatch and transfers are async). Deferring the fetch lets the
        # feed pipeline overlap compute — on a relay-attached TPU the
        # difference is the whole transfer time per step.
        losses = []
        # cooperative preemption stop (GracefulInterrupt), single-process
        # only: multi-host runs must stop at the SAME step everywhere, so
        # they check at synced epoch boundaries (run_cascade_training)
        stop = getattr(self, "interrupt", None)
        _stopped = (lambda: False) if stop is None else stop
        dd = getattr(sampler, "device_data", None)
        if dd is not None and self.mesh is not None:
            # sharded device-resident corpus (put_device_sharded): each
            # chip holds N/D rows and gathers its own B/D batch rows;
            # --accum microbatches the gather itself (see
            # _device_sharded_steps), so each shard's local rows must
            # split evenly into accum_steps microbatches
            assert (self.cfg.batch_size
                    % (self.mesh.shape.get("data", 1)
                       * self.cfg.accum_steps) == 0), (
                f"batch_size={self.cfg.batch_size} must divide evenly "
                f"over data axis x accum_steps "
                f"({self.mesh.shape.get('data', 1)} x "
                f"{self.cfg.accum_steps})")
            spec = getattr(next(iter(dd.values())).sharding, "spec", ())
            assert len(spec) and spec[0] == "data", (
                "a mesh runner needs a put_device_sharded(...) corpus "
                "(row-sharded over the 'data' axis); an unsharded "
                "put_device upload would be re-sharded on every step")
            d = self.mesh.shape.get("data", 1)
            tstep, _, idx_sh, tmulti, midx_sh = \
                self._device_sharded_steps()
            m = self.cfg.steps_per_dispatch
            pairs = (list(sampler.iter_indices_sharded(d)) if m > 1
                     else sampler.iter_indices_sharded(d))
            i = 0
            if m > 1:
                while i + m <= len(pairs) and not _stopped():
                    group = pairs[i:i + m]
                    idxs = np.stack([t for t, _ in group]).astype(np.int32)
                    weights = (None if group[0][1] is None else
                               np.stack([w for _, w in group]))
                    self.state, ls = tmulti(
                        self.state, dd, jax.device_put(idxs, midx_sh),
                        weights, rng, np.arange(i, i + m, dtype=np.int32))
                    losses.append(ls)                   # [m] losses
                    i += m
                pairs = pairs[i:]
            for j, (idx, w) in enumerate(pairs, start=i):
                if _stopped():
                    break
                self.state, loss = tstep(
                    self.state, dd,
                    jax.device_put(np.asarray(idx, np.int32), idx_sh),
                    None if w is None else w.reshape(-1),
                    jax.random.fold_in(rng, j))
                losses.append(loss)
        elif dd is not None:
            # device-resident corpus: gather by index inside the step —
            # the per-step host→device transfer is a [B] index vector.
            # steps_per_dispatch>1 additionally folds M consecutive steps
            # into one lax.scan dispatch (same parameter trajectory; see
            # _make_train_step) — the fix for the dispatch-bound small-
            # batch regime; the epoch tail (< M steps) falls back to the
            # per-step program.
            m = self.cfg.steps_per_dispatch
            pairs = (list(sampler.iter_indices()) if m > 1
                     else sampler.iter_indices())
            i = 0
            if m > 1:
                while i + m <= len(pairs) and not _stopped():
                    group = pairs[i:i + m]
                    if any(np.shape(t) != np.shape(group[0][0])
                           for t, _ in group):
                        # ragged tail take (pad_remainder=False) inside
                        # the group: np.stack would raise — the per-step
                        # tail loop below handles any batch shape
                        break
                    takes = np.stack([t for t, _ in group]).astype(np.int32)
                    weights = (None if group[0][1] is None else
                               np.stack([w for _, w in group]))
                    self.state, ls = self.train_step_multi(
                        self.state, dd, takes, weights, rng,
                        np.arange(i, i + m, dtype=np.int32))
                    losses.append(ls)                       # [m] losses
                    i += m
                pairs = pairs[i:]
            for j, (take, w) in enumerate(pairs, start=i):
                if _stopped():
                    break
                self.state, loss = self.train_step_dev(
                    self.state, dd, jnp.asarray(take, jnp.int32), w,
                    jax.random.fold_in(rng, j))
                losses.append(loss)
        else:
            for i, raw in enumerate(sampler):
                if _stopped():
                    break
                self.state, loss = self.train_step(
                    self.state, self._put(raw), jax.random.fold_in(rng, i))
                losses.append(loss)
        if not losses:
            return 0.0
        # scalars (per-step programs) and [m] vectors (multi-step scans)
        return float(jnp.mean(jnp.concatenate(
            [jnp.atleast_1d(loss) for loss in losses])))

    def eval_epoch(self, sampler: DP.Sampler) -> float:
        r"""Validation pass in chunks of ``eval_batch_size`` (auto-capped —
        see :class:`TrainConfig`): the eval forward has no remat and hoists
        the bidirectional input projections, so an uncapped large-batch
        validation OOMs where training fits. The chunked loss is the exact
        size-weighted mean of the monolithic one; fetches stay deferred.
        Padded tail batches (Sampler ``pad_remainder``) weight each chunk
        by its REAL sample count, so the result is the mean over the
        dataset's native size — the reference's drop_last=False
        validation semantics (ref: train_a3gc_tp.py:218-221)."""
        losses, weights = [], []
        dd = getattr(sampler, "device_data", None)
        if dd is not None and self.mesh is not None:
            spec = getattr(next(iter(dd.values())).sharding, "spec", ())
            assert len(spec) and spec[0] == "data", (
                "a mesh runner needs a put_device_sharded(...) corpus "
                "(row-sharded over the 'data' axis); an unsharded "
                "put_device upload would be re-sharded on every chunk")
            d = self.mesh.shape.get("data", 1)
            _, estep, idx_sh = self._device_sharded_steps()[:3]
            ebl = max(1, self._eval_b // d)    # per-shard chunk rows
            for idx, w_all in sampler.iter_indices_sharded(d):
                b = idx.shape[1]
                for s in range(0, b, ebl):
                    tk = idx[:, s:s + ebl]
                    wc = (None if w_all is None
                          else w_all[:, s:s + ebl])
                    n = (float(wc.sum()) if wc is not None
                         else tk.shape[1] * d)
                    if n == 0:
                        continue
                    losses.append(estep(
                        self.state.params, dd,
                        jax.device_put(np.asarray(tk, np.int32),
                                       idx_sh),
                        None if wc is None else wc.reshape(-1)))
                    weights.append(n)
        elif dd is not None:
            for take, w_all in sampler.iter_indices():
                B = len(take)
                for s in range(0, B, self._eval_b):
                    tk = take[s:s + self._eval_b]
                    wc = None if w_all is None else w_all[s:s + self._eval_b]
                    n = (float(wc.sum()) if wc is not None
                         else min(self._eval_b, B - s))
                    if n == 0:
                        continue
                    losses.append(self.eval_step_dev(
                        self.state.params, dd, jnp.asarray(tk, jnp.int32),
                        wc))
                    weights.append(n)
        else:
            for raw in sampler:
                B = len(next(iter(raw.values())))
                w_all = raw.get("_weight")
                for s in range(0, B, self._eval_b):
                    chunk = {k: v[s:s + self._eval_b]
                             for k, v in raw.items()}
                    n = (float(w_all[s:s + self._eval_b].sum())
                         if w_all is not None else min(self._eval_b, B - s))
                    if n == 0:
                        continue    # all-pad chunk: nothing real to score
                    losses.append(self.eval_step(self.state.params,
                                                 self._put(chunk)))
                    weights.append(n)
        if not losses:
            return 0.0
        w = jnp.asarray(weights, jnp.float32)
        return float(jnp.stack(losses) @ w / w.sum())

    def eval_full_sequences(self, sequences, batch: int = None) -> float:
        r"""Full-sequence validation (the reference's ``--fse`` flag,
        ref: train_a3gc_tp.py:18,212-216): each variable-length sequence
        is evaluated at its native length on an end-padded power-of-two
        bucket with frame masking — per-sequence losses are exactly the
        native-length ones, and the result is their plain mean (each
        sequence weighs equally, the reference's batch-1 semantics).

        BATCHED: sequences group by bucket length and run ``batch`` rows
        per device pass (default: the runner's eval chunk size, rounded
        to the mesh data axis), each group zero-padded to the full batch
        (pad rows carry ``n_valid=0`` and score 0) — one compile per
        distinct bucket length, mesh-sharded via the runner's ``_put``.
        Results are bit-identical to the per-sequence path up to fp32
        reduction order (oracle-tested)."""
        from a3gc_tpu.eval.run import bucket_length

        assemble = DP.graph_batch if self.graph else DP.flat_batch
        wire = stage_inputs_graph if self.graph else stage_inputs_flat
        rotsize = self.stage_cfg.rotsize if self.stage == 3 else 9
        d = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        fb = batch or self._eval_b
        fb = max(d, (fb // d) * d)          # mesh-divisible batch rows

        @jax.jit
        def step(params, raw, n_valid):
            # per-ROW frame-masked loss [B]: pose_loss's masked mean,
            # un-pooled over the batch so every sequence weighs equally
            batch_ = assemble(raw, self.stats, None, rotsize=rotsize)
            inputs, target = wire(batch_, self.stage, train=False)
            mask = (jnp.arange(inputs.shape[1])[None]
                    < n_valid[:, None]).astype(inputs.dtype)
            pred, _ = pose_net_forward(params, self.stage_cfg, inputs,
                                       frame_mask=mask)
            err = jnp.sum(jnp.square(target - pred.reshape(target.shape)),
                          axis=-1)                       # [B, T, ...mid]
            w = mask.reshape(mask.shape + (1,) * (err.ndim - 2))
            per_frame = err[0, 0].size if err.ndim > 2 else 1.0
            denom = n_valid.astype(err.dtype) * per_frame
            return (jnp.sum(err * w, axis=tuple(range(1, err.ndim)))
                    / jnp.maximum(denom, 1.0))

        groups = {}
        for seq in sequences:
            T = len(next(iter(seq.values())))
            groups.setdefault(bucket_length(T), []).append((seq, T))

        total, count = 0.0, 0
        for L, group in sorted(groups.items()):
            for g0 in range(0, len(group), fb):
                chunk = group[g0:g0 + fb]
                n_valid = np.zeros(fb, np.int32)
                raw = None
                for i, (seq, T) in enumerate(chunk):
                    if raw is None:
                        raw = {k: np.zeros((fb, L) + np.asarray(v).shape[1:],
                                           np.asarray(v).dtype)
                               for k, v in seq.items()}
                    for k, v in seq.items():
                        raw[k][i, :T] = v
                    n_valid[i] = T
                per_seq = np.asarray(step(self.state.params,
                                          self._put(raw),
                                          jnp.asarray(n_valid)))
                total += float(per_seq[:len(chunk)].sum())
                count += len(chunk)
        return total / max(count, 1)


class DIPRunner:
    r"""Single-stage DIP trainer (ref: train_dip.py:37-98): input is the
    normalized 60-channel no-root IMU vector, target the reduced pose."""

    def __init__(self, stage_cfg: PoseNetConfig, params,
                 train_cfg: TrainConfig, steps_per_epoch: int,
                 stats: Dict[str, jnp.ndarray], mesh=None):
        self.cfg = train_cfg
        self.mesh = mesh
        self.optimizer = make_optimizer(train_cfg, steps_per_epoch)
        # private copy — train_step donates the state (see StageRunner)
        params = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
        self.state = TrainState(params=params,
                                opt_state=self.optimizer.init(params),
                                step=jnp.zeros((), jnp.int32))
        stats = {k: jnp.asarray(v) for k, v in stats.items()}
        _cast = _make_caster(train_cfg)

        def loss_fn(params, raw, rng):
            raw = dict(raw)
            weight = raw.pop("_weight", None)  # padded-tail batch (Sampler)
            inputs, target = DP.dip_batch(raw, stats,
                                          rotsize=stage_cfg.rotsize)
            pred, _ = pose_net_forward(_cast(params), stage_cfg,
                                       _cast(inputs), rng=rng)
            return pose_loss(
                pred.reshape(target.shape).astype(jnp.float32), target,
                sample_weight=weight)

        assert train_cfg.batch_size % train_cfg.accum_steps == 0, (
            f"accum_steps={train_cfg.accum_steps} must divide "
            f"batch_size={train_cfg.batch_size}")
        if mesh is not None:
            d = mesh.shape.get("data", 1)
            assert train_cfg.batch_size % d == 0, (
                f"batch_size={train_cfg.batch_size} must divide evenly "
                f"over the mesh data axis ({d} devices)")
        self._loss_fn = loss_fn
        self.train_step = _make_train_step(loss_fn, self.optimizer,
                                           train_cfg.accum_steps)
        self.train_step_dev = _make_train_step(loss_fn, self.optimizer,
                                               train_cfg.accum_steps,
                                               gather=True)
        self.train_step_multi = _make_train_step(loss_fn, self.optimizer,
                                                 train_cfg.accum_steps,
                                                 multi=True)

        @jax.jit
        def eval_step(params, raw):
            raw = dict(raw)
            weight = raw.pop("_weight", None)
            inputs, target = DP.dip_batch(raw, stats,
                                          rotsize=stage_cfg.rotsize)
            pred, _ = pose_net_forward(_cast(params), stage_cfg,
                                       _cast(inputs))
            return pose_loss(
                pred.reshape(target.shape).astype(jnp.float32), target,
                sample_weight=weight)

        self.eval_step = eval_step
        self.eval_step_dev = _make_eval_step_dev(eval_step)
        self._eval_b = _mesh_eval_chunk(
            train_cfg.eval_batch_size or min(train_cfg.batch_size, 128),
            mesh)

    train_epoch = StageRunner.train_epoch
    eval_epoch = StageRunner.eval_epoch
    _put = StageRunner._put
    _device_sharded_steps = StageRunner._device_sharded_steps


def run_cascade_training(
        runners: Dict[int, StageRunner],
        train_sampler_fn: Callable[..., DP.Sampler],
        valid_sampler_fn: Callable[[], DP.Sampler],
        cfg: TrainConfig,
        save_fn: Optional[Callable[[int, int, object], None]] = None,
        log_fn: Optional[Callable[[dict], None]] = None,
        valid_fn: Optional[Callable[[StageRunner], float]] = None,
        interrupt: Optional[Callable[[], bool]] = None):
    r"""The 3-stage sequential driver with per-stage early stopping
    (ref: train_a3gc_tp.py:241-312): stages run in order from
    ``cfg.start_stage``; a stage stops after ``cfg.patience`` epochs without
    validation improvement; the best params are kept (checkpoints are written
    on every improvement, like ref: train_a3gc_tp.py:254-258).

    ``train_sampler_fn`` is called with a per-(stage, epoch) salt so every
    epoch gets a FRESH shuffle order (the reference's
    ``DataLoader(shuffle=True)`` reshuffles per epoch,
    ref: train_a3gc_tp.py:209-210) while staying deterministic given
    ``cfg.seed`` — resume reproduces the exact epoch order. Zero-argument
    sampler factories are still accepted.

    ``interrupt`` (a :class:`GracefulInterrupt` or any nullary bool) makes
    training preemption-safe: when it turns true, the loop saves the
    CURRENT params as a normal checkpoint, logs an ``"interrupted"``
    event, and returns. Single-process runs additionally stop mid-epoch
    at the next step boundary; multi-host runs only act at epoch
    boundaries, where the flag is collectively OR-ed across processes
    (signal delivery timing differs per host, and every process must
    reach the cooperative orbax save together)."""
    rng = jax.random.PRNGKey(cfg.seed)

    multihost = jax.process_count() > 1

    # one checker per runner, validated UP FRONT: multi-process training
    # with a mesh-less runner has no way to sync the stop flag (the
    # signaled process would return alone and deadlock the others), so
    # interrupt_checker raises here rather than mid-run
    from a3gc_tpu.parallel.multihost import interrupt_checker
    _interrupted = {stage: interrupt_checker(interrupt, r.mesh)
                    for stage, r in runners.items()}

    # salt-accepting = ONE positional argument binds (a `lambda **kw` or
    # keyword-only signature must fall back to the zero-arg call, not be
    # handed the salt positionally and crash)
    try:
        inspect.signature(train_sampler_fn).bind(0)
        _takes_salt = True
    except TypeError:
        _takes_salt = False
    except ValueError:          # no introspectable signature (builtins)
        _takes_salt = False

    def _train_sampler(salt):
        return train_sampler_fn(salt) if _takes_salt else train_sampler_fn()

    for stage in sorted(runners):
        if stage < cfg.start_stage:
            continue
        runner = runners[stage]
        # mid-epoch step-boundary stop is single-process only (multi-host
        # processes would break at different steps and diverge)
        runner.interrupt = None if multihost else interrupt
        best, tol = float("inf"), 0
        retention = CheckpointRetention(cfg)
        for epoch in range(cfg.start_epoch, cfg.max_epochs):
            t0 = time.time()
            salt = stage * 10000 + epoch
            train_loss = runner.train_epoch(
                _train_sampler(salt), jax.random.fold_in(rng, salt))
            if _interrupted[stage]():
                if save_fn:
                    save_fn(stage, epoch, runner.state.params)
                if log_fn:
                    log_fn({"stage": stage, "epoch": epoch,
                            "event": "interrupted",
                            "train_loss": train_loss,
                            "seconds": time.time() - t0})
                return runners
            # valid_fn overrides chunked validation (e.g. --fse full-sequence
            # validation, ref: train_a3gc_tp.py:18,212-216)
            if valid_fn is not None:
                valid_loss = valid_fn(runner)
            else:
                valid_loss = runner.eval_epoch(valid_sampler_fn())
            if log_fn:
                log_fn({"stage": stage, "epoch": epoch,
                        "train_loss": train_loss, "valid_loss": valid_loss,
                        "seconds": time.time() - t0})
            if valid_loss < best:
                best, tol = valid_loss, 0
                # bound DISK writes only (see CheckpointRetention);
                # interrupt checkpoints go through the branch above and
                # are never recorded, so never pruned
                if save_fn:
                    retention.save(valid_loss, lambda: save_fn(
                        stage, epoch, runner.state.params))
            else:
                tol += 1
            if tol > cfg.patience:
                break
    return runners


def _remove_checkpoint(path: str) -> None:
    r"""Prune one orbax checkpoint directory (retention policy). Only
    ever called on paths the CURRENT run's save_fn returned — resumed
    runs never delete a previous run's checkpoints."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


class CheckpointRetention:
    r"""Save-on-improvement disk bounding shared by the cascade driver
    and the cli dip trainer (``--keep N`` / ``--min_delta D``): skip
    checkpoints whose improvement over the LAST SAVED loss is below
    ``min_save_delta``, and prune improvement checkpoints THIS run wrote
    beyond the newest ``keep_checkpoints``. The early-stop bookkeeping
    (best/patience) is untouched — only disk writes are bounded — and
    interrupt checkpoints never pass through here, so they are never
    pruned. Reset per stage (ref: train_a3gc_tp.py:254-262, whose
    save-on-improvement semantics this preserves at the defaults:
    min_delta 0 / keep 0 = save every improvement, keep all)."""

    def __init__(self, cfg: TrainConfig):
        self.min_delta = cfg.min_save_delta
        self.keep = cfg.keep_checkpoints
        self.last_saved = float("inf")
        self.written = []

    def save(self, valid_loss: float, do_save) -> bool:
        r"""``do_save: () -> path | None`` runs only when the min-delta
        gate passes; returns whether a write happened."""
        if not (valid_loss < self.last_saved - self.min_delta):
            return False
        path = do_save()
        self.last_saved = valid_loss
        if self.keep > 0 and isinstance(path, str):
            self.written.append(path)
            while len(self.written) > self.keep:
                _remove_checkpoint(self.written.pop(0))
        return True
