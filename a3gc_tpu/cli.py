r"""Command-line interface: train / evaluate / preprocess / stats / convert.

One typed CLI replaces the reference's 13 near-identical entry scripts
(train_{a3gc,aagc,agc,ggru,tp,dip}*.py, evaluate_*.py — ref:
train_a3gc_tp.py:16-43, evaluate_a3gc_tp.py:18-31), keeping their flag
semantics (--batch_size, --finetuning, --resume, --norm, --cda, --patience,
--start_at, --hu1/2/3, --mid1/2/3, ...).

Usage:
    python -m a3gc_tpu.cli train    --model a3gc --batch_size 32 ...
    python -m a3gc_tpu.cli evaluate --model a3gc --path trained/ ...
    python -m a3gc_tpu.cli preprocess --dataset dipimu --split train ...
    python -m a3gc_tpu.cli stats --inputs a.npz b.npz --output stats.npz
    python -m a3gc_tpu.cli convert-checkpoint --torch ckpt.tar --model a3gc ...
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

MODEL_CHOICES = ("a3gc", "aagc", "agc", "ggru", "tp", "dip")


def _add_cache_flag(p):
    p.add_argument("--compilation_cache", type=str, default=None,
                   metavar="DIR",
                   help="persist compiled executables in DIR so repeat "
                        "runs skip the multi-minute XLA/Mosaic compiles "
                        "(jax persistent compilation cache). Recommended "
                        "on directly-attached TPU hosts; known to STALL "
                        "through remote-compile PJRT relays")


QUALITY_PRESETS = {
    # named (window, lookahead K, history P) bundles from the measured
    # trained-checkpoint divergence grid (docs/validation/
    # STREAMING_TRADEOFF.md) — one flag instead of three:
    #   latency:  (60, K=0, P=1) zero added latency, -38% divergence
    #             vs plain windowing (2.45 deg mean), 3x compute
    #   balanced: (60, K=1, P=1) +1 window (1 s) latency, -79%
    #             (0.83 deg), 4x compute
    #   max:      (60, K=1, P=4) SAME +1-window latency as balanced (P
    #             is compute-only), -96% (0.18 deg mean), 7x compute —
    #             maximal quality at the 1 s latency budget
    #   ultra:    (120, 1, 2) latency-tolerant tier: 2 s windows + 2 s
    #             lookahead = 4 s total latency, -99% (0.06 deg mean)
    #             at only 5x compute — window size dominates K and P at
    #             fixed compute (the round-4 grid finding)
    "latency": (60, 0, 1),
    "balanced": (60, 1, 1),
    "max": (60, 1, 4),
    "ultra": (120, 1, 2),
}


def _add_quality_flag(p):
    p.add_argument("--quality", choices=tuple(QUALITY_PRESETS),
                   default=None,
                   help="streaming-quality preset: a named (window, "
                        "lookahead, history) bundle from the measured "
                        "divergence grid (STREAMING_TRADEOFF.md). "
                        "latency = zero added latency (-38%% divergence); "
                        "balanced = +1 window (1 s) latency (-79%%); "
                        "max = same 1 s latency, 7x compute (-96%%, "
                        "0.18 deg mean); ultra = 4 s latency, 2 s "
                        "windows (-99%%, 0.06 deg). Explicit "
                        "--window/--streaming/--lookahead/--history "
                        "override the preset's components (an explicit "
                        "0 wins over the preset)")


def _require(cond, msg):
    r"""Validate user input: exit with an actionable message instead of
    an assert (which vanishes under ``python -O`` and then surfaces as
    an opaque downstream error). ADVICE r3/r4 pattern, applied to every
    user-reachable precondition."""
    if not cond:
        raise SystemExit(f"error: {msg}")


def _apply_quality(args):
    r"""Resolve ``--quality`` into (window, lookahead, history): the
    preset fills values the user left unset; explicit flags override its
    components (``--lookahead``/``--history`` parse to None so an
    explicit 0 is distinguishable from the default and wins over the
    preset). On ``evaluate`` the preset implies ``--streaming``."""
    if getattr(args, "quality", None):
        W, K, P = QUALITY_PRESETS[args.quality]
        if getattr(args, "lookahead", None) is None:
            args.lookahead = K
        if getattr(args, "history", None) is None:
            args.history = P
        if hasattr(args, "streaming"):      # evaluate: implies --streaming
            if not args.streaming:
                args.streaming = W
        elif isinstance(getattr(args, "window", None), list):  # export
            if args.window == [60]:
                args.window = [W]
        elif getattr(args, "window", None) is None:            # stream/serve
            args.window = W
    # no preset (or preset applied): unset K/P mean plain windowing
    for attr in ("lookahead", "history"):
        if getattr(args, attr, 0) is None:
            setattr(args, attr, 0)


def _add_common_model_flags(p):
    p.add_argument("--model", choices=MODEL_CHOICES, default="a3gc")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaNs)")
    _add_cache_flag(p)
    p.add_argument("--hu1", type=int, default=256,
                   help="stage-1 hidden units (ref: train_a3gc_tp.py:28)")
    p.add_argument("--hu2", type=int, default=64)
    p.add_argument("--hu3", type=int, default=128)
    p.add_argument("--norm", action="store_true",
                   help="normalize inputs with train stats")
    p.add_argument("--cda", action="store_true",
                   help="use contralateral-augmented (sym) data/stats")
    p.add_argument("--smpl", type=str, default=None,
                   help="SMPL pickle path (default: config paths; falls back "
                        "to a synthetic body model for smoke runs)")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--precision", choices=("highest", "default"),
                   default=None,
                   help="MXU matmul precision for the nets (default: "
                        "'highest' for train, 'default' for evaluate — "
                        "measured SIP-safe, ~1.65x faster)")
    p.add_argument("--rotsize", type=int, default=9, choices=(3, 6, 9),
                   help="stage-3 rotation representation "
                        "(ref: train_tp.py:41, train_dip.py:35)")


def _load_body_model(args):
    from a3gc_tpu.config import paths
    from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle

    candidates = [args.smpl] if args.smpl else [
        paths.resolve(paths.male_smpl_file)]
    for c in candidates:
        if c and os.path.isfile(c):
            return load_parametric_model(c)
    import tempfile
    print("[a3gc_tpu] SMPL pickle not found — using the synthetic body model",
          file=sys.stderr)
    return load_parametric_model(
        write_synthetic_smpl_pickle(
            os.path.join(tempfile.gettempdir(), "a3gc_synthetic_smpl.pkl")))


def _stage_configs(args, precision="highest"):
    """The per-model cascade stage configs (ref model sizes:
    train_a3gc_tp.py:159-161, train_tp.py:163-165, train_dip.py:128).

    ``precision`` sets the MXU matmul precision of the nets. Inference
    defaults to "default" (single-pass bf16 multiply, fp32 accumulate):
    measured SIP delta vs "highest" is 0.00008 deg over 2048-frame
    sequences with the reference's trained checkpoints — 1000x inside the
    0.1 deg parity budget — for ~1.65x end-to-end cascade throughput.
    Training keeps "highest" (fp32-equivalent) like the reference.
    """
    from a3gc_tpu.models import nets as N
    from a3gc_tpu.models.pipeline import CascadeConfig, PoseNetConfig

    if args.model in ("a3gc", "aagc", "agc", "ggru"):
        def g(ui, uo, h, rot):
            return PoseNetConfig(net=N.GraphNetConfig(
                cell=args.model, units_in=ui, units_out=uo, units_hidden=h,
                precision=precision),
                rotsize=rot)

        return CascadeConfig(stage1=g(12, 3, args.hu1, 3),
                             stage2=g(15, 3, args.hu2, 3),
                             stage3=g(15, args.rotsize, args.hu3,
                                      args.rotsize)), True
    if args.model == "tp":
        def d(ni, no, h, rot):
            return PoseNetConfig(net=N.DIPConfig(
                n_input=ni, n_output=no, n_hidden=h, precision=precision),
                rotsize=rot)

        return CascadeConfig(stage1=d(72, 15, 256, 3),
                             stage2=d(87, 69, 64, 3),
                             stage3=d(141, 15 * args.rotsize, 128,
                                      args.rotsize)), False
    # dip: single stage, handled separately
    return None, False


def _load_stats(args):
    from a3gc_tpu.config import paths
    from a3gc_tpu.data.stats import load_stats
    rel = paths.train_stats_sym if args.cda else paths.train_stats
    p = paths.resolve(rel)
    if os.path.isfile(p):
        return load_stats(p)
    # shipped copies of the reference's stats assets (converted .pt → npz,
    # ref: config.py all*_train_stats.pt) so --norm works standalone
    name = ("all_sym_train_stats.npz" if args.cda
            else "all_train_stats.npz")
    shipped = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "assets", "stats", name)
    if os.path.isfile(shipped):
        return load_stats(shipped)
    # and the raw reference assets when mounted
    ref = ("/root/reference/data/all_sym_train_stats.pt" if args.cda
           else "/root/reference/data/all_train_stats.pt")
    if os.path.isfile(ref):
        from a3gc_tpu.data.stats import convert_torch_stats
        return load_stats(convert_torch_stats(ref, p))
    return None


def cmd_train(args):
    if args.coordinator:
        # multi-host (DCN) run: join the distributed runtime BEFORE any
        # backend use — jax.devices() then lists every process's chips
        # and the mesh below spans them all (parallel/multihost.py)
        from a3gc_tpu.parallel import initialize_multihost
        _require(not getattr(args, "fse", False),
                 "--fse full-sequence validation is single-process "
                 "(unsharded batch-1 jits); drop it for --coordinator runs")
        pid, nproc = initialize_multihost(
            args.coordinator, args.num_processes, args.process_id)
        args.mesh = True        # the global mesh is the point
        print(f"[multihost] process {pid}/{nproc} joined "
              f"({args.coordinator})", flush=True)
    import jax
    from a3gc_tpu.config import TrainConfig, paths
    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.data import pipeline as DPipe
    from a3gc_tpu.models.pipeline import init_pose_net
    from a3gc_tpu.parallel import is_coordinator, make_mesh
    from a3gc_tpu.train import GracefulInterrupt, StageRunner, run_cascade_training
    from a3gc_tpu.utils import JsonlLogger, discover_latest, restore_params, save_params

    tc = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                     weight_decay=args.weight_decay, patience=args.patience,
                     max_epochs=args.epochs, normalize=args.norm,
                     cda=args.cda, finetuning=args.finetuning,
                     start_stage=args.start_at, start_epoch=args.start_epoch,
                     seed=args.seed, dtype=args.dtype,
                     accum_steps=args.accum,
                     steps_per_dispatch=args.steps_per_dispatch,
                     eval_batch_size=args.eval_batch,
                     keep_checkpoints=args.keep,
                     min_save_delta=args.min_delta)
    if tc.steps_per_dispatch > 1:
        _require(args.device_data,
                 "--steps_per_dispatch needs --device_data (the scanned "
                 "steps gather their batches from the device-resident "
                 "corpus)")

    nira = load_adjacency_template()
    stats = _load_stats(args) if args.norm else None

    train = DPipe.load_packed(args.train_data)
    valid_fn = None
    if getattr(args, "fse", False):
        from a3gc_tpu.data.factory.dipimu import load_test_sequences
        fse_sequences = load_test_sequences(args.valid_data)
        valid = train      # chunked path unused under --fse
        valid_fn = lambda runner: runner.eval_full_sequences(fse_sequences)
    else:
        valid = DPipe.load_packed(args.valid_data)
    # ceil: tail batches are kept (padded + weight-masked), like the
    # reference's drop_last=False DataLoaders (ref: train_a3gc_tp.py:209-221)
    steps = max(-(-len(train[next(iter(train))]) // tc.batch_size), 1)

    if args.model == "dip":
        return _train_dip(args, tc, train, valid, steps)

    cascade, is_graph = _stage_configs(
        args, precision=args.precision or "highest")

    mesh = None
    if args.mesh or args.tp > 1:
        from a3gc_tpu.config import MeshConfig
        n = jax.device_count()
        _require(n % args.tp == 0,
                 f"--tp {args.tp} must divide {n} devices")
        mesh = make_mesh(MeshConfig(data=n // args.tp, model=args.tp))
    runners = {}
    stage_cfgs = {1: cascade.stage1, 2: cascade.stage2, 3: cascade.stage3}
    for stage, scfg in stage_cfgs.items():
        params = init_pose_net(
            jax.random.fold_in(jax.random.PRNGKey(tc.seed), stage),
            scfg, nira)
        if args.resume:
            found = discover_latest(
                args.resume, stage,
                phase=None)
            if found:
                params = restore_params(found[0], params)
                if is_coordinator():
                    print(f"resumed stage {stage} from {found[0]}")
        runners[stage] = StageRunner(stage, scfg, params, tc, steps,
                                     stats=stats, graph=is_graph, mesh=mesh)

    save_dir = os.path.join(args.save_root, args.name)
    os.makedirs(save_dir, exist_ok=True)
    # multihost: process 0 owns the log/stdout; checkpoint saves stay on
    # EVERY process (orbax is natively multi-process — all must call)
    coord = is_coordinator()
    log = JsonlLogger(
        os.path.join(save_dir, "train_log.jsonl") if coord else None,
        echo=coord)

    train_dev = valid_dev = None
    if args.device_data:
        if mesh is not None:
            # row-shard the corpus over the data axis: each chip holds
            # N/D rows and gathers its own batch rows (shard_map);
            # --accum microbatches the sharded gather itself
            put = lambda d: DPipe.put_device_sharded(d, mesh)
        else:
            put = DPipe.put_device
        train_dev = put(train)
        valid_dev = train_dev if valid is train else put(valid)

    # SIGTERM/SIGINT → checkpoint current params + clean exit (preemption)
    with GracefulInterrupt() as gi:
        run_cascade_training(
            runners,
            lambda salt: DPipe.Sampler(train, tc.batch_size, shuffle=True,
                                       seed=(tc.seed, salt),
                                       pad_remainder=True,
                                       device_data=train_dev),
            lambda: DPipe.Sampler(valid, tc.batch_size, shuffle=False,
                                  pad_remainder=True,
                                  device_data=valid_dev),
            tc,
            save_fn=lambda st, ep, p: save_params(
                p, save_dir, st, ep, finetuning=tc.finetuning),
            log_fn=log,
            valid_fn=valid_fn,
            interrupt=gi)


def _train_dip(args, tc, train, valid, steps):
    r"""Single-stage DIP training (ref: train_dip.py:113-193)."""
    import jax
    from a3gc_tpu.data import pipeline as DPipe
    from a3gc_tpu.models import nets as N
    from a3gc_tpu.models.pipeline import PoseNetConfig, init_pose_net
    from a3gc_tpu.train.loop import DIPRunner
    from a3gc_tpu.utils import JsonlLogger, save_params

    rotsize = args.rotsize
    cfg = PoseNetConfig(net=N.DIPConfig(
        n_input=60, n_output=15 * rotsize, n_hidden=args.hu1,
        precision=args.precision or "highest"), rotsize=rotsize)
    params = init_pose_net(jax.random.PRNGKey(tc.seed), cfg)
    if args.resume:
        # same contract as the reference's train_dip.py:131-142: load the
        # checkpoint's weights (finetuning restarts the epoch count)
        from a3gc_tpu.utils import discover_latest, restore_params
        found = discover_latest(args.resume, 1, phase=None)
        _require(found, f"no checkpoint found in {args.resume}")
        params = restore_params(found[0], params)
        from a3gc_tpu.parallel import is_coordinator
        if is_coordinator():
            print(f"resumed from {found[0]}")
    stats = _load_stats(args)
    _require(stats is not None,
             "DIP training needs normalization stats (--norm with "
             "shipped stats, or --data_root with stats files)")
    mesh = None
    if args.mesh or args.tp > 1:
        from a3gc_tpu.config import MeshConfig
        from a3gc_tpu.parallel import make_mesh
        n = jax.device_count()
        _require(n % args.tp == 0,
                 f"--tp {args.tp} must divide {n} devices")
        mesh = make_mesh(MeshConfig(data=n // args.tp, model=args.tp))
    runner = DIPRunner(cfg, params, tc, steps, stats, mesh=mesh)

    save_dir = os.path.join(args.save_root, args.name)
    os.makedirs(save_dir, exist_ok=True)
    from a3gc_tpu.parallel import is_coordinator
    coord = is_coordinator()
    log = JsonlLogger(
        os.path.join(save_dir, "train_log.jsonl") if coord else None,
        echo=coord)
    train_dev = valid_dev = None
    if args.device_data:
        if mesh is not None:
            put = lambda d: DPipe.put_device_sharded(d, mesh)
        else:
            put = DPipe.put_device
        train_dev = put(train)
        valid_dev = train_dev if valid is train else put(valid)
    from a3gc_tpu.parallel.multihost import interrupt_checker
    from a3gc_tpu.train import GracefulInterrupt
    multihost = jax.process_count() > 1

    from a3gc_tpu.train.loop import CheckpointRetention
    best, tol = float("inf"), 0
    retention = CheckpointRetention(tc)
    with GracefulInterrupt() as gi:
        _interrupted = interrupt_checker(gi, mesh)
        runner.interrupt = None if multihost else gi
        for epoch in range(tc.start_epoch, tc.max_epochs):
            train_loss = runner.train_epoch(
                DPipe.Sampler(train, tc.batch_size, shuffle=True,
                              seed=(tc.seed, epoch), pad_remainder=True,
                              device_data=train_dev),
                jax.random.fold_in(jax.random.PRNGKey(tc.seed), epoch))
            if _interrupted():
                save_params(runner.state.params, save_dir, 1, epoch,
                            finetuning=tc.finetuning)
                log({"stage": 1, "epoch": epoch, "event": "interrupted",
                     "train_loss": train_loss})
                return
            valid_loss = runner.eval_epoch(
                DPipe.Sampler(valid, tc.batch_size, shuffle=False,
                              pad_remainder=True, device_data=valid_dev))
            log({"stage": 1, "epoch": epoch, "train_loss": train_loss,
                 "valid_loss": valid_loss})
            if valid_loss < best:
                best, tol = valid_loss, 0
                # shared retention policy (train/loop.CheckpointRetention):
                # bound disk, leave the early-stop bookkeeping untouched
                retention.save(valid_loss, lambda: save_params(
                    runner.state.params, save_dir, 1, epoch,
                    finetuning=tc.finetuning))
            else:
                tol += 1
            if tol > tc.patience:
                break


def _load_cascade_params(args, cascade, is_graph, nira):
    """Per-stage checkpoint loading: reference .tar converts or this
    framework's orbax checkpoints, latest-epoch discovery with per-stage
    pins (ref: evaluate_a3gc_tp.py:100-119)."""
    from a3gc_tpu.compat import (
        dip_params_from_state_dict,
        graph_net_params_from_state_dict,
        load_torch_checkpoint,
    )
    from a3gc_tpu.models.pipeline import init_pose_net
    from a3gc_tpu.utils import discover_latest, restore_params
    import jax

    stage_cfgs = (cascade.stage1, cascade.stage2, cascade.stage3)
    params3 = []
    pins = (args.mid1, args.mid2, args.mid3)
    for i, scfg in enumerate(stage_cfgs):
        if args.torch_checkpoints:
            sd = load_torch_checkpoint(args.torch_checkpoints[i])
            if is_graph:
                params3.append(graph_net_params_from_state_dict(
                    sd, args.model))
            else:
                params3.append(dip_params_from_state_dict(sd))
        elif args.path:
            template = init_pose_net(jax.random.PRNGKey(i), scfg, nira)
            found = discover_latest(args.path, i + 1, phase=args.type,
                                    epoch=pins[i] if pins[i] >= 0 else None)
            _require(found,
                     f"no checkpoint for stage {i + 1} in {args.path}")
            params3.append(restore_params(found[0], template))
        else:
            # fresh init (benchmarking / smoke runs without checkpoints)
            params3.append(init_pose_net(jax.random.PRNGKey(i), scfg, nira))
    return tuple(params3)


def cmd_evaluate(args):
    _apply_quality(args)
    from a3gc_tpu.compat import (
        dip_params_from_state_dict, graph_net_params_from_state_dict,
        load_torch_checkpoint)
    from a3gc_tpu.data.factory.dipimu import load_test_sequences
    from a3gc_tpu.eval import evaluate_sequences
    from a3gc_tpu.metrics import PoseEvaluator
    from a3gc_tpu.models.pipeline import init_pose_net
    from a3gc_tpu.utils import discover_latest, restore_params
    from a3gc_tpu.data import load_adjacency_template
    import jax

    model = _load_body_model(args)
    nira = load_adjacency_template()

    if args.model == "dip":
        return _evaluate_dip(args, model)

    cascade, is_graph = _stage_configs(
        args, precision=args.precision or "default")
    params3 = _load_cascade_params(args, cascade, is_graph, nira)

    stats = _load_stats(args) if args.norm else None
    if args.save_preds and args.batch_streams > 1:
        print("[a3gc_tpu] --save_preds dumps per-sequence predictions and "
              "runs the per-sequence protocol; --batch_streams is ignored",
              file=sys.stderr)
    if (args.lookahead or args.history) and not args.streaming:
        print("[a3gc_tpu] --lookahead/--history only apply to --streaming "
              "evaluation; ignored (offline evaluation always sees the "
              "full sequence)", file=sys.stderr)
    if args.streaming and args.save_preds:
        print("[a3gc_tpu] --save_preds runs the offline per-sequence "
              "protocol; --streaming is ignored", file=sys.stderr)
    for dataset in args.datasets:
        sequences = load_test_sequences(dataset)
        if args.save_preds:
            import pickle as pkl
            from a3gc_tpu.eval import CascadeEvaluator
            from a3gc_tpu.eval.run import reduced_to_full
            from a3gc_tpu.utils import write_eval_report
            ev = CascadeEvaluator(params3, cascade, model, stats, args.norm)
            ev.warmup([s["ori"].shape[0] for s in sequences])
            mean, seconds, frames, preds = ev.evaluate(sequences,
                                                       return_preds=True)
            ds = "dip" if "dip" in dataset else "tc"
            base = os.path.join("evaluation_results", "sequences", ds,
                                args.model)
            os.makedirs(os.path.join(base, "gt"), exist_ok=True)
            os.makedirs(os.path.join(base, "pred"), exist_ok=True)
            for i, (seq, pred) in enumerate(zip(sequences, preds)):
                gt = reduced_to_full(seq["pose"].reshape(-1, 15, 3, 3))
                pkl.dump(gt, open(os.path.join(base, "gt", f"{i:03d}.p"),
                                  "wb"))
                pkl.dump(pred, open(os.path.join(base, "pred", f"{i:03d}.p"),
                                    "wb"))
            write_eval_report(
                os.path.join("evaluation_results",
                             f"{args.model}_{os.path.basename(dataset)}.txt"),
                dataset, seconds, mean, PoseEvaluator.METRIC_NAMES)
        elif args.streaming:
            from a3gc_tpu.eval import CascadeEvaluator
            from a3gc_tpu.utils import write_eval_report
            mesh = None
            if args.mesh:
                from a3gc_tpu.parallel import make_mesh
                mesh = make_mesh()   # slots shard over the data axis
                if args.batch_streams % jax.device_count():
                    raise SystemExit(
                        "[a3gc_tpu] --mesh shards the streams over the "
                        f"{jax.device_count()}-device data axis: pass "
                        "--batch_streams as a multiple of the device "
                        f"count (e.g. --batch_streams "
                        f"{jax.device_count()})")
            ev = CascadeEvaluator(params3, cascade, model, stats, args.norm)
            mean, seconds, frames = ev.evaluate_streaming(
                sequences, window=args.streaming,
                lookahead=args.lookahead, history=args.history,
                batch_streams=args.batch_streams, mesh=mesh)
            tag = (f"stream{args.streaming}"
                   + (f"_K{args.lookahead}" if args.lookahead else "")
                   + (f"_P{args.history}" if args.history else ""))
            write_eval_report(
                os.path.join("evaluation_results",
                             f"{args.model}_{os.path.basename(dataset)}"
                             f"_{tag}.txt"),
                f"{dataset} [{tag}]", seconds, mean,
                PoseEvaluator.METRIC_NAMES)
        elif args.batch_streams > 1:
            from a3gc_tpu.eval import CascadeEvaluator
            from a3gc_tpu.utils import write_eval_report
            mesh = None
            if args.mesh:
                from a3gc_tpu.parallel import make_mesh
                mesh = make_mesh()   # all devices on the data axis
                if args.batch_streams % jax.device_count():
                    raise SystemExit(
                        "[a3gc_tpu] --mesh shards the streams over the "
                        f"{jax.device_count()}-device data axis: pass "
                        "--batch_streams as a multiple of the device "
                        f"count (e.g. --batch_streams "
                        f"{jax.device_count()})")
            ev = CascadeEvaluator(params3, cascade, model, stats, args.norm,
                                  mesh=mesh)
            mean, seconds, frames = ev.evaluate_batched(
                sequences, streams=args.batch_streams)
            write_eval_report(
                os.path.join("evaluation_results",
                             f"{args.model}_{os.path.basename(dataset)}.txt"),
                dataset, seconds, mean, PoseEvaluator.METRIC_NAMES)
        else:
            mean, seconds, frames = evaluate_sequences(
                params3, cascade, model, sequences, stats=stats,
                normalize=args.norm,
                report_path=os.path.join(
                    "evaluation_results",
                    f"{args.model}_{os.path.basename(dataset)}.txt"),
                dataset_name=dataset)
        print(f"== {dataset}: {frames} frames in {seconds:.3f}s "
              f"({frames / max(seconds, 1e-9):,.0f} frames/s)")
        print(PoseEvaluator.format(mean))


def _load_dip(args, allow_init=False):
    r"""DIP net config + params, from --torch_checkpoints or --path
    discovery (shared by evaluate/stream/serve/export --model dip).
    ``allow_init`` permits a fresh random init when no checkpoint source
    is given (benchmarking / smoke exports, like the cascade loader)."""
    import jax
    from a3gc_tpu.compat import (dip_params_from_state_dict,
                                 load_torch_checkpoint)
    from a3gc_tpu.models import nets as N
    from a3gc_tpu.models.pipeline import PoseNetConfig, init_pose_net
    from a3gc_tpu.utils import discover_latest, restore_params

    cfg = PoseNetConfig(net=N.DIPConfig(
        n_input=60, n_output=15 * args.rotsize, n_hidden=args.hu1,
        precision=args.precision or "default"), rotsize=args.rotsize)
    if args.torch_checkpoints:
        params = dip_params_from_state_dict(
            load_torch_checkpoint(args.torch_checkpoints[0]))
    elif allow_init and not args.path:
        params = init_pose_net(jax.random.PRNGKey(0), cfg)
    else:
        template = init_pose_net(jax.random.PRNGKey(0), cfg)
        found = discover_latest(args.path, 1, phase=args.type,
                                epoch=args.mid1 if args.mid1 >= 0 else None)
        _require(found, f"no DIP checkpoint in {args.path}")
        params = restore_params(found[0], template)
    return cfg, params


def _evaluate_dip(args, model):
    r"""Single-net DIP evaluation (ref: evaluate_dip.py:60-125)."""
    from a3gc_tpu.data.factory.dipimu import load_test_sequences
    from a3gc_tpu.eval import DipEvaluator
    from a3gc_tpu.metrics import PoseEvaluator

    cfg, params = _load_dip(args)
    stats = _load_stats(args)
    _require(stats is not None,
             "DIP evaluation needs normalization stats (--norm with "
             "shipped stats, or --data_root with stats files)")
    if getattr(args, "mesh", False):
        print("[a3gc_tpu] --mesh is not wired for the single-net dip "
              "evaluator (KB-scale net, single-chip dispatch-bound); "
              "running unsharded", file=sys.stderr)
    ev = DipEvaluator(params, cfg, model, stats)
    for dataset in args.datasets:
        sequences = load_test_sequences(dataset)
        if args.streaming:
            # the reference's per-net online mode (net_aagc.py:802-812),
            # scored with the published metrics; --lookahead/--history
            # price the same quality levers as the cascade path
            mean, seconds, frames = ev.evaluate_streaming(
                sequences, window=args.streaming,
                lookahead=args.lookahead, history=args.history,
                batch_streams=args.batch_streams)
            tag = (f"stream{args.streaming}"
                   + (f"_K{args.lookahead}" if args.lookahead else "")
                   + (f"_P{args.history}" if args.history else ""))
            print(f"== {dataset} [{tag}]: {frames} "
                  f"frames in {seconds:.3f}s")
        else:
            mean, seconds, frames = ev.evaluate(sequences)
            print(f"== {dataset}: {frames} frames in {seconds:.3f}s")
        print(PoseEvaluator.format(mean))


def cmd_stream(args):
    r"""Online streaming inference (the reference's online mode,
    ref: net_aagc.py:802-812, run over the full cascade): fixed-size IMU
    windows flow through one pre-compiled program with per-stage recurrent
    state carried across windows. Reads packed test npz sequences, writes
    predicted poses, prints ONE JSON line of latency/throughput stats."""
    import json as _json
    import time as _time

    import numpy as np

    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.data.factory.dipimu import load_test_sequences
    from a3gc_tpu.eval.streaming import StreamingCascade

    _apply_quality(args)
    _require(not (args.pipelined and (args.lookahead or args.history)),
             "--pipelined does not compose with --lookahead/--history "
             "(both buffer windows); drop one")
    _require(not (args.evaluate and (args.streams or 1) > 1),
             "--evaluate runs the per-sequence streaming path; drop "
             "--streams")
    sequences = load_test_sequences(args.input)
    if args.artifact:
        # stream through a `cli export` deployment artifact: geometry from
        # its manifest (--streams/--window select within a bundle); no
        # checkpoints/stats/model assets needed
        from a3gc_tpu.export import (ArtifactLookaheadSession,
                                     ArtifactSession, ExportedBundle,
                                     load_exported)
        _require(not args.pipelined,
                 "--pipelined drives the live session; artifacts use "
                 "plain step()")
        if args.lookahead or args.history:
            session = ArtifactLookaheadSession(
                ExportedBundle(args.artifact), streams=args.streams,
                window=args.window, lookahead=args.lookahead,
                history=args.history)
            _require(session.streams == 1,
                     "artifact lookahead/history streaming is "
                     "single-stream here; multi-client buffered serving "
                     "is `serve --artifact --lookahead/--history`")
        else:
            session = ArtifactSession(load_exported(
                args.artifact, streams=args.streams, window=args.window))
        args.window, args.streams = session.window, session.streams
        if session.streams > 1:
            _require(not args.evaluate,
                     "--evaluate needs a single-stream session; select "
                     "a streams=1 geometry from the bundle (--streams 1)")
            return _stream_multi(args, None, None, None, None, sequences,
                                 session=session)
        W = args.window
        sess = session
        model = None        # loaded on demand for --evaluate
    elif args.model == "dip":
        # the reference's single-net dip online mode (net_aagc.py:
        # 1022-1031) with the full serving/quality stack — raw IMU
        # windows → trimmed/normalized input → one net → IK poses
        from a3gc_tpu.eval.streaming import DipStreamingSession

        args.window = args.window or 60
        args.streams = args.streams or 1
        if args.mesh:
            print("[a3gc_tpu] --mesh is not wired for the single-net dip "
                  "session (KB-scale net — scale out by replication); "
                  "running single-device", file=sys.stderr)
        model = _load_body_model(args)
        stats = _load_stats(args)
        _require(stats is not None,
                 "dip streaming needs stats (--norm path)")
        cfg, params = _load_dip(args)
        W = args.window
        sess = DipStreamingSession(params, cfg, model, window=W,
                                   stats=stats, streams=args.streams,
                                   lookahead=args.lookahead,
                                   history=args.history)
        if args.streams > 1:
            return _stream_multi(args, None, None, model, None,
                                 sequences, session=sess)
    else:
        args.window = args.window or 60
        args.streams = args.streams or 1
        model = _load_body_model(args)
        nira = load_adjacency_template()
        cascade, is_graph = _stage_configs(
            args, precision=args.precision or "default")
        params3 = _load_cascade_params(args, cascade, is_graph, nira)
        stats = _load_stats(args) if args.norm else None

        mesh = None
        if args.mesh:
            from a3gc_tpu.parallel import make_mesh
            mesh = make_mesh()   # all devices on the data axis
        W = args.window
        if args.streams > 1:
            return _stream_multi(args, params3, cascade, model, stats,
                                 sequences, mesh=mesh)
        sess = StreamingCascade(params3, cascade, model, window=args.window,
                                stats=stats, normalize=args.norm,
                                lookahead=args.lookahead,
                                history=args.history, mesh=mesh)

    # warm up (compile) outside the timed region; buffered modes need
    # P+K+1 steps to reach the steady-state emission program (earlier
    # steps compile the warmup-fill programs)
    for _ in range(args.lookahead + args.history + 1):
        sess.step(sequences[0]["ori"][:W], sequences[0]["acc"][:W])
    if args.lookahead:
        sess.flush()
    sess.reset()

    latencies = []
    outputs = []
    for si, seq in enumerate(sequences):
        sess.reset()
        T = (seq["ori"].shape[0] // W) * W
        poses = []
        for t0 in range(0, T, W):
            t = _time.perf_counter()
            if args.pipelined:
                pose = sess.step_async(seq["ori"][t0:t0 + W],
                                       seq["acc"][t0:t0 + W])
            else:
                pose = sess.step(seq["ori"][t0:t0 + W],
                                 seq["acc"][t0:t0 + W])
            dt = _time.perf_counter() - t
            # lagged modes: the first step per sequence only buffers
            # (~0 ms, no device work) — counting it would deflate the
            # published latency mean; only emissions are samples
            if pose is not None or not (args.pipelined or args.lookahead):
                latencies.append(dt)
            if pose is not None:
                poses.append(pose)
        if args.pipelined or args.lookahead:
            t = _time.perf_counter()
            tail = sess.flush()
            latencies.append(_time.perf_counter() - t)
            if tail is not None:
                poses.append(tail)
        if poses:
            outputs.append((si, np.concatenate(poses)))

    if args.output:
        np.savez(args.output, **{f"pose_{i:03d}": p
                                 for i, (_, p) in enumerate(outputs)})
    stats_line = {
        "window": W,
        "pipelined": bool(args.pipelined),
        "lookahead": int(args.lookahead),
        "history": int(args.history),
    }
    if args.evaluate:
        # the reference 5-metric table ON THE STREAMED EMISSIONS — the
        # accuracy a serving deployment of this exact (window, K, P)
        # configuration delivers, vs the gt in the packed test npz (the
        # reference never quantifies its online mode's accuracy,
        # ref: net_aagc.py:802-812 has no evaluation path)
        import jax.numpy as _jnp

        from a3gc_tpu.eval.run import reduced_to_full
        from a3gc_tpu.metrics.evaluator import PoseEvaluator

        body = model if model is not None else _load_body_model(args)
        pe = PoseEvaluator(body)
        metrics, ev_frames = [], 0
        for si, pred in outputs:
            Tp = pred.shape[0]
            gt = reduced_to_full(
                sequences[si]["pose"][:Tp].reshape(Tp, 15, 3, 3))
            metrics.append(np.asarray(pe(_jnp.asarray(pred),
                                         _jnp.asarray(gt))))
            ev_frames += Tp
        mean = np.stack(metrics).mean(axis=0)
        print(PoseEvaluator.format(mean))
        stats_line["evaluated_frames"] = ev_frames
        stats_line["sip_deg"] = round(float(mean[0, 0]), 3)
    lat = np.asarray(latencies) * 1e3
    stats_line.update({
        "windows": int(lat.size),
        "latency_ms_mean": round(float(lat.mean()), 3),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 3),
        "latency_ms_p99": round(float(np.percentile(lat, 99)), 3),
        "frames_per_sec": round(W / (lat.mean() / 1e3), 1),
    })
    print(_json.dumps(stats_line))


def _stream_multi(args, params3, cascade, model, stats, sequences,
                  session=None, mesh=None):
    r"""Multiplexed online serving: S independent clients share ONE
    compiled multi-stream program per window (the online counterpart of
    ``evaluate --batch_streams``; the reference serves one stream per
    process, ref: net_aagc.py:802-812). Sequences are assigned to client
    slots round-robin; a slot's state is reset when its sequence ends
    while the other slots keep streaming. Prints ONE JSON line with
    aggregate latency/throughput."""
    import json as _json
    import time as _time

    import numpy as np

    from a3gc_tpu.eval.streaming import StreamingCascade

    S, W = args.streams, args.window
    sess = session if session is not None else StreamingCascade(
        params3, cascade, model, window=W, stats=stats,
        normalize=args.norm, streams=S, mesh=mesh,
        lookahead=getattr(args, "lookahead", 0),
        history=getattr(args, "history", 0))

    def slot_feed(playlist):
        for seq in playlist:
            T = (seq["ori"].shape[0] // W) * W
            for t0 in range(0, T, W):
                yield (seq["ori"].reshape(-1, 54)[t0:t0 + W],
                       seq["acc"].reshape(-1, 18)[t0:t0 + W], t0 == 0)

    feeds = [slot_feed(sequences[i::S]) for i in range(S)]
    zero_o, zero_a = np.zeros((W, 54), np.float32), np.zeros((W, 18),
                                                             np.float32)

    lookahead = getattr(args, "lookahead", 0)
    history = getattr(args, "history", 0)
    # warm up (compile) outside the timed region; buffered modes need
    # P+K+1 steps to reach the steady-state emission program, plus the
    # flush program
    for _ in range(lookahead + history + 1):
        sess.step(np.zeros((S, W, 54), np.float32),
                  np.zeros((S, W, 18), np.float32))
    if lookahead:
        sess.flush()
    sess.reset()

    latencies, total_frames, ticks = [], 0, 0
    live = [True] * S
    started = [False] * S
    while any(live):
        ori = np.empty((S, W, 54), np.float32)
        acc = np.empty((S, W, 18), np.float32)
        act_vec = np.zeros(S, np.float32)
        active = 0
        for i in range(S):
            nxt = next(feeds[i], None) if live[i] else None
            if nxt is None:
                live[i] = False
                ori[i], acc[i] = zero_o, zero_a
                continue
            o, a, is_start = nxt
            if is_start and started[i]:
                sess.reset(stream=i)     # client i starts a new sequence
            started[i] = True
            ori[i], acc[i] = o, a
            act_vec[i] = 1.0
            active += 1
        if active == 0:
            break
        t = _time.perf_counter()
        if args.pipelined:
            # submit-side latency; device execution overlaps the next
            # window's host work (see StreamingCascade.step_async)
            sess.step_async(ori, acc)
            total_frames += active * W
        elif lookahead or history:
            # per-slot buffered emission: count only EMITTED frames (the
            # warmup ticks of each slot produce none)
            _, emitted = sess.step(ori, acc, active=act_vec)
            total_frames += int(emitted.sum()) * W
        else:
            sess.step(ori, acc)
            total_frames += active * W
        latencies.append(_time.perf_counter() - t)
        ticks += 1
    if lookahead and ticks:
        # drain each slot's buffered tail
        t = _time.perf_counter()
        tails = sess.flush()
        latencies.append(_time.perf_counter() - t)
        total_frames += sum(0 if tl is None else len(tl)
                            for tl in (tails if isinstance(tails, list)
                                       else [tails]))
    if args.pipelined and ticks:
        # drain the last in-flight window INSIDE the timing so
        # frames_per_sec counts only executed-and-fetched work
        t = _time.perf_counter()
        sess.flush()
        latencies.append(_time.perf_counter() - t)

    if ticks == 0:
        print(_json.dumps({
            "streams": S, "window": W, "windows": 0,
            "error": f"no sequence reaches the {W}-frame window; "
                     f"use a smaller --window"}))
        return
    lat = np.asarray(latencies) * 1e3
    print(_json.dumps({
        "streams": S,
        "window": W,
        "pipelined": bool(args.pipelined),   # latency = submit-side then
        "lookahead": lookahead,
        "history": history,
        "windows": ticks,
        "latency_ms_mean": round(float(lat.mean()), 3),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 3),
        "latency_ms_p99": round(float(np.percentile(lat, 99)), 3),
        "frames_per_sec": round(total_frames / max(lat.sum() / 1e3, 1e-9),
                                1),
    }))


def cmd_export(args):
    r"""AOT deployment export: serialize the windowed streaming-cascade
    program (normalize → scatter → 3 stages → IK, carried state, per-slot
    masking) to a portable StableHLO artifact directory via jax.export.
    Parameters, stats, and the SMPL body are baked in as constants — the
    artifact runs from bare jax with no model code or checkpoint files
    (the deployment story the reference lacks: serving it needs torch +
    net_aagc.py + the .tar files, ref: evaluate_a3gc_tp.py:125-145)."""
    _apply_quality(args)
    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.export import (export_bundle, export_streaming_cascade,
                                 save_exported)

    model = _load_body_model(args)
    nira = load_adjacency_template()
    cascade, is_graph = _stage_configs(
        args, precision=args.precision or "default")
    if cascade is None:
        # single-net dip online program (ref: net_aagc.py:1022-1031,
        # evaluate_dip.py:88-91): same artifact layout/serving stack,
        # family='dip'; stats are baked in unconditionally (the dip
        # input prep always normalizes, evaluate_dip.py:69)
        stats = _load_stats(args)
        _require(stats is not None,
                 "dip export needs normalization stats (--norm with the "
                 "shipped stats, or --data_root with stats files)")
        net_cfg, net_params = _load_dip(args, allow_init=True)
    else:
        net_cfg, net_params = cascade, _load_cascade_params(
            args, cascade, is_graph, nira)
        stats = _load_stats(args) if args.norm else None

    geometries = [(s, w) for s in args.streams for w in args.window]
    if args.lookahead or args.history:
        # lookahead/history serving needs the emission/flush window
        # multiples; APPEND them — the bundle's first entry stays the
        # user's first (streams, window), which select()/load_exported
        # default to
        from a3gc_tpu.export import lookahead_geometries
        extra = [g for w in args.window
                 for g in lookahead_geometries(args.streams, w,
                                               args.lookahead,
                                               args.history)]
        seen = set(geometries)
        for g in extra:     # dedupe within extra too: window multiples
            if g not in seen:   # of different --window values coincide
                geometries.append(g)
                seen.add(g)
    if len(geometries) > 1:
        # multi-geometry bundle: one directory, one sub-artifact per
        # (streams, window) — a deployment serves every geometry from
        # one artifact (jax.export symbolic dims can't cover the stream
        # axis: the Mosaic kernels have static grids)
        export_bundle(args.output, net_params, net_cfg, model,
                      geometries, stats=stats, normalize=args.norm,
                      backend=args.backend, platforms=args.platforms)
        total = sum(os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(args.output) for f in fs)
        print(f"exported bundle of {len(geometries)} geometries "
              f"{geometries} (backend={args.backend}) -> {args.output} "
              f"({total:,} bytes)")
        return

    (streams, window), = geometries
    if cascade is None:
        from a3gc_tpu.export import export_streaming_dip
        exp_step, exp_init, manifest = export_streaming_dip(
            net_params, net_cfg, model, window=window, streams=streams,
            stats=stats, backend=args.backend, platforms=args.platforms)
    else:
        exp_step, exp_init, manifest = export_streaming_cascade(
            net_params, net_cfg, model, window=window, streams=streams,
            stats=stats, normalize=args.norm, backend=args.backend,
            platforms=args.platforms)
    save_exported(args.output, exp_step, exp_init, manifest)
    sizes = {f: os.path.getsize(os.path.join(args.output, f))
             for f in os.listdir(args.output)}
    print(f"exported {manifest['family']} "
          f"{'net' if cascade is None else 'cascade'} "
          f"(window={manifest['window']}, streams={manifest['streams']}, "
          f"backend={manifest['backend']}, "
          f"platforms={','.join(manifest['platforms'])}) -> {args.output} "
          f"({sum(sizes.values()):,} bytes)")


def cmd_serve(args):
    r"""Dynamic-batching HTTP pose serving (see a3gc_tpu/serve.py): up to
    --streams concurrent clients share ONE compiled multi-stream program;
    requests arriving within --max_wait_ms coalesce into one device step."""
    import json as _json

    _apply_quality(args)

    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.serve import PoseServer

    # NOTE: construction happens inside this helper so its frame (and the
    # session/params/model locals pinning device buffers) is POPPED before
    # serve_forever runs. An exec recycle's pre-exec backend teardown
    # (serve._do_recycle) can only destroy the device client if nothing
    # else references its buffers — a long-lived cmd_serve frame holding
    # `session` would keep the client alive and the connection open, and
    # the abrupt close at exec can wedge a remote single-tenant device
    # session for tens of minutes.
    srv, streams, window = _build_server(args, PoseServer,
                                         load_adjacency_template)
    host, port = srv.address[:2]
    print(_json.dumps({"serving": f"http://{host}:{port}",
                       "streams": streams, "window": window}),
          flush=True)
    srv.serve_forever()


def _build_server(args, PoseServer, load_adjacency_template):
    r"""Build the PoseServer for cmd_serve (see note there: short-lived
    frame by design — do not inline into cmd_serve)."""
    if args.artifact:
        # serve straight from a deployment artifact: no checkpoints, stats
        # files, SMPL assets, or model code needed (geometry from the
        # manifest; for a bundle, --streams/--window select the geometry)
        from a3gc_tpu.export import (ArtifactLookaheadSession,
                                     ArtifactSession, ExportedBundle,
                                     load_exported)
        if args.lookahead or args.history:
            # buffered-emission serving needs the window-multiple
            # modules — a bundle from `export --lookahead K --history P`
            session = ArtifactLookaheadSession(
                ExportedBundle(args.artifact), streams=args.streams,
                window=args.window, lookahead=args.lookahead,
                history=args.history)
        else:
            session = ArtifactSession(load_exported(
                args.artifact, streams=args.streams, window=args.window))
        srv = PoseServer(None, None, None, host=args.host, port=args.port,
                         max_wait_ms=args.max_wait_ms, session=session,
                         lookahead=args.lookahead, history=args.history,
                         recycle_rss_mb=args.recycle_rss_mb,
                         allow_recycle=True)
        return srv, session.streams, session.window
    if args.model == "dip":
        # single-net dip serving (the reference's online mode,
        # ref: net_aagc.py:1022-1031, behind the same HTTP batcher as
        # the cascade — raw IMU in, full local poses out)
        from a3gc_tpu.eval.streaming import DipStreamingSession

        args.window = args.window or 60
        args.streams = args.streams or 8
        if args.mesh:
            print("[a3gc_tpu] --mesh is not wired for the single-net dip "
                  "session (KB-scale net — scale out by replication); "
                  "serving single-device", file=sys.stderr)
        model = _load_body_model(args)
        stats = _load_stats(args)
        _require(stats is not None,
                 "dip serving needs stats (--norm path)")
        cfg, params = _load_dip(args)
        session = DipStreamingSession(
            params, cfg, model, window=args.window, stats=stats,
            streams=args.streams, lookahead=args.lookahead,
            history=args.history)
        srv = PoseServer(None, None, None, host=args.host, port=args.port,
                         max_wait_ms=args.max_wait_ms, session=session,
                         lookahead=args.lookahead, history=args.history,
                         recycle_rss_mb=args.recycle_rss_mb,
                         allow_recycle=True,
                         # /v1/reload re-discovers the latest dip
                         # checkpoint and hot-swaps it
                         reload_fn=lambda: _load_dip(args)[1])
        return srv, args.streams, args.window
    args.window = args.window or 60
    args.streams = args.streams or 8
    model = _load_body_model(args)
    nira = load_adjacency_template()
    cascade, is_graph = _stage_configs(
        args, precision=args.precision or "default")
    params3 = _load_cascade_params(args, cascade, is_graph, nira)
    stats = _load_stats(args) if args.norm else None
    mesh = None
    if args.mesh:
        from a3gc_tpu.parallel import make_mesh
        mesh = make_mesh()   # all devices on the data axis

    srv = PoseServer(params3, cascade, model, window=args.window,
                     streams=args.streams, stats=stats,
                     normalize=args.norm, host=args.host,
                     port=args.port, max_wait_ms=args.max_wait_ms,
                     mesh=mesh, lookahead=args.lookahead,
                     history=args.history,
                     recycle_rss_mb=args.recycle_rss_mb,
                     allow_recycle=True,
                     # POST /v1/reload re-discovers the latest
                     # checkpoints (training can keep writing to
                     # --path) and hot-swaps them into live sessions
                     reload_fn=lambda: _load_cascade_params(
                         args, cascade, is_graph, nira))
    return srv, args.streams, args.window


def cmd_worst_frames(args):
    r"""Best/worst-frame comparison of two models' prediction dumps
    (ref: get_worst_frames.py)."""
    import glob
    import pickle as pkl

    from a3gc_tpu.eval import compare_models

    model = _load_body_model(args)

    def load_dir(d):
        return [pkl.load(open(p, "rb"))
                for p in sorted(glob.glob(os.path.join(d, "*.p")))]

    gts = load_dir(args.gt)
    preds_a = load_dir(args.pred_a)
    preds_b = load_dir(args.pred_b)
    result = compare_models(model, gts, preds_a, preds_b, k=args.k,
                            min_separation=args.min_separation,
                            out_dir=args.output, render=args.render)
    for name, frames in result.items():
        print(name, frames)


def cmd_convert_data(args):
    r"""Reference packed ``.pt`` dataset → this framework's npz (layout
    auto-detected: stacked train chunks or per-sequence test lists,
    ref: postprocess_data.py:143-203)."""
    from a3gc_tpu.compat import convert_torch_dataset

    path = convert_torch_dataset(args.torch, args.output)
    import numpy as np
    with np.load(path) as z:
        kind = "test (per-sequence)" if any(
            k.startswith("seq") for k in z.files) else "train (packed)"
        print(f"converted {args.torch} -> {path} [{kind}, "
              f"{len(z.files)} arrays]")


def cmd_preprocess(args):
    from a3gc_tpu.data.factory.amass import process_amass_split
    from a3gc_tpu.data.factory.dipimu import process_dipimu
    from a3gc_tpu.data.factory.totalcapture import process_totalcapture

    model = _load_body_model(args)
    if args.dataset == "amass":
        chunks = process_amass_split(model, mode=args.split, sym=args.cda,
                                     out_path=args.output)
        print(f"amass {args.split}: {len(chunks)} chunks -> {args.output}")
    elif args.dataset == "dipimu":
        out = process_dipimu(model, split=args.split, sym=args.cda,
                             out_path=args.output)
        print(f"dipimu {args.split}: {len(out)} items -> {args.output}")
    elif args.dataset == "totalcapture":
        seqs = process_totalcapture(model, out_path=args.output)
        print(f"totalcapture: {len(seqs)} sequences -> {args.output}")


def cmd_stats(args):
    from a3gc_tpu.data.pipeline import load_packed
    from a3gc_tpu.data.stats import compute_stats, save_stats

    fields = {}
    for path in args.inputs:
        data = load_packed(path)
        for k, v in data.items():
            fields.setdefault(k, []).append(v.reshape(-1, *v.shape[2:]))
    save_stats(compute_stats(fields), args.output)
    print("stats ->", args.output)


def cmd_convert(args):
    import jax
    import orbax.checkpoint as ocp
    from a3gc_tpu.compat import (
        dip_params_from_state_dict, graph_net_params_from_state_dict,
        load_torch_checkpoint)

    if args.to_torch:
        return _convert_to_torch(args)
    _require(args.torch, "give --torch (import) or --to_torch (export)")
    sd = load_torch_checkpoint(args.torch)
    if args.model in ("tp", "dip"):
        params = dip_params_from_state_dict(sd)
    else:
        params = graph_net_params_from_state_dict(sd, args.model)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), params, force=True)
    ckptr.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {args.torch} ({n:,} params) -> {args.output}")


def _convert_to_torch(args):
    r"""Reverse conversion: one of OUR orbax checkpoints → a reference
    ``.tar`` the torch tooling can consume (inverse layouts, see
    compat/torch_export.py)."""
    import jax
    from a3gc_tpu.compat import (dip_state_dict, graph_net_state_dict,
                                 save_torch_checkpoint)
    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.models import nets as N
    from a3gc_tpu.models.pipeline import PoseNetConfig, init_pose_net
    from a3gc_tpu.utils import restore_params

    nira = load_adjacency_template()
    if args.model in ("tp", "dip"):
        cfg = PoseNetConfig(net=N.DIPConfig(
            n_input=args.n_input, n_output=args.n_output,
            n_hidden=args.hu1))
        template = init_pose_net(jax.random.PRNGKey(0), cfg)
        params = restore_params(args.to_torch, template)
        sd = dip_state_dict(params)
    else:
        cfg = PoseNetConfig(net=N.GraphNetConfig(
            cell=args.model, units_in=args.n_input,
            units_out=args.n_output, units_hidden=args.hu1))
        template = init_pose_net(jax.random.PRNGKey(0), cfg, nira)
        params = restore_params(args.to_torch, template)
        sd = graph_net_state_dict(params, args.model)
    save_torch_checkpoint(args.output, sd, epoch=args.epoch)
    print(f"exported {args.to_torch} ({len(sd)} tensors) -> {args.output}")


def build_parser():
    p = argparse.ArgumentParser(prog="a3gc_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="3-stage cascade training")
    _add_common_model_flags(t)
    t.add_argument("-b", "--batch_size", type=int, required=True)
    t.add_argument("--accum", type=int, default=1,
                   help="microbatch gradient accumulation: split each "
                        "batch into this many sequential microbatches "
                        "(peak activation memory of one microbatch; one "
                        "Adam update on the averaged gradients) — reaches "
                        "effective batch sizes past the OOM knee")
    t.add_argument("--eval_batch", type=int, default=0,
                   help="validation forward chunk size (0 = auto: "
                        "min(batch_size, 128)). Validation has no remat "
                        "and hoists the input projections, so it can OOM "
                        "at batch sizes training fits; chunking bounds it "
                        "— the loss is the exact size-weighted mean")
    t.add_argument("--keep", type=int, default=0, metavar="N",
                   help="checkpoint retention: keep only the newest N "
                        "improvement checkpoints this run writes "
                        "(0 = reference behavior, keep all). Natural-stop "
                        "runs at deep LR decay otherwise pile up 50+ "
                        "noise-level improvements (docs/validation/"
                        "TRAIN_NATURAL_STOP.md). Previous runs' files and "
                        "preemption-interrupt checkpoints are never "
                        "pruned; resume/discovery see the newest kept")
    t.add_argument("--min_delta", type=float, default=0.0,
                   help="checkpoint retention: only write an improvement "
                        "checkpoint when the valid loss beats the last "
                        "SAVED one by more than this (early stopping is "
                        "unaffected — this bounds disk writes only)")
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--weight-decay", "--wd", dest="weight_decay", type=float,
                   default=0.0,
                   help="L2 weight decay folded into the gradient, torch "
                        "Adam style (default 0.0 = the reference's Adam "
                        "default, ref: train_a3gc_tp.py:26-27,234-236)")
    t.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="compute dtype of the forward/backward pass; "
                        "bfloat16 keeps fp32 master params and casts "
                        "params+inputs per step (measured ~2.7x faster "
                        "training on TPU)")
    t.add_argument("--patience", type=int, default=3)
    t.add_argument("--epochs", type=int, default=500)
    t.add_argument("-f", "--finetuning", action="store_true")
    t.add_argument("--fse", action="store_true",
                   help="validate on full variable-length sequences "
                        "(valid_data must be a test-style npz; "
                        "ref: train_a3gc_tp.py:18)")
    t.add_argument("--resume", type=str, default="")
    t.add_argument("--start_at", type=int, default=1)
    t.add_argument("--start_epoch", type=int, default=0)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--name", type=str, default="save_temp")
    t.add_argument("--save_root", type=str, default="trained_models")
    t.add_argument("--train_data", type=str, required=True)
    t.add_argument("--valid_data", type=str, required=True)
    t.add_argument("--device_data", action="store_true",
                   help="upload the train+valid corpora to device HBM "
                        "once and gather batches by index inside the "
                        "jitted step — removes the per-step host->device "
                        "batch transfer (measured 3.7x steady epoch at "
                        "AMASS scale; see docs/PERFORMANCE.md). Costs "
                        "corpus-size HBM (pair with --accum). With "
                        "--mesh the corpus row-shards over the data "
                        "axis: each chip holds 1/D of it and gathers "
                        "its own batch rows (per-shard shuffling)")
    t.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="with --device_data: fold this many consecutive "
                        "optimizer steps into one lax.scan dispatch "
                        "(identical parameter trajectory). Breaks the "
                        "per-step host round-trip bound of small-batch "
                        "epochs on a relay-attached TPU (the reference "
                        "b=16 protocol runs 625 steps/epoch)")
    t.add_argument("--mesh", action="store_true",
                   help="shard the batch over all visible devices")
    t.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: devices per model replica; "
                        "the gate/feature axis of wide kernels is split "
                        "over the mesh 'model' axis (implies --mesh)")
    t.add_argument("--coordinator", type=str, default=None,
                   metavar="HOST:PORT",
                   help="multi-host (DCN) training: join a "
                        "jax.distributed runtime whose process 0 listens "
                        "here; run the SAME command on every host with "
                        "its own --process_id. Implies --mesh over the "
                        "GLOBAL device set; gradients psum across hosts. "
                        "All hosts need identical flags/data/seed; "
                        "process 0 writes logs, checkpoints are written "
                        "cooperatively (shared filesystem)")
    t.add_argument("--num_processes", type=int, default=1,
                   help="total participating processes (with "
                        "--coordinator)")
    t.add_argument("--process_id", type=int, default=0,
                   help="this process's rank in [0, num_processes) "
                        "(with --coordinator)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate", help="cascade evaluation")
    _add_common_model_flags(e)
    e.add_argument("--path", type=str, default="",
                   help="directory of this framework's checkpoints")
    e.add_argument("--torch_checkpoints", nargs="+", default=None,
                   help="reference .tar checkpoints (stages 1 2 3; just one "
                        "for --model dip)")
    e.add_argument("--type", choices=("pretrain", "finetuning"),
                   default="finetuning")
    e.add_argument("--mid1", type=int, default=-1)
    e.add_argument("--mid2", type=int, default=-1)
    e.add_argument("--mid3", type=int, default=-1)
    e.add_argument("--datasets", nargs="+", required=True,
                   help="test npz files (from preprocess)")
    e.add_argument("--save_preds", action="store_true",
                   help="dump per-sequence gt/pred poses "
                        "(ref: evaluate_a3gc_tp.py:155-178)")
    e.add_argument("--batch_streams", type=int, default=1,
                   help="evaluate N sequences per kernel pass (multi-stream "
                        "path; 1 = the reference's per-sequence protocol)")
    e.add_argument("--mesh", action="store_true",
                   help="with --batch_streams: shard the streams over all "
                        "devices' data axis (shard_map; each device runs "
                        "its own kernels on its local streams)")
    _add_quality_flag(e)
    e.add_argument("--streaming", type=int, default=0, metavar="W",
                   help="evaluate through the ONLINE path: feed each "
                        "sequence as W-frame windows with carried state "
                        "(the cli stream/serve code path) and score the "
                        "emissions with the same 5-metric table — prices "
                        "a streaming deployment in the published metrics")
    e.add_argument("--lookahead", type=int, default=None, metavar="K",
                   help="with --streaming: buffer K future windows before "
                        "each emission (+K windows latency)")
    e.add_argument("--history", type=int, default=None, metavar="P",
                   help="with --streaming: re-run up to P past windows as "
                        "leading context per emission (zero added latency)")
    e.set_defaults(fn=cmd_evaluate)

    st = sub.add_parser("stream", help="online streaming inference "
                        "(windowed, carried recurrent state)")
    _add_common_model_flags(st)
    st.add_argument("--input", type=str, required=True,
                    help="packed test npz (from preprocess)")
    st.add_argument("--window", type=int, default=None,
                    help="frames per streaming window (default 60 = 1 s "
                         "at 60 fps; with --artifact: bundle geometry "
                         "selector)")
    st.add_argument("--output", type=str, default="",
                    help="npz to write predicted pose sequences to")
    st.add_argument("--pipelined", action="store_true",
                    help="overlap device execution with the host round-trip "
                         "(results lag one window; hides per-call latency)")
    st.add_argument("--lookahead", type=int, nargs="?", const=1,
                    default=None,
                    metavar="K",
                    help="K-window lookahead (bare flag = 1): each emitted "
                         "window's backward direction also sees the next K "
                         "windows (K+1 windows of context), cutting "
                         "streaming-vs-offline divergence; costs ~(K+2)x "
                         "compute and K windows of latency")
    st.add_argument("--evaluate", action="store_true",
                    help="after streaming, score the emissions against "
                         "the npz ground truth with the reference "
                         "5-metric table (the accuracy of THIS "
                         "window/lookahead/history configuration)")
    st.add_argument("--history", type=int, nargs="?", const=1,
                    default=None,
                    metavar="P",
                    help="P-window history (bare flag = 1): each emission "
                         "re-runs up to P already-emitted past windows as "
                         "leading attention context — cuts divergence at "
                         "ZERO added latency (composes with --lookahead; "
                         "~(P+K+2)x compute)")
    st.add_argument("--streams", type=int, default=None,
                    help="multiplex N independent clients through one "
                         "compiled multi-stream program (per-client state, "
                         "per-client reset); aggregate stats printed "
                         "(with --artifact: bundle geometry selector)")
    st.add_argument("--mesh", action="store_true",
                    help="with --streams: shard the client slots over all "
                         "devices' data axis (shard_map'd online step; "
                         "per-shard carried state)")
    st.add_argument("--artifact", type=str, default="",
                    help="stream through a `cli export` deployment artifact "
                         "(geometry from its manifest; ignores checkpoint/"
                         "stats/model flags)")
    st.add_argument("--path", type=str, default="")
    st.add_argument("--torch_checkpoints", nargs="+", default=None)
    st.add_argument("--type", choices=("pretrain", "finetuning"),
                    default="finetuning")
    st.add_argument("--mid1", type=int, default=-1)
    st.add_argument("--mid2", type=int, default=-1)
    st.add_argument("--mid3", type=int, default=-1)
    _add_quality_flag(st)
    st.set_defaults(fn=cmd_stream)

    ex = sub.add_parser("export", help="AOT deployment export: serialize "
                        "the streaming cascade to a StableHLO artifact "
                        "(params/stats/body baked in; runs from bare jax)")
    _add_common_model_flags(ex)
    ex.add_argument("--output", type=str, required=True,
                    help="artifact directory to write")
    ex.add_argument("--window", type=int, nargs="+", default=[60],
                    help="window size(s); several values (or several "
                         "--streams) produce a multi-geometry BUNDLE: one "
                         "directory indexing a sub-artifact per "
                         "(streams, window) pair")
    ex.add_argument("--streams", type=int, nargs="+", default=[1],
                    help="serving slots compiled into the program "
                         "(several values -> bundle)")
    ex.add_argument("--lookahead", type=int, default=None, metavar="K",
                    help="also export the window multiples a lookahead-K "
                         "deployment needs ({W..(K+1)W} per stream count) "
                         "so `serve/stream --artifact --lookahead K` can "
                         "run buffered emissions from the bundle")
    ex.add_argument("--history", type=int, default=None, metavar="P",
                    help="also export the window multiples a history-P "
                         "deployment needs ({W..(P+K+1)W} per stream "
                         "count) for `serve/stream --artifact --history`")
    ex.add_argument("--backend", choices=("xla", "pallas"), default="xla",
                    help="xla = portable (cpu+tpu) under jax.export's "
                         "compatibility guarantees; pallas = bake the "
                         "Mosaic whole-scan kernels (tpu-only artifact)")
    ex.add_argument("--platforms", nargs="+", default=None,
                    help="override lowering platforms (default: cpu tpu, "
                         "or tpu for --backend pallas)")
    ex.add_argument("--path", type=str, default="")
    ex.add_argument("--torch_checkpoints", nargs="+", default=None)
    ex.add_argument("--type", choices=("pretrain", "finetuning"),
                    default="finetuning")
    ex.add_argument("--mid1", type=int, default=-1)
    ex.add_argument("--mid2", type=int, default=-1)
    ex.add_argument("--mid3", type=int, default=-1)
    _add_quality_flag(ex)
    ex.set_defaults(fn=cmd_export)

    pp = sub.add_parser("preprocess", help="offline data factory")
    _add_common_model_flags(pp)
    pp.add_argument("--dataset", choices=("amass", "dipimu", "totalcapture"),
                    required=True)
    pp.add_argument("--split", choices=("train", "valid", "test"),
                    default="train")
    pp.add_argument("--output", type=str, required=True)
    pp.set_defaults(fn=cmd_preprocess)

    s = sub.add_parser("stats", help="normalization statistics")
    s.add_argument("--inputs", nargs="+", required=True)
    s.add_argument("--output", type=str, required=True)
    _add_cache_flag(s)
    s.set_defaults(fn=cmd_stats)

    w = sub.add_parser("worst-frames",
                       help="best/worst-frame comparison of two models")
    _add_common_model_flags(w)
    w.add_argument("--gt", type=str, required=True,
                   help="directory of ground-truth pose pickles")
    w.add_argument("--pred_a", type=str, required=True)
    w.add_argument("--pred_b", type=str, required=True)
    w.add_argument("--k", type=int, default=10)
    w.add_argument("--min_separation", type=int, default=300)
    w.add_argument("--output", type=str, default="best_worst")
    w.add_argument("--render", action="store_true",
                   help="also rasterize each selected frame as a PNG "
                        "(gt | A | B skeletons, built-in headless "
                        "renderer) next to the pickles")
    w.set_defaults(fn=cmd_worst_frames)

    sv = sub.add_parser("serve", help="dynamic-batching HTTP pose serving "
                        "(multi-stream, per-client state)")
    _add_common_model_flags(sv)
    sv.add_argument("--window", type=int, default=None,
                    help="frames per window (default 60; with --artifact: "
                         "bundle geometry selector)")
    sv.add_argument("--streams", type=int, default=None,
                    help="max concurrent client sessions (one kernel row "
                         "block per 8; default 8; with --artifact: bundle "
                         "geometry selector)")
    sv.add_argument("--host", type=str, default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8765)
    sv.add_argument("--max_wait_ms", type=float, default=5.0,
                    help="request-coalescing window per device step")
    sv.add_argument("--mesh", action="store_true",
                    help="shard the serving slots over all devices' data "
                         "axis (multi-chip online serving)")
    sv.add_argument("--lookahead", type=int, default=None,
                    help="K-window lookahead: emissions lag K windows but "
                         "each emitted window's backward direction sees K "
                         "extra windows of future context (lower "
                         "streaming-vs-offline divergence; ~(K+2)x "
                         "compute)")
    sv.add_argument("--history", type=int, default=None,
                    help="P-window history: emissions re-run up to P past "
                         "windows as leading attention context (lower "
                         "divergence at zero added latency; composes with "
                         "--lookahead; ~(P+K+2)x compute)")
    sv.add_argument("--artifact", type=str, default="",
                    help="serve from a `cli export` deployment artifact "
                         "directory (geometry from its manifest; ignores "
                         "checkpoint/stats/model flags)")
    sv.add_argument("--recycle_rss_mb", type=int, default=0,
                    help="self-recycle when the process RSS exceeds this "
                         "(MB): drain in-flight work, snapshot every live "
                         "session's carried state, exec a fresh process "
                         "that inherits the listening socket and resumes "
                         "the sessions — the mitigation for the relay "
                         "client's per-call host-buffer leak "
                         "(docs/PERFORMANCE.md). POST /v1/recycle "
                         "triggers one on demand. 0 = off")
    sv.add_argument("--path", type=str, default="")
    sv.add_argument("--torch_checkpoints", nargs="+", default=None)
    sv.add_argument("--type", choices=("pretrain", "finetuning"),
                    default="finetuning")
    sv.add_argument("--mid1", type=int, default=-1)
    sv.add_argument("--mid2", type=int, default=-1)
    sv.add_argument("--mid3", type=int, default=-1)
    _add_quality_flag(sv)
    sv.set_defaults(fn=cmd_serve)

    c = sub.add_parser("convert-checkpoint",
                       help="torch .tar <-> orbax checkpoint (both ways)")
    c.add_argument("--torch", type=str, default="",
                   help="reference .tar to IMPORT (-> --output orbax dir)")
    c.add_argument("--to_torch", type=str, default="",
                   help="one of OUR orbax checkpoints to EXPORT as a "
                        "reference .tar (-> --output; set --n_input/"
                        "--n_output/--hu1 to the net's sizes)")
    c.add_argument("--model", choices=MODEL_CHOICES, required=True)
    c.add_argument("--output", type=str, required=True)
    c.add_argument("--n_input", type=int, default=15)
    c.add_argument("--n_output", type=int, default=9)
    c.add_argument("--hu1", type=int, default=128,
                   help="hidden units of the exported net")
    c.add_argument("--epoch", type=int, default=0,
                   help="epoch number recorded in the exported .tar")
    _add_cache_flag(c)
    c.set_defaults(fn=cmd_convert)

    cd = sub.add_parser("convert-data",
                        help="reference packed .pt dataset -> npz "
                             "(train or test layout, auto-detected)")
    cd.add_argument("--torch", type=str, required=True,
                    help="reference transform_to_torch_data* output .pt")
    cd.add_argument("--output", type=str, required=True)
    _add_cache_flag(cd)
    cd.set_defaults(fn=cmd_convert_data)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "data_root", None):
        os.environ["A3GC_DATA_ROOT"] = args.data_root
    if getattr(args, "debug_nans", False):
        import jax
        jax.config.update("jax_debug_nans", True)
    if getattr(args, "compilation_cache", None):
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache)
        # cache every compile, not just the slow ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if getattr(args, "profile", None):
        import jax
        with jax.profiler.trace(args.profile):
            return args.fn(args)
    return args.fn(args)


if __name__ == "__main__":
    main()
