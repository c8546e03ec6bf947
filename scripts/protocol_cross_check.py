#!/usr/bin/env python
r"""Cross-framework protocol validation: the TORCH REFERENCE evaluates
checkpoints TRAINED BY THIS FRAMEWORK (exported via compat/torch_export)
on the same test set, reproducing the reference's evaluate flow
(ref: evaluate_a3gc_tp.py:64-94 prepare_input with --norm stats, :147-187
cascade + FullMotionEvaluator; evaluate_tp.py:85,149-153 for the dense
cascade; evaluate_dip.py:79-106 for the single DIP net), and the two
frameworks' 5-metric reports are compared row by row. ``--model`` covers
ALL SIX families: a3gc / aagc / agc / ggru (graph cascades), tp (dense
cascade), dip (single net).

This closes the loop the protocol dry run opened: not just "the protocol
runs end-to-end here", but "a user can train HERE and deploy the weights
in the reference (or vice versa) and the published metric table agrees".

Run after scripts/run_reference_protocol.sh, e.g.:

  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
    scripts/protocol_cross_check.py \
    --run_dir /tmp/protocol_run2 --data_root /tmp/protocol_assets \
    --smpl /tmp/protocol_assets/smpl.pkl --hu1 32 --hu2 16 --hu3 32 \
    --out docs/validation/PROTOCOL_CROSSCHECK.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REFERENCE = os.environ.get("A3GC_REFERENCE", "/root/reference")
METRICS = ("SIP err (deg)", "angular err (deg)", "positional err (cm)",
           "jerk err (km/s^3)", "jitter (100m/s^3)")


def _pin_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as xb
    if not xb.backends_are_initialized():
        xb._backend_factories.pop("axon", None)


def load_our_stack(args):
    import jax
    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.models import nets as N
    from a3gc_tpu.models.pipeline import (CascadeConfig, PoseNetConfig,
                                          init_pose_net)
    from a3gc_tpu.utils import discover_latest, restore_params

    def gcfg(ui, uo, h, rot):
        return PoseNetConfig(net=N.GraphNetConfig(
            cell=args.model, units_in=ui, units_out=uo, units_hidden=h),
            rotsize=rot)

    def dcfg(ni, no, h, rot):
        return PoseNetConfig(net=N.DIPConfig(
            n_input=ni, n_output=no, n_hidden=h), rotsize=rot)

    nira = load_adjacency_template()
    ckpt_dir = os.path.join(args.run_dir, "models", f"{args.model}_protocol")
    if args.model == "dip":
        # single-stage DIP (ref: train_dip.py:128, evaluate_dip.py:88)
        cfg = dcfg(60, 135, args.hu1, 9)
        template = init_pose_net(jax.random.PRNGKey(0), cfg)
        found = discover_latest(ckpt_dir, 1, phase=args.phase)
        assert found, f"no {args.phase} checkpoint in {ckpt_dir}"
        print(f"dip: {found[0]}")
        return cfg, (restore_params(found[0], template),), nira
    if args.model == "tp":
        # fixed published geometry (ref: train_tp.py:163-165)
        cfg = CascadeConfig(stage1=dcfg(72, 15, 256, 3),
                            stage2=dcfg(87, 69, 64, 3),
                            stage3=dcfg(141, 135, 128, 9))
    else:
        cfg = CascadeConfig(stage1=gcfg(12, 3, args.hu1, 3),
                            stage2=gcfg(15, 3, args.hu2, 3),
                            stage3=gcfg(15, 9, args.hu3, 9))
    params3 = []
    for i, scfg in enumerate((cfg.stage1, cfg.stage2, cfg.stage3)):
        template = init_pose_net(jax.random.PRNGKey(i), scfg, nira)
        found = discover_latest(ckpt_dir, i + 1, phase=args.phase)
        assert found, f"no stage-{i+1} {args.phase} checkpoint in {ckpt_dir}"
        params3.append(restore_params(found[0], template))
        print(f"stage {i+1}: {found[0]}")
    return cfg, tuple(params3), nira


def our_metrics(args, cfg, params3, stats, sequences):
    from a3gc_tpu.eval.run import CascadeEvaluator, DipEvaluator
    from a3gc_tpu.smpl import load_parametric_model

    model = load_parametric_model(args.smpl)
    if args.model == "dip":
        import jax.numpy as jnp
        from a3gc_tpu.config import joint_set as JS
        from a3gc_tpu.data import pipeline as DPipe
        from a3gc_tpu.models.pipeline import (
            pose_net_forward, reduced_global_to_full_local)
        ev = DipEvaluator(params3[0], cfg, model, stats)
        mean, seconds, frames = ev.evaluate(sequences)
        preds = []
        for seq in sequences:   # DipEvaluator has no return_preds
            imu, _ = DPipe.dip_batch(
                {"ori": jnp.asarray(seq["ori"])[None],
                 "acc": jnp.asarray(seq["acc"])[None],
                 "pose": jnp.asarray(seq["pose"])[None]},
                {k: jnp.asarray(v) for k, v in stats.items()},
                no_root=True)
            out, _ = pose_net_forward(params3[0], cfg, imu)
            pose_p = reduced_global_to_full_local(
                out.reshape(-1, JS.n_reduced, 3, 3), model)
            pose_p = pose_p.at[:, jnp.asarray(JS.ignored)].set(jnp.eye(3))
            preds.append(np.asarray(pose_p))
        return np.asarray(mean)[:, 0], preds
    ev = CascadeEvaluator(params3, cfg, model, stats=stats, normalize=True)
    mean, seconds, frames, preds = ev.evaluate(sequences, return_preds=True)
    return np.asarray(mean)[:, 0], preds


def reference_metrics(args, params3, nira, stats, sequences):
    r"""The reference's own evaluate flow running OUR exported weights."""
    sys.path.insert(0, REFERENCE)
    import config as ref_config
    ref_config.paths.male_smpl_file = args.smpl
    import torch
    import net_aagc
    from articulate.evaluator import FullMotionEvaluator as RefFME

    from a3gc_tpu.compat import graph_net_state_dict
    from a3gc_tpu.config import joint_set as JS
    cell = args.model

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_net_parity import _dealias_parameters

    nira_t = torch.from_numpy(nira)
    nets = []
    if args.model == "dip":
        # single DIP net, no-root 60-channel input (ref: evaluate_dip.py:
        # 79-80,88,106)
        from a3gc_tpu.compat import dip_state_dict
        net = net_aagc.PoseNetDIP(rotsize=9, n_hidden=args.hu1)
        sd = dip_state_dict(params3[0])
        net.load_state_dict({k: torch.from_numpy(np.asarray(v))
                             for k, v in sd.items()})
        net.eval()
        nets = [net, None, None]
    elif args.model == "tp":
        # dense TransPose cascade (ref: evaluate_tp.py:116-118)
        from a3gc_tpu.compat import dip_state_dict
        for p, (ni, no, h) in zip(params3, ((72, 15, 256), (87, 69, 64),
                                            (141, 135, 128))):
            net = net_aagc.PoseNetTP(input_size=ni, n_output=no, n_hidden=h)
            sd = dip_state_dict(p)
            net.load_state_dict({k: torch.from_numpy(np.asarray(v))
                                 for k, v in sd.items()})
            net.eval()
            nets.append(net)
    else:
        hus = (args.hu1, args.hu2, args.hu3)
        ins = (12, 15, 15)
        rots = (3, 3, 9)
        # all four graph reference classes share one ctor signature
        # (ref: net_aagc.py:697-904)
        ref_cls = {"a3gc": net_aagc.PoseNet3, "aagc": net_aagc.PoseNet,
                   "agc": net_aagc.PoseNet_AGC,
                   "ggru": net_aagc.PoseNet_GGRU}[args.model]
        for p, h, ui, rot in zip(params3, hus, ins, rots):
            net = ref_cls(input_size=ui, rotsize=rot,
                          adjacency=nira_t, n_hidden=h)
            _dealias_parameters(net)
            sd = graph_net_state_dict(p, cell)
            net.load_state_dict({k: torch.from_numpy(np.asarray(v))
                                 for k, v in sd.items()})
            net.eval()
            nets.append(net)
    net1, net2, net3 = nets

    om = torch.from_numpy(stats["ori_mean_channel"]).float()
    os_ = torch.from_numpy(stats["ori_std_channel"]).float()
    am = torch.from_numpy(stats["acc_mean_channel"]).float()
    as_ = torch.from_numpy(stats["acc_std_channel"]).float()

    eval_fn = RefFME(args.smpl, joint_mask=torch.tensor([1, 2, 16, 17]))
    errs_all, preds = [], []
    with torch.no_grad():
        for seq in sequences:
            T = seq["ori"].shape[0]
            ori = (torch.from_numpy(seq["ori"]).float() - om) / os_
            acc = (torch.from_numpy(seq["acc"]).float() - am) / as_
            if args.model == "dip":
                # no-root input, one net (ref: evaluate_dip.py:79-80,106)
                x = torch.cat((acc[:, :-3], ori[:, :-9]),
                              dim=-1).unsqueeze(0)
                pose_p, _ = net1.forward_offline(x)
            elif args.model == "tp":
                # flat input + flat stage concat (ref: evaluate_tp.py:85,
                # 149-153)
                x = torch.cat((acc, ori), dim=-1).unsqueeze(0)
                leaf_pos, _ = net1.forward_offline(x)
                x2 = torch.cat((x, leaf_pos), dim=-1)
                full_pos, _ = net2.forward_offline(x2)
                x3 = torch.cat((x, full_pos), dim=-1)
                pose_p, _ = net3.forward_offline(x3)
            else:
                # scatter 5 non-root sensors onto the graph
                # (ref: evaluate_a3gc_tp.py:88-93)
                x = torch.zeros((T, 15, 12))
                inp = torch.cat((acc.view(-1, 6, 3)[:, :5],
                                 ori.view(-1, 6, 9)[:, :5]), dim=-1)
                for i, el in enumerate([3, 4, 13, 14, 10]):
                    x[:, el] = inp[:, i]
                x = x.unsqueeze(0)
                # cascade (ref: evaluate_a3gc_tp.py:164-171)
                leaf_pos, _ = net1.forward_offline(x)
                x2 = torch.cat((x, leaf_pos.view(1, T, 15, 3)), dim=-1)
                full_pos, _ = net2.forward_offline(x2)
                x3 = torch.cat((x, full_pos.view(1, T, 15, 3)), dim=-1)
                pose_p, _ = net3.forward_offline(x3)

            pose_t = torch.eye(3).repeat(T, 24, 1, 1)
            pose_t[:, list(JS.reduced)] = torch.from_numpy(
                seq["pose"]).view(-1, 15, 3, 3)
            pp = pose_p.view(-1, 24, 3, 3).clone()
            pp[:, list(JS.ignored)] = torch.eye(3)
            pose_t[:, list(JS.ignored)] = torch.eye(3)
            errs = eval_fn(pp, pose_t)
            errs_all.append(torch.stack(
                [errs[9], errs[3], errs[0] * 100, errs[10] / 1000,
                 errs[4] / 100]))
            preds.append(pp.numpy())
    return torch.stack(errs_all).mean(dim=0)[:, 0].numpy(), preds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--smpl", required=True)
    ap.add_argument("--model", default="a3gc")
    ap.add_argument("--phase", default="finetuning")
    ap.add_argument("--hu1", type=int, default=256)
    ap.add_argument("--hu2", type=int, default=64)
    ap.add_argument("--hu3", type=int, default=128)
    ap.add_argument("--datasets", nargs="+", default=None,
                    help="test npz files (default: <run_dir>/dip_test.npz)")
    ap.add_argument("--out", default=None, help="write a JSON artifact")
    args = ap.parse_args()

    _pin_cpu()
    from a3gc_tpu.data.factory.dipimu import load_test_sequences
    from a3gc_tpu.data.stats import load_stats

    stats = load_stats(os.path.join(args.data_root, "stats",
                                    "all_sym_train_stats.npz"))
    cfg, params3, nira = load_our_stack(args)

    results = {}
    for path in (args.datasets or
                 [os.path.join(args.run_dir, "dip_test.npz")]):
        sequences = load_test_sequences(path)
        ours, our_preds = our_metrics(args, cfg, params3, stats, sequences)
        ref, ref_preds = reference_metrics(args, params3, nira, stats,
                                           sequences)
        # prediction-level parity: the two frameworks' full local poses on
        # the SAME weights must agree to float noise — this is the real
        # cross-framework claim, independent of metric-extraction details
        pred_delta = max(float(np.abs(a - b).max())
                         for a, b in zip(our_preds, ref_preds))
        # conditioning of the predictions: near-singular rotations put the
        # angle metrics in cv2-vs-SVD implementation-defined territory
        # (cv2.Rodrigues SVD-projects; at min-singular-value ~0 the
        # projection is degenerate and fp-noise flips extracted angles)
        min_sv = min(float(np.linalg.svd(
            p.reshape(-1, 3, 3), compute_uv=False).min())
            for p in ref_preds)
        rows = []
        print(f"\n== {path} ({len(sequences)} sequences)  "
              f"pred max|delta| {pred_delta:.2e}  min singular {min_sv:.4f}")
        print(f"{'metric':24s} {'ours':>12s} {'torch ref':>12s} "
              f"{'delta':>10s}")
        for name, a, b in zip(METRICS, ours, ref):
            print(f"{name:24s} {a:12.4f} {b:12.4f} {a - b:10.6f}")
            rows.append({"metric": name, "ours": float(a),
                         "torch_reference": float(b),
                         "delta": float(a - b)})
        results[f"{args.model}:{os.path.basename(path)}"] = {
            "rows": rows, "pred_max_abs_delta": pred_delta,
            "pred_min_singular_value": min_sv,
            "sequences": len(sequences)}
        assert pred_delta < 5e-5, f"prediction parity {pred_delta} > 5e-5"
        # angle metrics: 0.05 deg (half the 0.1 deg SIP parity budget;
        # residual deltas are angle EXTRACTION on ill-conditioned
        # rotations — measured: reference evaluator on our predictions is
        # bit-identical to on its own, docs/validation/PROTOCOL_CROSSCHECK.md).
        # Near-singular predictions (min singular value < 0.01 — barely-
        # trained nets) put cv2-vs-SVD extraction in implementation-defined
        # territory; the budget there is 0.2 deg with prediction parity
        # (above) still the hard 5e-5 gate.
        angle_budget = 0.05 if min_sv >= 0.01 else 0.2
        assert abs(ours[0] - ref[0]) < angle_budget, \
            f"SIP parity >{angle_budget} deg"
        assert abs(ours[1] - ref[1]) < angle_budget, \
            f"angular parity >{angle_budget} deg"
        assert abs(ours[2] - ref[2]) < angle_budget, \
            f"positional parity >{angle_budget} cm"

    if args.out:
        if os.path.exists(args.out):   # merge per-model sections
            with open(args.out) as fh:
                results = {**json.load(fh), **results}
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"\nwrote {args.out}")
    print("\nCROSS-CHECK PASSED: the torch reference reproduces this "
          "framework's metric table on its own evaluate flow.")


if __name__ == "__main__":
    main()
