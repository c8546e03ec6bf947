"""End-to-end cascade evaluation parity: the reference's evaluate_a3gc_tp
flow (torch, batch-1, native lengths) vs this framework's bucketed masked
single-program evaluator — same trained checkpoints, same synthetic SMPL,
same synthetic IMU sequences. This is the SIP-parity gate of BASELINE.md."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from a3gc_tpu.compat import (
    graph_net_params_from_state_dict,
    load_torch_checkpoint,
)
from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.data import load_adjacency_template
from a3gc_tpu.eval import CascadeEvaluator
from a3gc_tpu.models import nets as N
from a3gc_tpu.models.pipeline import CascadeConfig, PoseNetConfig
from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle

TRAINED = "/root/reference/trained_models"

pytestmark = [
    pytest.mark.usefixtures("reference_path"),
    pytest.mark.skipif(not os.path.isdir(TRAINED),
                       reason="reference checkpoints not present"),
]


def synth_sequences(lengths, seed=0):
    """Synthetic IMU test sequences in the reference test_tp schema."""
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(seed)
    seqs = []
    for i, T in enumerate(lengths):
        ori = Rotation.random(T * 6, random_state=seed + i).as_matrix()
        pose = Rotation.random(T * 15, random_state=seed + 50 + i).as_matrix()
        seqs.append({
            "ori": ori.reshape(T, 54).astype(np.float32),
            "acc": rng.normal(scale=0.5, size=(T, 18)).astype(np.float32),
            "pose": pose.reshape(T, 135).astype(np.float32),
        })
    return seqs


@pytest.fixture(scope="module")
def smpl_pickle(tmp_path_factory):
    path = tmp_path_factory.mktemp("smpl") / "synthetic_smpl.pkl"
    return write_synthetic_smpl_pickle(str(path), n_vertices=192)


@pytest.fixture(scope="module")
def setup(smpl_pickle, reference_path):
    """Build both stacks with identical weights: converted model2/model3
    checkpoints + one shared fresh model1."""
    import torch
    import config as ref_config
    ref_config.paths.male_smpl_file = smpl_pickle
    import net_aagc
    from tests.test_net_parity import _dealias_parameters

    nira = load_adjacency_template()
    nira_t = torch.from_numpy(nira)

    # reference nets (PoseNet3 wrappers like evaluate_a3gc_tp.py:132-145)
    torch.manual_seed(0)
    net1 = net_aagc.PoseNet3(input_size=12, rotsize=3, adjacency=nira_t,
                             n_hidden=32)
    net2 = net_aagc.PoseNet3(input_size=15, rotsize=3, adjacency=nira_t,
                             n_hidden=64)
    net3 = net_aagc.PoseNet3(input_size=15, rotsize=9, adjacency=nira_t,
                             n_hidden=128)
    sd2 = load_torch_checkpoint(
        os.path.join(TRAINED, "A3GC/checkpoint_model2_finetuning_9.tar"))
    sd3 = load_torch_checkpoint(
        os.path.join(TRAINED, "A3GC/checkpoint_model3_finetuning_8.tar"))
    for net, sd in ((net2, sd2), (net3, sd3)):
        _dealias_parameters(net)
        net.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    for net in (net1, net2, net3):
        net.eval()
    sd1 = {f"pose_net.{k}": v.detach().numpy()
           for k, v in net1.pose_net.state_dict().items()}

    # our stack, converted from the same weights
    def gcfg(ui, uo, h):
        return PoseNetConfig(
            net=N.GraphNetConfig(cell="a3gc", units_in=ui, units_out=uo,
                                 units_hidden=h),
            rotsize={3: 3, 9: 9}[3 if uo == 3 else 9])

    cfg = CascadeConfig(stage1=gcfg(12, 3, 32), stage2=gcfg(15, 3, 64),
                        stage3=gcfg(15, 9, 128))
    params3 = (graph_net_params_from_state_dict(sd1, "a3gc"),
               graph_net_params_from_state_dict(sd2, "a3gc"),
               graph_net_params_from_state_dict(sd3, "a3gc"))
    model = load_parametric_model(smpl_pickle)
    return (net1, net2, net3), params3, cfg, model, smpl_pickle


def run_reference_eval(nets, sequences, smpl_pickle):
    """The reference evaluate_pose flow (ref: evaluate_a3gc_tp.py:147-187)."""
    import torch
    from articulate.evaluator import FullMotionEvaluator as RefFME

    net1, net2, net3 = nets
    eval_fn = RefFME(smpl_pickle, joint_mask=torch.tensor([1, 2, 16, 17]))

    def reduced_to_full(reduced):
        full = torch.eye(3).repeat(reduced.shape[0], 24, 1, 1)
        full[:, list(JS.reduced)] = reduced
        return full

    errs_all = []
    with torch.no_grad():
        for seq in sequences:
            T = seq["ori"].shape[0]
            # prepare_input without normalization (ref: :82-94)
            acc = torch.from_numpy(seq["acc"]).view(-1, 6, 3)[:, :5]
            ori = torch.from_numpy(seq["ori"]).view(-1, 6, 9)[:, :5]
            x = torch.zeros((T, 15, 12))
            for i, el in enumerate([3, 4, 13, 14, 10]):
                x[:, el] = torch.cat((acc[:, i], ori[:, i]), dim=-1)
            x = x.unsqueeze(0)
            leaf_pos, _ = net1.forward_offline(x)
            inp1 = torch.cat((x, leaf_pos.view(1, T, 15, 3)), dim=-1)
            full_pos, _ = net2.forward_offline(inp1)
            inp2 = torch.cat((x, full_pos.view(1, T, 15, 3)), dim=-1)
            pose_p, _ = net3.forward_offline(inp2)

            pose_t = reduced_to_full(
                torch.from_numpy(seq["pose"]).view(-1, 15, 3, 3))
            pp = pose_p.clone().view(-1, 24, 3, 3)
            tt = pose_t.clone().view(-1, 24, 3, 3)
            pp[:, list(JS.ignored)] = torch.eye(3)
            tt[:, list(JS.ignored)] = torch.eye(3)
            errs = eval_fn(pp, tt)
            errs_all.append(torch.stack(
                [errs[9], errs[3], errs[0] * 100, errs[10] / 1000,
                 errs[4] / 100]))
    return torch.stack(errs_all).mean(dim=0).numpy()


class TestCascadeParity:
    def test_full_eval_parity(self, setup):
        nets, params3, cfg, model, smpl_pickle = setup
        seqs = synth_sequences([137, 96], seed=3)
        ref_metric = run_reference_eval(nets, seqs, smpl_pickle)

        ev = CascadeEvaluator(params3, cfg, model)
        mean, seconds, frames = ev.evaluate(seqs)

        # SIP parity budget is 0.1 deg (BASELINE.md); require 10x tighter
        assert abs(mean[0, 0] - ref_metric[0, 0]) < 0.01, (mean, ref_metric)
        # angular (deg), positional (cm)
        assert abs(mean[1, 0] - ref_metric[1, 0]) < 0.01
        assert abs(mean[2, 0] - ref_metric[2, 0]) < 0.05
        # jerk rows are fps^3-scaled; compare relatively
        np.testing.assert_allclose(mean[3:, 0], ref_metric[3:, 0], rtol=5e-3)
        assert frames == 137 + 96

    def test_bucketing_invariance(self, setup):
        """Same sequence evaluated at two bucket paddings → same metrics."""
        _, params3, cfg, model, _ = setup
        seqs = synth_sequences([100], seed=4)
        ev = CascadeEvaluator(params3, cfg, model)
        m1, _, _ = ev.evaluate(seqs)

        # force a bigger bucket by threading a longer warmup
        import a3gc_tpu.eval.run as run_mod
        orig = run_mod.bucket_length
        try:
            run_mod.bucket_length = lambda n, minimum=512: orig(n, minimum)
            ev2 = CascadeEvaluator(params3, cfg, model)
            m2, _, _ = ev2.evaluate(seqs)
        finally:
            run_mod.bucket_length = orig
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   atol=1e-3, rtol=1e-4)


class TestBatchedEvaluator:
    def test_batched_equals_sequential(self, setup):
        """Multi-stream batched evaluation == per-sequence evaluation."""
        _, params3, cfg, model, _ = setup
        seqs = synth_sequences([137, 96, 40], seed=7)
        ev = CascadeEvaluator(params3, cfg, model)
        m_seq, _, f_seq = ev.evaluate(seqs)
        m_bat, _, f_bat = ev.evaluate_batched(seqs, streams=4)
        assert f_seq == f_bat
        np.testing.assert_allclose(m_bat, m_seq, rtol=1e-4, atol=1e-3)

    def test_wide_stream_group(self, setup):
        """streams=16 (metrics via one lax.map trace, not a per-stream
        unroll; group padded with empty slots) == per-sequence results."""
        _, params3, cfg, model, _ = setup
        seqs = synth_sequences([90, 40, 61], seed=9)
        ev = CascadeEvaluator(params3, cfg, model)
        m_seq, _, f_seq = ev.evaluate(seqs)
        m_bat, _, f_bat = ev.evaluate_batched(seqs, streams=16)
        assert f_seq == f_bat
        np.testing.assert_allclose(m_bat, m_seq, rtol=1e-4, atol=1e-3)

    def test_mesh_sharded_equals_local(self, setup):
        """evaluate_batched with the stream axis sharded over an 8-device
        mesh (shard_map serving path) == the single-device batched path."""
        from a3gc_tpu.config import MeshConfig
        from a3gc_tpu.parallel import make_mesh

        _, params3, cfg, model, _ = setup
        mesh = make_mesh(MeshConfig(data=8, model=1))
        seqs = synth_sequences([70, 45], seed=12)
        ev_local = CascadeEvaluator(params3, cfg, model)
        ev_mesh = CascadeEvaluator(params3, cfg, model, mesh=mesh)
        m_l, _, f_l = ev_local.evaluate_batched(seqs, streams=8)
        m_m, _, f_m = ev_mesh.evaluate_batched(seqs, streams=8)
        assert f_l == f_m
        np.testing.assert_allclose(m_m, m_l, rtol=1e-5, atol=1e-5)
