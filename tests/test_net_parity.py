"""L5 model zoo: numerical parity with the reference nets.

Two layers of evidence:
  1. cell / net level against freshly-initialized reference torch modules
     (covers AAGC / A3GC / AGC / G-GRU / DIP forward math), and
  2. against the *shipped trained checkpoints* (A3GC, G-GRU, TransPose
     stages 2+3) — the strongest possible oracle for converter + forward.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3gc_tpu.compat import (
    dip_params_from_state_dict,
    graph_net_params_from_state_dict,
    load_torch_checkpoint,
)
from a3gc_tpu.data import load_adjacency_template
from a3gc_tpu.models import nets as N

TRAINED = "/root/reference/trained_models"

pytestmark = pytest.mark.usefixtures("reference_path")


@pytest.fixture(scope="module")
def nira():
    return load_adjacency_template()


@pytest.fixture(scope="module")
def ref_nets(reference_path):
    import net_aagc
    return net_aagc


def _torch_state_dict(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _dealias_parameters(module):
    """The reference builds every adjacency Parameter from a .t() *view* of
    the one nira tensor (ref: net_aagc.py:56,88-91,151-154), so in-place
    ``load_state_dict`` writes all of them into the SAME storage and the last
    key wins — silently corrupting a freshly-constructed torch model. (The
    shipped checkpoints hold distinct per-gate adjacencies, so the original
    training environment de-aliased them, e.g. via TorchScript parameter
    copies.) Clone every parameter's storage before loading."""
    for m in module.modules():
        for _, p in m.named_parameters(recurse=False):
            p.data = p.data.clone()


def _run_ref_net(net, x):
    import torch
    net.eval()
    with torch.no_grad():
        y, state = net(torch.from_numpy(x))
    return y.numpy()


class TestFreshNetParity:
    """Fresh torch nets → convert weights → same outputs."""

    @pytest.mark.parametrize("cell,ref_cls", [
        ("aagc", "AAGC_net"), ("a3gc", "A3GC_net"),
        ("agc", "AGC_net"), ("ggru", "G_GRU_net"),
    ])
    def test_graph_net(self, cell, ref_cls, nira, ref_nets):
        import torch
        torch.manual_seed(0)
        ref = getattr(ref_nets, ref_cls)(12, 9, 32, torch.from_numpy(nira))
        params = graph_net_params_from_state_dict(
            _torch_state_dict(ref), cell, prefix="")
        cfg = N.GraphNetConfig(cell=cell, units_in=12, units_out=9,
                               units_hidden=32)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 11, 15, 12)).astype(np.float32)
        ref_y = _run_ref_net(ref, x)
        ours, _ = N.graph_net_apply(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-5)

    def test_dip(self, ref_nets):
        import torch
        torch.manual_seed(1)
        ref = ref_nets.DIP(60, 135, 64)
        params = dip_params_from_state_dict(_torch_state_dict(ref), prefix="")
        cfg = N.DIPConfig(n_input=60, n_output=135, n_hidden=64)

        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 13, 60)).astype(np.float32)
        ref_y = _run_ref_net(ref, x)
        ours, _ = N.dip_apply(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-5)

    def test_state_carry_matches(self, nira, ref_nets):
        """Feeding a sequence in two halves with carried state == one pass."""
        import torch
        torch.manual_seed(2)
        ref = ref_nets.A3GC_net(12, 9, 16, torch.from_numpy(nira))
        params = graph_net_params_from_state_dict(
            _torch_state_dict(ref), "a3gc", prefix="")
        cfg = N.GraphNetConfig(cell="a3gc", units_in=12, units_out=9,
                               units_hidden=16)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 12, 15, 12)).astype(np.float32)
        full, _ = N.graph_net_apply(params, cfg, jnp.asarray(x))
        full2, _ = N.graph_net_apply(params, cfg, jnp.asarray(x))
        # determinism
        np.testing.assert_allclose(np.asarray(full), np.asarray(full2), atol=0)
        # a bidirectional net is NOT streamable, but carried state must be
        # shape-stable and must change the output vs a zero state
        y1, s = N.graph_net_apply(params, cfg, jnp.asarray(x[:, :6]))
        y2, _ = N.graph_net_apply(params, cfg, jnp.asarray(x[:, 6:]), state=s)
        y2_zero, _ = N.graph_net_apply(params, cfg, jnp.asarray(x[:, 6:]))
        assert y1.shape == (2, 6, 15, 9) and y2.shape == (2, 6, 15, 9)
        assert np.abs(np.asarray(y2) - np.asarray(y2_zero)).max() > 1e-6


needs_ckpt = pytest.mark.skipif(
    not os.path.isdir(TRAINED), reason="reference checkpoints not present")


@needs_ckpt
class TestTrainedCheckpointParity:
    """The shipped finetuned checkpoints, run through both stacks."""

    @pytest.mark.parametrize("ckpt,cell,ref_cls,units", [
        ("A3GC/checkpoint_model3_finetuning_8.tar", "a3gc", "A3GC_net",
         (15, 9, 128)),
        ("A3GC/checkpoint_model2_finetuning_9.tar", "a3gc", "A3GC_net",
         (15, 3, 64)),
        ("G-GRU/checkpoint_model3_finetuning_22.tar", "ggru", "G_GRU_net",
         (15, 9, 128)),
        ("G-GRU/checkpoint_model2_finetuning_10.tar", "ggru", "G_GRU_net",
         (15, 3, 64)),
    ])
    def test_graph_checkpoints(self, ckpt, cell, ref_cls, units, nira,
                               ref_nets):
        import torch
        units_in, units_out, hidden = units
        sd = load_torch_checkpoint(os.path.join(TRAINED, ckpt))

        ref = getattr(ref_nets, ref_cls)(units_in, units_out, hidden,
                                         torch.from_numpy(nira))
        _dealias_parameters(ref)
        ref.load_state_dict(
            {k[len("pose_net."):]: torch.from_numpy(v)
             for k, v in sd.items() if k.startswith("pose_net.")})

        params = graph_net_params_from_state_dict(sd, cell)
        cfg = N.GraphNetConfig(cell=cell, units_in=units_in,
                               units_out=units_out, units_hidden=hidden)

        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 40, 15, units_in)).astype(np.float32) * 0.5
        ref_y = _run_ref_net(ref, x)
        ours, _ = N.graph_net_apply(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref_y, atol=5e-5)

    @pytest.mark.parametrize("ckpt,sizes", [
        ("Transpose/checkpoint_model3_finetuning_8.tar", (141, 135, 128)),
        ("Transpose/checkpoint_model2_finetuning_8.tar", (87, 69, 64)),
    ])
    def test_transpose_checkpoints(self, ckpt, sizes, ref_nets):
        import torch
        n_in, n_out, hidden = sizes
        sd = load_torch_checkpoint(os.path.join(TRAINED, ckpt))

        ref = ref_nets.DIP(n_in, n_out, hidden)
        ref.load_state_dict(
            {k[len("pose_net."):]: torch.from_numpy(v)
             for k, v in sd.items() if k.startswith("pose_net.")})

        params = dip_params_from_state_dict(sd)
        cfg = N.DIPConfig(n_input=n_in, n_output=n_out, n_hidden=hidden)

        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 40, n_in)).astype(np.float32) * 0.5
        ref_y = _run_ref_net(ref, x)
        ours, _ = N.dip_apply(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref_y, atol=5e-5)


class TestInitializers:
    """Fresh inits produce the right shapes and match converter layouts."""

    @pytest.mark.parametrize("cell", ["aagc", "a3gc", "agc", "ggru"])
    def test_init_shapes_and_forward(self, cell, nira):
        cfg = N.GraphNetConfig(cell=cell, units_in=12, units_out=9,
                               units_hidden=16)
        params = N.init_graph_net(jax.random.PRNGKey(0), cfg, nira)
        x = jnp.zeros((2, 5, 15, 12))
        y, state = N.graph_net_apply(params, cfg, x)
        assert y.shape == (2, 5, 15, 9)
        # training mode with dropout rng runs too
        y2, _ = N.graph_net_apply(params, cfg, x, rng=jax.random.PRNGKey(1))
        assert y2.shape == y.shape

    def test_dip_init_forward(self):
        cfg = N.DIPConfig(n_input=60, n_output=45, n_hidden=32)
        params = N.init_dip(jax.random.PRNGKey(0), cfg)
        y, _ = N.dip_apply(params, cfg, jnp.zeros((2, 7, 60)))
        assert y.shape == (2, 7, 45)

    def test_agc_adjacency_orientation_matches_reference_init(
            self, nira, ref_nets):
        """The fresh-init adjacency orientation must equal what the converter
        produces from a fresh reference cell — guards the transpose traps."""
        import torch
        for cell, ref_cls in [("aagc", "AAGC_net"), ("agc", "AGC_net")]:
            torch.manual_seed(3)
            ref = getattr(ref_nets, ref_cls)(12, 9, 8, torch.from_numpy(nira))
            conv = graph_net_params_from_state_dict(
                _torch_state_dict(ref), cell, prefix="")
            cfg = N.GraphNetConfig(cell=cell, units_in=12, units_out=9,
                                   units_hidden=8)
            fresh = N.init_graph_net(jax.random.PRNGKey(0), cfg, nira)
            np.testing.assert_allclose(
                np.asarray(fresh.rnn1.adj), np.asarray(conv.rnn1.adj),
                atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(fresh.linear_in.adj),
                np.asarray(conv.linear_in.adj), atol=1e-6)


class TestOnlineWindowParity:
    """The ONLINE mode contract, cross-framework: both frameworks process
    the same sequence in fixed windows with carried recurrent state — the
    reference via its forward(imu, rnn_state) online mode (ref:
    net_aagc.py:633-645,802-812: ONE state threads rnn1→rnn2 inside a call
    and rnn2's final state seeds the NEXT window's rnn1), ours via
    graph_net_apply's state carry (the StreamingCascade primitive). Outputs
    must agree window for window — this pins the cross-window state
    semantics that the offline parity oracles cannot see."""

    @pytest.mark.parametrize("cell,ref_cls", [
        ("a3gc", "A3GC_net"), ("aagc", "AAGC_net"),
        ("agc", "AGC_net"), ("ggru", "G_GRU_net")])
    def test_windowed_equals_reference_online(self, cell, ref_cls, nira,
                                              ref_nets):
        import torch
        torch.manual_seed(11)
        ref = getattr(ref_nets, ref_cls)(12, 9, 16, torch.from_numpy(nira))
        params = graph_net_params_from_state_dict(
            _torch_state_dict(ref), cell, prefix="")
        cfg = N.GraphNetConfig(cell=cell, units_in=12, units_out=9,
                               units_hidden=16)
        rng = np.random.default_rng(11)
        x = rng.normal(size=(1, 40, 15, 12)).astype(np.float32) * 0.5

        state, h = None, None
        ref.eval()
        with torch.no_grad():
            for w in range(4):
                xw = x[:, w * 10:(w + 1) * 10]
                ours, state = N.graph_net_apply(params, cfg,
                                                jnp.asarray(xw), state)
                ref_y, h = ref(torch.from_numpy(xw), h)
                np.testing.assert_allclose(
                    np.asarray(ours), ref_y.numpy(), atol=2e-5,
                    err_msg=f"{cell} window {w}")
