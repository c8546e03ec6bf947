"""Checkpoint EXPORT (our pytrees -> reference .tar schema): round-trip
identity through the importer, and the torch reference running our
exported weights must match our own forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a3gc_tpu.compat import (
    dip_params_from_state_dict,
    dip_state_dict,
    graph_net_params_from_state_dict,
    graph_net_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
)
from a3gc_tpu.data import load_adjacency_template
from a3gc_tpu.models import nets as N

pytestmark = pytest.mark.usefixtures("reference_path")


@pytest.fixture(scope="module")
def nira():
    return load_adjacency_template()


def _tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("cell", ["a3gc", "aagc", "agc", "ggru"])
def test_graph_roundtrip(cell, nira):
    cfg = N.GraphNetConfig(cell=cell, units_in=15, units_out=9,
                           units_hidden=16)
    params = N.init_graph_net(jax.random.PRNGKey(1), cfg, nira)
    sd = graph_net_state_dict(params, cell)
    back = graph_net_params_from_state_dict(sd, cell)
    _tree_equal(params, back)


def test_dip_roundtrip():
    cfg = N.DIPConfig(n_input=12, n_output=9, n_hidden=16)
    params = N.init_dip(jax.random.PRNGKey(2), cfg)
    sd = dip_state_dict(params)
    back = dip_params_from_state_dict(sd)
    _tree_equal(params, back)


def test_tar_roundtrip(tmp_path, nira):
    """save_torch_checkpoint writes the reference's {'epoch','state_dict'}
    format readable by load_torch_checkpoint."""
    cfg = N.GraphNetConfig(cell="a3gc", units_in=12, units_out=3,
                           units_hidden=8)
    params = N.init_graph_net(jax.random.PRNGKey(3), cfg, nira)
    path = save_torch_checkpoint(
        str(tmp_path / "export.tar"), graph_net_state_dict(params, "a3gc"),
        epoch=7)
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=True)
    assert raw["epoch"] == 7
    back = graph_net_params_from_state_dict(load_torch_checkpoint(path),
                                            "a3gc")
    _tree_equal(params, back)


@pytest.mark.parametrize("cell", ["a3gc", "aagc", "agc", "ggru"])
def test_reference_runs_our_export(cell, nira, reference_path):
    """The torch reference net loaded with OUR exported checkpoint produces
    the same outputs as our net — the interop contract in the export
    direction (mirror of TestTrainedCheckpointParity). STRICT
    load_state_dict on every family's reference class, so a missing or
    extra key in the exporter schema fails here (the G-GRU cell's dead
    fixed-template Parameter ``a``, ref: net_aagc.py:324, was caught by
    exactly this strictness)."""
    import torch
    import net_aagc
    from tests.test_net_parity import _dealias_parameters, _run_ref_net

    cfg = N.GraphNetConfig(cell=cell, units_in=15, units_out=9,
                           units_hidden=24)
    params = N.init_graph_net(jax.random.PRNGKey(5), cfg, nira)
    sd = graph_net_state_dict(params, cell, nira=nira)

    ref_cls = {"a3gc": net_aagc.A3GC_net, "aagc": net_aagc.AAGC_net,
               "agc": net_aagc.AGC_net, "ggru": net_aagc.G_GRU_net}[cell]
    ref = ref_cls(15, 9, 24, torch.from_numpy(nira))
    _dealias_parameters(ref)
    ref.load_state_dict({k[len("pose_net."):]: torch.from_numpy(v)
                         for k, v in sd.items()})

    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 20, 15, 15)).astype(np.float32) * 0.5
    ref_y = _run_ref_net(ref, x)
    ours, _ = N.graph_net_apply(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref_y, atol=2e-5)


def test_cli_export_import_cycle(tmp_path, nira):
    """orbax -> .tar -> orbax through the CLI keeps parameters identical."""
    import orbax.checkpoint as ocp
    from a3gc_tpu.cli import main

    cfg = N.GraphNetConfig(cell="a3gc", units_in=15, units_out=9,
                           units_hidden=8)
    params = N.init_graph_net(jax.random.PRNGKey(7), cfg, nira)
    src = tmp_path / "orbax_src"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(src), params, force=True)
    ckptr.wait_until_finished()

    tar = tmp_path / "export.tar"
    main(["convert-checkpoint", "--model", "a3gc", "--to_torch", str(src),
          "--output", str(tar), "--n_input", "15", "--n_output", "9",
          "--hu1", "8"])
    back_dir = tmp_path / "orbax_back"
    main(["convert-checkpoint", "--model", "a3gc", "--torch", str(tar),
          "--output", str(back_dir)])
    from a3gc_tpu.utils import restore_params
    back = restore_params(str(back_dir), params)
    _tree_equal(params, back)
