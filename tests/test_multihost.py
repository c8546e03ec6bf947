r"""Multi-host (DCN) training: a real 2-process rig vs a single-process mesh.

The reference is single-process/single-GPU (ref: train_a3gc_tp.py:158);
the framework's multi-host path (`cli train --coordinator`,
parallel/multihost.py) joins N controller processes into one jax runtime
and spans the (data, model) mesh across all of them.

This test launches an ACTUAL two-process run on CPU (2 virtual devices per
process, gloo cross-process collectives — the same topology shape as two
TPU hosts over DCN) and an identically-configured single-process 4-device
mesh run, then checks:

  * the coordinator's loss trajectory matches the single-process mesh run,
  * both runs write the same checkpoints, with matching parameters,
  * the multihost checkpoints restore cleanly in an ordinary process.
"""

import glob
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_devices: int) -> dict:
    # fresh PYTHONPATH: drops the container's axon sitecustomize dir so the
    # subprocess honors JAX_PLATFORMS=cpu (CLAUDE.md: subprocess CPU drives)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO_ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


def _train_cmd(npz: str, save_root: str, extra):
    return [sys.executable, "-m", "a3gc_tpu.cli", "train",
            "--model", "a3gc", "-b", "4", "--epochs", "2",
            "--hu1", "8", "--hu2", "8", "--hu3", "8",
            "--start_at", "3", "--seed", "0",
            "--name", "run", "--save_root", save_root,
            "--train_data", npz, "--valid_data", npz] + list(extra)


def _read_log(save_root: str):
    path = os.path.join(save_root, "run", "train_log.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def _restore_tree(path: str):
    # the exact user path: `evaluate` restores with a template — this must
    # work in an ordinary process regardless of the saving topology
    import jax

    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.models import nets as N
    from a3gc_tpu.models.pipeline import PoseNetConfig, init_pose_net
    from a3gc_tpu.utils import restore_params

    cfg = PoseNetConfig(net=N.GraphNetConfig(
        cell="a3gc", units_in=15, units_out=9, units_hidden=8), rotsize=9)
    template = init_pose_net(jax.random.PRNGKey(0), cfg,
                             load_adjacency_template())
    return restore_params(path, template)


class TestMultihostTraining:
    @pytest.fixture(scope="class")
    def runs(self, tmp_path_factory):
        from a3gc_tpu.data.synthetic import synthetic_packed_dataset

        tmp = tmp_path_factory.mktemp("multihost")
        npz = str(tmp / "data.npz")
        np.savez(npz, **synthetic_packed_dataset(n_seqs=8, seq_len=16,
                                                 seed=0))

        # --- two-process run: 2 procs x 2 devices, gloo collectives ---
        mh_root = str(tmp / "mh")
        port = _free_port()
        procs = []
        for pid in range(2):
            cmd = _train_cmd(npz, mh_root, [
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid)])
            procs.append(subprocess.Popen(
                cmd, env=_env(2), cwd=str(tmp),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {pid} failed:\n{out}"

        # --- oracle: single-process 4-device mesh, identical config ---
        sp_root = str(tmp / "sp")
        cmd = _train_cmd(npz, sp_root, ["--mesh"])
        p = subprocess.run(cmd, env=_env(4), cwd=str(tmp),
                           stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True,
                           timeout=900)
        assert p.returncode == 0, f"single-process run failed:\n{p.stdout}"
        return mh_root, sp_root, outs

    def test_coordinator_gates_io(self, runs):
        mh_root, _, outs = runs
        assert "[multihost] process 0/2 joined" in outs[0] + outs[1]
        # exactly the coordinator echoes epoch lines
        epoch_lines = [o for o in outs if '"train_loss"' in o]
        assert len(epoch_lines) == 1

    def test_loss_trajectory_matches_single_process_mesh(self, runs):
        mh_root, sp_root, _ = runs
        mh, sp = _read_log(mh_root), _read_log(sp_root)
        assert [(r["stage"], r["epoch"]) for r in mh] == \
               [(r["stage"], r["epoch"]) for r in sp]
        assert len(mh) == 2                       # stage 3, two epochs
        for a, b in zip(mh, sp):
            # same batches, same SPMD program; only the cross-process
            # reduction order differs from the single-process psum
            np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                       rtol=2e-5)
            np.testing.assert_allclose(a["valid_loss"], b["valid_loss"],
                                       rtol=2e-5)

    def test_checkpoints_match(self, runs):
        mh_root, sp_root, _ = runs
        pat = os.path.join("{}", "run", "checkpoint_model3_pretrain_*")
        mh_cks = sorted(glob.glob(pat.format(mh_root)))
        sp_cks = sorted(glob.glob(pat.format(sp_root)))
        assert mh_cks and [os.path.basename(c) for c in mh_cks] == \
            [os.path.basename(c) for c in sp_cks]
        a = _restore_tree(mh_cks[-1])
        b = _restore_tree(sp_cks[-1])
        la = jax_leaves(a)
        lb = jax_leaves(b)
        assert la.keys() == lb.keys()
        for k in la:
            np.testing.assert_allclose(la[k], lb[k], rtol=1e-5,
                                       atol=1e-6, err_msg=k)


def jax_leaves(tree):
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}


class TestMultihostInterrupt:
    r"""Preemption under multihost: SIGTERM delivered to ONE process (the
    NON-coordinator — the harder direction) must stop BOTH at the same
    epoch boundary (the flag crosses hosts via ``any_flag``'s collective
    OR), write a cooperative interrupt checkpoint, and exit 0 on every
    process. The reference has no preemption story at all
    (ref: train_a3gc_tp.py:241-312)."""

    def test_sigterm_one_process_stops_both(self, tmp_path):
        import signal
        import time

        from a3gc_tpu.data.synthetic import synthetic_packed_dataset

        npz = str(tmp_path / "data.npz")
        np.savez(npz, **synthetic_packed_dataset(n_seqs=8, seq_len=16,
                                                 seed=0))
        mh_root = str(tmp_path / "mh")
        port = _free_port()
        procs = []
        for pid in range(2):
            cmd = _train_cmd(npz, mh_root, [
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid),
                "--patience", "100000"])
            cmd[cmd.index("--epochs") + 1] = "100000"   # effectively endless
            procs.append(subprocess.Popen(
                cmd, env=_env(2), cwd=str(tmp_path),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        log_path = os.path.join(mh_root, "run", "train_log.jsonl")
        deadline = time.time() + 600
        try:
            while time.time() < deadline:     # wait for ≥2 epoch lines
                if os.path.exists(log_path):
                    with open(log_path) as f:
                        if len(f.read().splitlines()) >= 2:
                            break
                for pid, p in enumerate(procs):
                    assert p.poll() is None, \
                        f"process {pid} died early:\n{p.communicate()[0]}"
                time.sleep(0.5)
            else:
                raise AssertionError("no epoch lines before deadline")
            procs[1].send_signal(signal.SIGTERM)        # non-coordinator
            outs = [p.communicate(timeout=300)[0] for p in procs]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {pid} failed:\n{out}"
        events = _read_log(mh_root)
        assert events[-1].get("event") == "interrupted", events[-1]
        # the cooperative interrupt checkpoint restores single-process
        pat = os.path.join(mh_root, "run", "checkpoint_model3_pretrain_*")
        cks = sorted(glob.glob(pat))
        assert cks
        _restore_tree(cks[-1])


class TestMultihostDeviceData:
    r"""The flagship at-scale training config under multihost: the corpus
    row-sharded across every process's device HBM (`--device_data`, each
    host uploads only its shards) with multi-step fused dispatch
    (`--steps_per_dispatch`). Oracle: the identical single-process mesh
    run — per-shard sampling is deterministic, so trajectories match."""

    @pytest.fixture(scope="class")
    def runs(self, tmp_path_factory):
        from a3gc_tpu.data.synthetic import synthetic_packed_dataset

        tmp = tmp_path_factory.mktemp("multihost_dd")
        npz = str(tmp / "data.npz")
        np.savez(npz, **synthetic_packed_dataset(n_seqs=8, seq_len=16,
                                                 seed=0))
        flags = ["--device_data", "--steps_per_dispatch", "2"]

        mh_root = str(tmp / "mh")
        port = _free_port()
        procs = [subprocess.Popen(
            _train_cmd(npz, mh_root, flags + [
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid)]),
            env=_env(2), cwd=str(tmp), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for pid in range(2)]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {pid} failed:\n{out}"

        sp_root = str(tmp / "sp")
        p = subprocess.run(_train_cmd(npz, sp_root, flags + ["--mesh"]),
                           env=_env(4), cwd=str(tmp),
                           stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True,
                           timeout=900)
        assert p.returncode == 0, f"single-process run failed:\n{p.stdout}"
        return mh_root, sp_root

    def test_matches_single_process_mesh(self, runs):
        mh_root, sp_root = runs
        mh, sp = _read_log(mh_root), _read_log(sp_root)
        assert len(mh) == len(sp) == 2
        for a, b in zip(mh, sp):
            np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                       rtol=2e-5)
            np.testing.assert_allclose(a["valid_loss"], b["valid_loss"],
                                       rtol=2e-5)
        pat = os.path.join("{}", "run", "checkpoint_model3_pretrain_*")
        mh_ck = sorted(glob.glob(pat.format(mh_root)))[-1]
        sp_ck = sorted(glob.glob(pat.format(sp_root)))[-1]
        la, lb = jax_leaves(_restore_tree(mh_ck)), \
            jax_leaves(_restore_tree(sp_ck))
        for k in la:
            np.testing.assert_allclose(la[k], lb[k], rtol=1e-5,
                                       atol=1e-6, err_msg=k)
