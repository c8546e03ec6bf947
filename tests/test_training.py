"""L6 training: jitted steps learn, early stopping, checkpoints, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3gc_tpu.config import TrainConfig
from a3gc_tpu.data import load_adjacency_template
from a3gc_tpu.data import pipeline as DP
from a3gc_tpu.data.synthetic import synthetic_packed_dataset
from a3gc_tpu.models import nets as N
from a3gc_tpu.models.pipeline import PoseNetConfig, init_pose_net
from a3gc_tpu.parallel import make_mesh
from a3gc_tpu.train import StageRunner, run_cascade_training
from a3gc_tpu.utils import discover_latest, restore_params, save_params
from a3gc_tpu.config import MeshConfig


@pytest.fixture(scope="module")
def nira():
    return load_adjacency_template()


@pytest.fixture(scope="module")
def packed():
    return synthetic_packed_dataset(n_seqs=8, seq_len=16, seed=0)


def make_stage(stage, nira, cell="a3gc", hidden=16):
    units_in = {1: 12, 2: 15, 3: 15}[stage]
    units_out = {1: 3, 2: 3, 3: 9}[stage]
    net = N.GraphNetConfig(cell=cell, units_in=units_in, units_out=units_out,
                           units_hidden=hidden, linear_dropout=0.0,
                           dropout=0.0, recurrent_dropout=0.0)
    cfg = PoseNetConfig(net=net, rotsize={1: 3, 2: 3, 3: 9}[stage])
    params = init_pose_net(jax.random.PRNGKey(stage), cfg, nira)
    return cfg, params


class TestStageRunner:
    @pytest.mark.parametrize("stage", [1, 2, 3])
    def test_loss_decreases(self, stage, nira, packed):
        cfg, params = make_stage(stage, nira)
        tc = TrainConfig(batch_size=4, lr=2e-3)
        runner = StageRunner(stage, cfg, params, tc, steps_per_epoch=2)
        sampler = lambda: DP.Sampler(packed, 4, seed=0)
        first = runner.eval_epoch(sampler())
        for e in range(3):
            runner.train_epoch(sampler(), jax.random.PRNGKey(e))
        last = runner.eval_epoch(sampler())
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first

    def test_agc_adjacency_frozen(self, nira, packed):
        cfg, params = make_stage(3, nira, cell="agc")
        tc = TrainConfig(batch_size=4)
        runner = StageRunner(3, cfg, params, tc, steps_per_epoch=2)
        adj_before = np.asarray(params.rnn1.adj)
        kernel_before = np.asarray(params.rnn1.kernel)
        runner.train_epoch(DP.Sampler(packed, 4, seed=0), jax.random.PRNGKey(0))
        adj_after = np.asarray(runner.state.params.rnn1.adj)
        kernel_after = np.asarray(runner.state.params.rnn1.kernel)
        np.testing.assert_allclose(adj_after, adj_before, atol=0)
        assert np.abs(kernel_after - kernel_before).max() > 0

    def test_a3gc_adjacency_trains(self, nira, packed):
        cfg, params = make_stage(3, nira, cell="a3gc")
        tc = TrainConfig(batch_size=4)
        runner = StageRunner(3, cfg, params, tc, steps_per_epoch=2)
        adj_before = np.asarray(params.rnn1.adj)
        runner.train_epoch(DP.Sampler(packed, 4, seed=0), jax.random.PRNGKey(0))
        assert np.abs(np.asarray(runner.state.params.rnn1.adj)
                      - adj_before).max() > 0

    def test_lr_schedule_decays_per_epoch(self, nira, packed):
        from a3gc_tpu.train import make_optimizer
        import optax
        tc = TrainConfig(lr=1.0, lr_decay=0.5)
        sched = optax.exponential_decay(1.0, 2, 0.5, staircase=True)
        assert sched(0) == 1.0 and sched(1) == 1.0
        assert sched(2) == 0.5 and sched(4) == 0.25


class TestCascadeDriver:
    def test_early_stopping_and_checkpoints(self, nira, packed, tmp_path):
        tc = TrainConfig(batch_size=4, max_epochs=4, patience=1)
        runners = {}
        for stage in (1, 2, 3):
            cfg, params = make_stage(stage, nira, hidden=8)
            runners[stage] = StageRunner(stage, cfg, params, tc,
                                         steps_per_epoch=2)
        events = []
        saved = []
        run_cascade_training(
            runners,
            lambda: DP.Sampler(packed, 4, seed=0),
            lambda: DP.Sampler(packed, 4, shuffle=False, seed=0),
            tc,
            save_fn=lambda st, ep, p: saved.append(
                save_params(p, str(tmp_path), st, ep)),
            log_fn=events.append)
        stages_seen = {e["stage"] for e in events}
        assert stages_seen == {1, 2, 3}
        assert saved

        found = discover_latest(str(tmp_path), 1)
        assert found is not None
        path, epoch = found
        cfg, params = make_stage(1, nira, hidden=8)
        restored = restore_params(path, params)
        assert jax.tree_util.tree_structure(restored) == \
            jax.tree_util.tree_structure(params)

    def test_driver_reshuffles_every_epoch(self, nira, packed):
        # the reference's DataLoader(shuffle=True) draws a fresh order per
        # epoch (ref: train_a3gc_tp.py:209-210); the driver salts the
        # sampler factory per (stage, epoch) — deterministically, so a
        # resumed run replays the identical epoch orders
        tc = TrainConfig(batch_size=4, max_epochs=2, patience=5)
        salts = []
        cfg, params = make_stage(1, nira, hidden=8)
        runners = {1: StageRunner(1, cfg, params, tc, steps_per_epoch=2)}

        def sampler_fn(salt):
            salts.append(salt)
            return DP.Sampler(packed, 4, seed=(0, salt))

        run_cascade_training(
            runners, sampler_fn,
            lambda: DP.Sampler(packed, 4, shuffle=False), tc)
        assert salts == [10000, 10001]          # distinct per epoch
        orders = [list(np.random.default_rng((0, s)).permutation(8))
                  for s in salts]
        assert orders[0] != orders[1]           # epochs actually reshuffle

    def test_checkpoint_retention_keep(self, nira, packed, tmp_path):
        """keep_checkpoints=N: only the newest N improvement checkpoints
        this run wrote survive; discovery/restore still find the best
        (VERDICT r4 #6 — the 55-checkpoint deep-decay pileup bound)."""
        tc = TrainConfig(batch_size=4, max_epochs=5, patience=5,
                         keep_checkpoints=2)
        cfg, params = make_stage(1, nira, hidden=8)
        runners = {1: StageRunner(1, cfg, params, tc, steps_per_epoch=1)}
        losses = iter([5.0, 4.0, 3.0, 2.0, 1.0])   # improves every epoch
        run_cascade_training(
            runners, lambda: DP.Sampler(packed, 4, seed=0),
            lambda: DP.Sampler(packed, 4, shuffle=False), tc,
            save_fn=lambda st, ep, p: save_params(p, str(tmp_path), st, ep),
            valid_fn=lambda r: next(losses))
        import glob as _glob
        kept = sorted(_glob.glob(str(tmp_path / "checkpoint_model1_*")))
        assert len(kept) == 2, kept                  # newest two only
        assert kept[0].endswith("_3") and kept[1].endswith("_4")
        path, epoch = discover_latest(str(tmp_path), 1)
        assert epoch == 4
        restore_params(path, params)                 # still restorable

    def test_checkpoint_retention_min_delta(self, nira, packed, tmp_path):
        """min_save_delta: improvements below the delta do not WRITE a
        checkpoint but early-stop bookkeeping is unchanged (all epochs
        still run when every epoch improves)."""
        tc = TrainConfig(batch_size=4, max_epochs=5, patience=0,
                         min_save_delta=0.5)
        cfg, params = make_stage(1, nira, hidden=8)
        runners = {1: StageRunner(1, cfg, params, tc, steps_per_epoch=1)}
        losses = iter([5.0, 4.9, 4.85, 3.0, 2.95])
        events = []
        run_cascade_training(
            runners, lambda: DP.Sampler(packed, 4, seed=0),
            lambda: DP.Sampler(packed, 4, shuffle=False), tc,
            save_fn=lambda st, ep, p: save_params(p, str(tmp_path), st, ep),
            log_fn=events.append, valid_fn=lambda r: next(losses))
        assert len(events) == 5     # every epoch improved -> no early stop
        import glob as _glob
        kept = sorted(_glob.glob(str(tmp_path / "checkpoint_model1_*")))
        # 5.0 saved (first), 4.9/4.85 below the 0.5 delta vs 5.0, 3.0
        # saved, 2.95 below the delta vs 3.0
        assert [p.rsplit("_", 1)[1] for p in kept] == ["0", "3"]

    @pytest.mark.slow
    def test_retention_spares_previous_runs(self, nira, packed, tmp_path):
        """Pruning only touches checkpoints the CURRENT run wrote: a
        resumed/second run with keep=1 must not delete the first run's
        files (this is also what protects interrupt checkpoints)."""
        cfg, params = make_stage(1, nira, hidden=8)
        # "previous run" artifact (stands in for an interrupt checkpoint)
        save_params(params, str(tmp_path), 1, 0)
        tc = TrainConfig(batch_size=4, max_epochs=3, patience=3,
                         keep_checkpoints=1, start_epoch=1)
        runners = {1: StageRunner(1, cfg, params, tc, steps_per_epoch=1)}
        losses = iter([3.0, 2.0])
        run_cascade_training(
            runners, lambda: DP.Sampler(packed, 4, seed=0),
            lambda: DP.Sampler(packed, 4, shuffle=False), tc,
            save_fn=lambda st, ep, p: save_params(p, str(tmp_path), st, ep),
            valid_fn=lambda r: next(losses))
        import glob as _glob
        kept = sorted(_glob.glob(str(tmp_path / "checkpoint_model1_*")))
        # epoch 0 (previous run) untouched; of this run's epochs 1, 2
        # only the newest (2) kept
        assert [p.rsplit("_", 1)[1] for p in kept] == ["0", "2"]

    def test_discover_prefers_pretrain(self, nira, tmp_path):
        cfg, params = make_stage(1, nira, hidden=8)
        save_params(params, str(tmp_path), 1, 3, finetuning=False)
        save_params(params, str(tmp_path), 1, 7, finetuning=True)
        path, epoch = discover_latest(str(tmp_path), 1)
        assert "pretrain" in path and epoch == 3
        path, epoch = discover_latest(str(tmp_path), 1, phase="finetuning")
        assert epoch == 7


class TestDeviceResidentData:
    """--device_data: the corpus lives in device memory and batches are
    gathered by index inside the jitted step — must train/evaluate
    EXACTLY like the host-fed path (same permutations, same rng)."""

    def test_train_epoch_matches_host(self, nira, packed):
        cfg, params = make_stage(2, nira, hidden=8)   # stage 2: exercises
        tc = TrainConfig(batch_size=3, lr=1e-3)       # teacher-forcing rng
        dd = DP.put_device(packed)
        r_host = StageRunner(2, cfg, params, tc, steps_per_epoch=3)
        r_dev = StageRunner(2, cfg, params, tc, steps_per_epoch=3)

        def sampler(dev):
            return DP.Sampler(packed, 3, seed=(0, 1), pad_remainder=True,
                              device_data=dd if dev else None)

        l_h = r_host.train_epoch(sampler(False), jax.random.PRNGKey(0))
        l_d = r_dev.train_epoch(sampler(True), jax.random.PRNGKey(0))
        assert abs(l_h - l_d) < 1e-5           # incl. the padded tail batch
        for a, b in zip(jax.tree_util.tree_leaves(r_host.state.params),
                        jax.tree_util.tree_leaves(r_dev.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_eval_epoch_chunked_matches_host(self, nira, packed):
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=3, eval_batch_size=2)  # forces chunking
        dd = DP.put_device(packed)
        r = StageRunner(1, cfg, params, tc, steps_per_epoch=3)
        e_h = r.eval_epoch(DP.Sampler(packed, 3, shuffle=False,
                                      pad_remainder=True))
        e_d = r.eval_epoch(DP.Sampler(packed, 3, shuffle=False,
                                      pad_remainder=True, device_data=dd))
        assert abs(e_h - e_d) < 1e-6

    def test_accum_composes_with_device_data(self, nira, packed):
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=4, lr=1e-3, accum_steps=2)
        dd = DP.put_device(packed)
        r_host = StageRunner(1, cfg, params, tc, steps_per_epoch=2)
        r_dev = StageRunner(1, cfg, params, tc, steps_per_epoch=2)
        l_h = r_host.train_epoch(DP.Sampler(packed, 4, seed=7),
                                 jax.random.PRNGKey(1))
        l_d = r_dev.train_epoch(DP.Sampler(packed, 4, seed=7,
                                           device_data=dd),
                                jax.random.PRNGKey(1))
        assert abs(l_h - l_d) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(r_host.state.params),
                        jax.tree_util.tree_leaves(r_dev.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    @pytest.mark.parametrize("accum,pad", [
        (1, True),
        pytest.param(2, False, marks=pytest.mark.slow),
    ])
    def test_steps_per_dispatch_matches_sequential(self, nira, packed,
                                                   accum, pad):
        """steps_per_dispatch folds M optimizer steps into one lax.scan
        dispatch — parameter trajectory and epoch loss must match the
        sequential device-resident path (incl. the epoch tail falling
        back to the per-step program, the in-jit rng fold_in offsets,
        weighted (padded-tail) and unweighted batch structures, and
        composition with gradient accumulation)."""
        cfg, params = make_stage(2, nira, hidden=8)   # stage 2: noise rng
        dd = DP.put_device(packed)
        out = {}
        for m in (1, 2):
            tc = TrainConfig(batch_size=4 if accum == 2 else 3, lr=1e-3,
                             accum_steps=accum, steps_per_dispatch=m)
            r = StageRunner(2, cfg, params, tc, steps_per_epoch=3)
            loss = 0.0
            for epoch in range(2):    # state must carry across dispatches
                loss = r.train_epoch(
                    DP.Sampler(packed, tc.batch_size, seed=(0, epoch),
                               pad_remainder=pad, device_data=dd),
                    jax.random.PRNGKey(epoch))
            out[m] = (r.state.params, loss)
        assert abs(out[1][1] - out[2][1]) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(out[1][0]),
                        jax.tree_util.tree_leaves(out[2][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_steps_per_dispatch_ragged_tail_falls_back(self, nira, packed):
        """A ragged final take (pad_remainder=False, drop_remainder=False)
        landing INSIDE a full m-group must not crash the grouped dispatch
        (np.stack of inhomogeneous takes) — the group loop breaks to the
        per-step tail, trajectory identical to the sequential path."""
        cfg, params = make_stage(1, nira, hidden=8)
        dd = DP.put_device(packed)
        out = {}
        for m in (1, 2):
            tc = TrainConfig(batch_size=6, lr=1e-3, steps_per_dispatch=m)
            r = StageRunner(1, cfg, params, tc, steps_per_epoch=2)
            # 8 sequences at batch 6 -> takes of shapes (6,) and (2,):
            # the ragged pair IS the first (and only) m=2 group
            loss = r.train_epoch(
                DP.Sampler(packed, 6, seed=(0, 0), pad_remainder=False,
                           device_data=dd),
                jax.random.PRNGKey(0))
            out[m] = (r.state.params, loss)
        assert abs(out[1][1] - out[2][1]) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(out[1][0]),
                        jax.tree_util.tree_leaves(out[2][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_mesh_device_data_guards(self, nira, packed):
        """A mesh runner demands a put_device_sharded corpus (an
        unsharded upload would silently reshard every step), and --accum
        on the sharded corpus needs per-shard rows divisible by k."""
        cfg, params = make_stage(1, nira, hidden=8)
        mesh = make_mesh(MeshConfig(data=8, model=1))
        r = StageRunner(1, cfg, params, TrainConfig(batch_size=8),
                        steps_per_epoch=1, mesh=mesh)
        dd_flat = DP.put_device(packed)
        with pytest.raises(AssertionError, match="put_device_sharded"):
            r.train_epoch(DP.Sampler(packed, 8, pad_remainder=True,
                                     device_data=dd_flat),
                          jax.random.PRNGKey(0))
        # batch 8 over 8 shards = 1 row/shard: accum 2 cannot split it
        r2 = StageRunner(1, cfg, params,
                         TrainConfig(batch_size=8, accum_steps=2),
                         steps_per_epoch=1, mesh=mesh)
        dd = DP.put_device_sharded(packed, mesh)
        with pytest.raises(AssertionError, match="accum"):
            r2.train_epoch(DP.Sampler(packed, 8, pad_remainder=True,
                                      device_data=dd),
                           jax.random.PRNGKey(0))

    @pytest.mark.slow
    def test_sharded_accum_equals_monolithic(self, nira, packed):
        """--accum composes with --device_data --mesh (VERDICT r3 #5):
        the microbatched sharded-gather step must produce the same
        parameter trajectory as the monolithic sharded step (exact
        weighted-mean gradient; fp32 summation-order noise only), incl.
        a padded tail batch whose pad rows land in microbatches."""
        mesh = make_mesh(MeshConfig(data=4, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        dd = DP.put_device_sharded(packed, mesh)
        out = {}
        for k in (1, 2):
            tc = TrainConfig(batch_size=8, lr=1e-3, accum_steps=k)
            r = StageRunner(1, cfg, params, tc, steps_per_epoch=2,
                            mesh=mesh)
            loss = r.train_epoch(
                DP.Sampler(packed, 8, seed=(5, 5), pad_remainder=True,
                           device_data=dd),
                jax.random.PRNGKey(3))
            out[k] = (r.state.params, loss)
        assert abs(out[1][1] - out[2][1]) < 1e-5, (out[1][1], out[2][1])
        for a, b in zip(jax.tree_util.tree_leaves(out[1][0]),
                        jax.tree_util.tree_leaves(out[2][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_sharded_accum_multi_dispatch(self, nira, packed):
        """--accum x --device_data --mesh x --steps_per_dispatch: the
        triple composition holds (the multi-step scan body runs the
        microbatched core)."""
        mesh = make_mesh(MeshConfig(data=4, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        dd = DP.put_device_sharded(packed, mesh)
        out = {}
        for m in (1, 2):
            tc = TrainConfig(batch_size=8, lr=1e-3, accum_steps=2,
                             steps_per_dispatch=m)
            r = StageRunner(1, cfg, params, tc, steps_per_epoch=2,
                            mesh=mesh)
            loss = r.train_epoch(
                DP.Sampler(packed, 8, seed=(6, 6), pad_remainder=True,
                           device_data=dd),
                jax.random.PRNGKey(4))
            out[m] = (r.state.params, loss)
        assert abs(out[1][1] - out[2][1]) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(out[1][0]),
                        jax.tree_util.tree_leaves(out[2][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_sharded_device_corpus_on_mesh(self, nira, packed):
        """put_device_sharded + iter_indices_sharded on an 8-device mesh:
        the sharded-gather step must equal a host-fed mesh step given the
        SAME batch composition (shard-major assembly oracle), and every
        real sample appears exactly once per epoch with weight 1."""
        mesh = make_mesh(MeshConfig(data=8, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=8, lr=1e-3)
        dd = DP.put_device_sharded(packed, mesh)
        r_dev = StageRunner(1, cfg, params, tc, steps_per_epoch=1,
                            mesh=mesh)
        r_host = StageRunner(1, cfg, params, tc, steps_per_epoch=1,
                             mesh=mesh)

        # device-resident sharded epoch
        s_dev = DP.Sampler(packed, 8, seed=(3, 3), pad_remainder=True,
                           device_data=dd)
        l_dev = r_dev.train_epoch(s_dev, jax.random.PRNGKey(2))

        # oracle: materialize the SAME shard-major batches on host and
        # feed them through the plain mesh step
        s_idx = DP.Sampler(packed, 8, seed=(3, 3), pad_remainder=True)
        n, d = 8, 8
        cap = -(-n // d)
        losses = []
        for i, (idx, w) in enumerate(s_idx.iter_indices_sharded(d)):
            # local -> global rows (local indices never touch pad rows)
            glob = (idx + cap * np.arange(d)[:, None]).reshape(-1)
            raw = {k: v[glob] for k, v in packed.items()}
            raw["_weight"] = w.reshape(-1)
            r_host.state, loss = r_host.train_step(
                r_host.state, r_host._put(raw),
                jax.random.fold_in(jax.random.PRNGKey(2), i))
            losses.append(loss)
        l_host = float(jnp.mean(jnp.stack(losses)))
        assert abs(l_dev - l_host) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(r_dev.state.params),
                        jax.tree_util.tree_leaves(r_host.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

        # sharded eval == sharded-oracle eval loss is covered by the same
        # gather; here check epoch accounting: every real row exactly
        # once at weight 1 across the epoch (uneven shards: 10 rows / 4)
        ten = {k: np.concatenate([v, v[:2]]) for k, v in packed.items()}
        s = DP.Sampler(ten, 8, seed=1, pad_remainder=True)
        seen = []
        for idx, w in s.iter_indices_sharded(4):
            cap = -(-10 // 4)     # 3 rows per shard, last shard has 1
            glob = (idx + cap * np.arange(4)[:, None]).reshape(-1)
            seen += [g for g, wi in zip(glob, w.reshape(-1)) if wi == 1.0]
        assert sorted(seen) == list(range(10))

    @pytest.mark.slow
    def test_steps_per_dispatch_on_mesh_matches_sequential(self, nira,
                                                           packed):
        """steps_per_dispatch composes with the sharded device-resident
        mesh path: the scanned shard_map gathers must reproduce the
        sequential sharded epoch's trajectory (8 seqs, B=4 over a
        4-shard data axis → 2 sharded steps/epoch = exactly one m=2
        scan group; 2 epochs check state carry across dispatches —
        the epoch-tail fallback is covered by the single-device
        test)."""
        mesh = make_mesh(MeshConfig(data=4, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        dd = DP.put_device_sharded(packed, mesh)
        out = {}
        for m in (1, 2):
            tc = TrainConfig(batch_size=4, lr=1e-3, steps_per_dispatch=m)
            r = StageRunner(1, cfg, params, tc, steps_per_epoch=2,
                            mesh=mesh)
            loss = 0.0
            for epoch in range(2):
                loss = r.train_epoch(
                    DP.Sampler(packed, 4, seed=(0, epoch),
                               pad_remainder=True, device_data=dd),
                    jax.random.PRNGKey(epoch))
            out[m] = (r.state.params, loss)
        assert abs(out[1][1] - out[2][1]) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(out[1][0]),
                        jax.tree_util.tree_leaves(out[2][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_sharded_eval_matches_unsharded(self, nira, packed):
        mesh = make_mesh(MeshConfig(data=8, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=8, eval_batch_size=8)
        dd = DP.put_device_sharded(packed, mesh)
        r_mesh = StageRunner(1, cfg, params, tc, steps_per_epoch=1,
                             mesh=mesh)
        r_single = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
        e_dev = r_mesh.eval_epoch(DP.Sampler(packed, 8, shuffle=False,
                                             pad_remainder=True,
                                             device_data=dd))
        # shuffle=False: shard-major order is a permutation of the rows;
        # the weighted mean is permutation-invariant
        e_ref = r_single.eval_epoch(DP.Sampler(packed, 8, shuffle=False,
                                               pad_remainder=True))
        assert abs(e_dev - e_ref) < 1e-5

    def test_iter_indices_is_the_iteration_order(self, packed):
        # __iter__ is built on iter_indices; same seed -> identical batches
        a = DP.Sampler(packed, 3, seed=(5, 5), pad_remainder=True)
        b = DP.Sampler(packed, 3, seed=(5, 5), pad_remainder=True)
        mats = list(a)
        idxs = list(b.iter_indices())
        assert len(mats) == len(idxs) == 3     # 8 seqs, B=3, padded tail
        for raw, (take, w) in zip(mats, idxs):
            for k, v in raw.items():
                if k == "_weight":
                    np.testing.assert_array_equal(v, w)
                else:
                    np.testing.assert_array_equal(v, packed[k][take])


class TestShardedTraining:
    def test_train_step_on_8_device_mesh(self, nira, packed):
        assert jax.device_count() >= 8, "conftest must provide 8 cpu devices"
        mesh = make_mesh(MeshConfig(data=8, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=8)
        runner = StageRunner(1, cfg, params, tc, steps_per_epoch=1, mesh=mesh)
        loss = runner.train_epoch(DP.Sampler(packed, 8, seed=0),
                                  jax.random.PRNGKey(0))
        assert np.isfinite(loss)
        # params must remain replicated (usable on any device)
        leaf = jax.tree_util.tree_leaves(runner.state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_sharded_equals_single_device(self, nira, packed):
        mesh = make_mesh(MeshConfig(data=8, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=8, lr=1e-3)
        r_mesh = StageRunner(1, cfg, params, tc, steps_per_epoch=1, mesh=mesh)
        r_single = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
        l1 = r_mesh.train_epoch(DP.Sampler(packed, 8, seed=0),
                                jax.random.PRNGKey(0))
        l2 = r_single.train_epoch(DP.Sampler(packed, 8, seed=0),
                                  jax.random.PRNGKey(0))
        assert abs(l1 - l2) < 1e-4
        p1 = np.asarray(r_mesh.state.params.linear_in.kernel)
        p2 = np.asarray(r_single.state.params.linear_in.kernel)
        np.testing.assert_allclose(p1, p2, atol=1e-5)

    def test_mesh_eval_chunk_rounds_to_data_axis(self, nira, packed):
        """--eval_batch not divisible by the mesh data axis must not crash
        the validation pass: the chunk size rounds to a multiple of the
        axis, and the chunked loss still equals the unsharded one."""
        mesh = make_mesh(MeshConfig(data=8, model=1))
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=8, eval_batch_size=5)   # 5 % 8 != 0
        r_mesh = StageRunner(1, cfg, params, tc, steps_per_epoch=1,
                             mesh=mesh)
        assert r_mesh._eval_b == 8          # rounded up to one per shard
        l_mesh = r_mesh.eval_epoch(DP.Sampler(packed, 8, shuffle=False))
        r_single = StageRunner(1, cfg, params,
                               TrainConfig(batch_size=8, eval_batch_size=5),
                               steps_per_epoch=1)
        l_single = r_single.eval_epoch(DP.Sampler(packed, 8, shuffle=False))
        assert np.isfinite(l_mesh)
        assert abs(l_mesh - l_single) < 1e-5

        # batch_size itself must divide over the data axis — caught at
        # construction, not at the first sharded step
        with pytest.raises(AssertionError, match="mesh data axis"):
            StageRunner(1, cfg, params, TrainConfig(batch_size=6),
                        steps_per_epoch=1, mesh=mesh)

    def test_tp_sharded_equals_single_device(self, nira, packed):
        """DP×TP (4×2) mesh: the gate kernels are split over 'model'
        (param_sharding) and the result must equal single-device training."""
        from a3gc_tpu.parallel import param_sharding
        mesh = make_mesh(MeshConfig(data=4, model=2))
        cfg, params = make_stage(1, nira, hidden=8)   # 4H = 32 splits by 2
        tc = TrainConfig(batch_size=8, lr=1e-3)
        r_mesh = StageRunner(1, cfg, params, tc, steps_per_epoch=1, mesh=mesh)
        # the recurrent gate kernel [2, in+H, 4H] is genuinely TP-sharded
        spec = param_sharding(mesh, r_mesh.state.params.rnn1.kernel)
        assert "model" in str(spec.spec)
        assert not r_mesh.state.params.rnn1.kernel.sharding.is_fully_replicated
        r_single = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
        l1 = r_mesh.train_epoch(DP.Sampler(packed, 8, seed=0),
                                jax.random.PRNGKey(0))
        l2 = r_single.train_epoch(DP.Sampler(packed, 8, seed=0),
                                  jax.random.PRNGKey(0))
        assert abs(l1 - l2) < 1e-4
        for a, b in zip(jax.tree_util.tree_leaves(r_mesh.state.params),
                        jax.tree_util.tree_leaves(r_single.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestGradientAccumulation:
    def test_accumulated_equals_monolithic(self, nira, packed):
        """accum_steps=k: one step on batch B matches the monolithic step
        on the same batch — mean-of-microbatch gradients feed the same
        Adam update (stage 1 with dropout 0, so the per-microbatch rng
        split is inert and the comparison is deterministic)."""
        cfg, params = make_stage(1, nira, hidden=8)
        r_mono = StageRunner(1, cfg, params, TrainConfig(batch_size=8),
                             steps_per_epoch=1)
        r_acc = StageRunner(1, cfg, params,
                            TrainConfig(batch_size=8, accum_steps=4),
                            steps_per_epoch=1)
        l1 = r_mono.train_epoch(DP.Sampler(packed, 8, seed=0),
                                jax.random.PRNGKey(0))
        l2 = r_acc.train_epoch(DP.Sampler(packed, 8, seed=0),
                               jax.random.PRNGKey(0))
        assert abs(l1 - l2) < 1e-6, (l1, l2)
        for a, b in zip(jax.tree_util.tree_leaves(r_mono.state.params),
                        jax.tree_util.tree_leaves(r_acc.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)

    def test_accum_trains_with_dropout(self, nira, packed):
        """With dropout + teacher-forcing noise active (stage 3), the
        accumulated step still trains (loss decreases)."""
        cfg, params = make_stage(3, nira)
        cfg = cfg.replace(net=cfg.net.replace(dropout=0.3,
                                              linear_dropout=0.2,
                                              recurrent_dropout=0.3))
        tc = TrainConfig(batch_size=4, lr=2e-3, accum_steps=2)
        runner = StageRunner(3, cfg, params, tc, steps_per_epoch=2)
        first = runner.eval_epoch(DP.Sampler(packed, 4, seed=0))
        for e in range(3):
            runner.train_epoch(DP.Sampler(packed, 4, seed=0),
                               jax.random.PRNGKey(e))
        last = runner.eval_epoch(DP.Sampler(packed, 4, seed=0))
        assert np.isfinite(last) and last < first

    def test_accum_must_divide_batch(self, nira):
        cfg, params = make_stage(1, nira, hidden=8)
        with pytest.raises(AssertionError, match="divide"):
            StageRunner(1, cfg, params,
                        TrainConfig(batch_size=6, accum_steps=4),
                        steps_per_epoch=1)


class TestEvalChunking:
    def test_chunked_eval_equals_monolithic(self, nira, packed):
        """eval_batch_size=3 over batch 8 (ragged chunks 3/3/2): the
        size-weighted chunked validation loss equals the monolithic one."""
        cfg, params = make_stage(1, nira, hidden=8)
        r_mono = StageRunner(1, cfg, params,
                             TrainConfig(batch_size=8, eval_batch_size=8),
                             steps_per_epoch=1)
        r_chunk = StageRunner(1, cfg, params,
                              TrainConfig(batch_size=8, eval_batch_size=3),
                              steps_per_epoch=1)
        l_mono = r_mono.eval_epoch(DP.Sampler(packed, 8, seed=0))
        l_chunk = r_chunk.eval_epoch(DP.Sampler(packed, 8, seed=0))
        assert abs(l_mono - l_chunk) < 1e-6, (l_mono, l_chunk)

    def test_eval_batch_auto_caps_at_128(self, nira):
        cfg, params = make_stage(1, nira, hidden=8)
        big = StageRunner(1, cfg, params, TrainConfig(batch_size=256),
                          steps_per_epoch=1)
        small = StageRunner(1, cfg, params, TrainConfig(batch_size=16),
                            steps_per_epoch=1)
        assert big._eval_b == 128 and small._eval_b == 16

    def test_bf16_eval_matches_train_dtype(self, nira, packed):
        """Validation runs at the training compute dtype: the bf16 eval
        loss differs from the fp32 one (proving the cast is applied) and
        both are finite."""
        cfg, params = make_stage(1, nira, hidden=8)
        r32 = StageRunner(1, cfg, params, TrainConfig(batch_size=4),
                          steps_per_epoch=1)
        r16 = StageRunner(1, cfg, params,
                          TrainConfig(batch_size=4, dtype="bfloat16"),
                          steps_per_epoch=1)
        l32 = r32.eval_epoch(DP.Sampler(packed, 4, seed=0))
        l16 = r16.eval_epoch(DP.Sampler(packed, 4, seed=0))
        assert np.isfinite(l32) and np.isfinite(l16)
        assert l32 != l16


class TestMixedPrecision:
    def test_bf16_training_step(self, nira, packed):
        import jax.numpy as jnp
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=4, dtype="bfloat16")
        runner = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
        loss = runner.train_epoch(DP.Sampler(packed, 4, seed=0),
                                  jax.random.PRNGKey(0))
        assert np.isfinite(loss)
        # master params stay fp32
        assert runner.state.params.linear_in.kernel.dtype == jnp.float32

    def test_dip_runner_bf16(self, packed):
        import jax.numpy as jnp
        from a3gc_tpu.models import nets as N2
        from a3gc_tpu.models.pipeline import init_pose_net
        from a3gc_tpu.train.loop import DIPRunner
        cfg = PoseNetConfig(net=N2.DIPConfig(n_input=60, n_output=135,
                                             n_hidden=8), rotsize=9)
        params = init_pose_net(jax.random.PRNGKey(0), cfg)
        nch = {"ori": 54, "acc": 18}
        stats = {f"{k}_{s}_channel": (np.zeros(n, np.float32) if s == "mean"
                                      else np.ones(n, np.float32))
                 for k, n in nch.items() for s in ("mean", "std")}
        rng = np.random.default_rng(0)
        raw = {"ori": rng.normal(size=(2, 8, 54)).astype(np.float32),
               "acc": rng.normal(size=(2, 8, 18)).astype(np.float32),
               "pose": rng.normal(size=(2, 8, 135)).astype(np.float32)}
        tc = TrainConfig(batch_size=2, dtype="bfloat16")
        runner = DIPRunner(cfg, params, tc, steps_per_epoch=1, stats=stats)
        state, loss = runner.train_step(runner.state, raw,
                                        jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        assert state.params.linear1.kernel.dtype == jnp.float32

    def test_cli_dtype_flag(self):
        from a3gc_tpu.cli import build_parser
        args = build_parser().parse_args(
            ["train", "--model", "a3gc", "-b", "2", "--dtype", "bfloat16",
             "--train_data", "t.npz", "--valid_data", "v.npz"])
        assert args.dtype == "bfloat16"


class TestR6DTargets:
    def test_stage3_r6d_trains(self, nira, packed):
        from a3gc_tpu.models import nets as N2
        net = N2.GraphNetConfig(cell="a3gc", units_in=15, units_out=6,
                                units_hidden=8, linear_dropout=0.0,
                                dropout=0.0, recurrent_dropout=0.0)
        cfg = PoseNetConfig(net=net, rotsize=6)
        params = init_pose_net(jax.random.PRNGKey(0), cfg, nira)
        tc = TrainConfig(batch_size=4)
        runner = StageRunner(3, cfg, params, tc, steps_per_epoch=1)
        loss = runner.train_epoch(DP.Sampler(packed, 4, seed=0),
                                  jax.random.PRNGKey(0))
        assert np.isfinite(loss)

    def test_r6d_cascade_eval(self, nira):
        """rotsize=6 cascade produces valid rotations via Gram-Schmidt+IK."""
        from a3gc_tpu.models import nets as N2
        from a3gc_tpu.models.pipeline import CascadeConfig, cascade_apply
        from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle
        import tempfile, os
        smpl = load_parametric_model(write_synthetic_smpl_pickle(
            os.path.join(tempfile.mkdtemp(), "s.pkl"), n_vertices=96))

        def g(ui, uo, h, rot):
            return PoseNetConfig(net=N2.GraphNetConfig(
                cell="a3gc", units_in=ui, units_out=uo, units_hidden=h),
                rotsize=rot)
        cfg = CascadeConfig(stage1=g(12, 3, 8, 3), stage2=g(15, 3, 8, 3),
                            stage3=g(15, 6, 8, 6))
        params3 = tuple(init_pose_net(jax.random.PRNGKey(i), c, nira)
                        for i, c in enumerate(
                            (cfg.stage1, cfg.stage2, cfg.stage3)))
        rng_np = np.random.default_rng(0)
        imu = jnp.asarray(rng_np.normal(size=(1, 12, 15, 12)).astype(np.float32))
        pose = np.asarray(cascade_apply(params3, cfg, smpl, imu))
        assert pose.shape == (12, 24, 3, 3)
        # outputs are orthonormal rotations (Gram-Schmidt guarantees it for
        # non-degenerate 6D vectors; zero inputs would be NaN-scrubbed to 0
        # exactly like the reference, ref: angular.py:181)
        eye = np.einsum("fjxy,fjzy->fjxz", pose, pose)
        np.testing.assert_allclose(
            eye, np.tile(np.eye(3), (12, 24, 1, 1)), atol=1e-5)


class TestStateDonation:
    def test_train_step_donates_state(self, nira, packed):
        """The old TrainState's buffers are deleted after a step (params +
        Adam moments update in place), and the runner's ctor copy keeps
        the CALLER's param arrays alive."""
        cfg, params = make_stage(1, nira, hidden=8)
        runner = StageRunner(1, cfg, params, TrainConfig(batch_size=4),
                             steps_per_epoch=1)
        old = runner.state
        raw = {k: v[:4] for k, v in packed.items()}
        runner.state, _ = runner.train_step(old, raw, jax.random.PRNGKey(0))
        leaf = jax.tree_util.tree_leaves(old.params)[0]
        with pytest.raises(Exception):     # donated -> deleted
            np.asarray(leaf)
        # the ctor params the test passed in are NOT the donated buffers
        np.asarray(jax.tree_util.tree_leaves(params)[0])

    def test_debug_nans_disables_donation(self, nira, packed):
        """jax_debug_nans' eager NaN-locating re-run reads the original
        inputs, so donation must be off under the flag."""
        jax.config.update("jax_debug_nans", True)
        try:
            cfg, params = make_stage(1, nira, hidden=8)
            runner = StageRunner(1, cfg, params, TrainConfig(batch_size=4),
                                 steps_per_epoch=1)
            old = runner.state
            raw = {k: v[:4] for k, v in packed.items()}
            runner.state, _ = runner.train_step(old, raw,
                                                jax.random.PRNGKey(0))
            # old state must still be readable: not donated
            np.asarray(jax.tree_util.tree_leaves(old.params)[0])
        finally:
            jax.config.update("jax_debug_nans", False)


class TestFullSequenceValidation:
    def test_padded_full_sequence_loss_matches_exact(self, nira, packed):
        """--fse equivalent: masked full-sequence loss == unpadded loss."""
        cfg, params = make_stage(1, nira, hidden=8)
        tc = TrainConfig(batch_size=1)
        runner = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
        seq = {k: v[0] for k, v in packed.items()}   # one [T,...] sequence
        loss_full = runner.eval_full_sequences([seq])
        batch1 = {k: v[:1] for k, v in packed.items()}
        loss_exact = float(runner.eval_step(runner.state.params, batch1))
        assert abs(loss_full - loss_exact) < 1e-5

    def test_batched_fse_matches_per_sequence(self, nira, packed):
        """The batched/bucketed --fse pass (VERDICT r3 #5) == the
        per-sequence path: ragged lengths spanning two bucket sizes,
        group padding, and a mesh runner all preserve the per-sequence-
        equal mean."""
        cfg, params = make_stage(1, nira, hidden=8)
        # ragged sequences: different truncations of the packed rows
        # (two land in one bucket, one in a larger one)
        seqs = []
        for i, T in enumerate((40, 55, 90)):
            seqs.append({k: np.asarray(v[i % len(v)])[:T]
                         for k, v in packed.items()})
        r1 = StageRunner(1, cfg, params, TrainConfig(batch_size=2),
                         steps_per_epoch=1)
        want = r1.eval_full_sequences(seqs, batch=1)   # per-sequence
        got = r1.eval_full_sequences(seqs)             # batched
        assert abs(want - got) < 1e-6, (want, got)

        mesh = make_mesh(MeshConfig(data=4, model=1))
        rm = StageRunner(1, cfg, params, TrainConfig(batch_size=4),
                         steps_per_epoch=1, mesh=mesh)
        got_mesh = rm.eval_full_sequences(seqs)        # sharded batched
        assert abs(want - got_mesh) < 1e-6, (want, got_mesh)


class TestRemat:
    def test_remat_matches_no_remat(self, nira, packed):
        """Rematerialized training step computes identical gradients."""
        from a3gc_tpu.models import nets as N2
        import dataclasses as dc
        net = N2.GraphNetConfig(cell="a3gc", units_in=12, units_out=3,
                                units_hidden=8, linear_dropout=0.0,
                                dropout=0.0, recurrent_dropout=0.0)
        tc = TrainConfig(batch_size=4)
        losses, kernels = [], []
        for remat in (False, True):
            cfg = PoseNetConfig(net=dc.replace(net, remat=remat), rotsize=3)
            params = init_pose_net(jax.random.PRNGKey(0), cfg, nira)
            runner = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
            loss = runner.train_epoch(DP.Sampler(packed, 4, seed=0),
                                      jax.random.PRNGKey(0))
            losses.append(loss)
            kernels.append(np.asarray(runner.state.params.linear_in.kernel))
        assert abs(losses[0] - losses[1]) < 1e-6
        np.testing.assert_allclose(kernels[0], kernels[1], atol=1e-6)


class TestTorchTrainingDynamics:
    """Step-for-step optimizer-dynamics parity with the torch reference
    (ref: train_a3gc_tp.py:74-84,234-239,287-290): identical converted
    weights, identical batches, dropout off → the per-step loss trajectory
    and the post-run weights must agree. Fails if Adam eps/bias-correction,
    L2 weight-decay placement (torch folds it into the gradient), or the
    per-epoch ExponentialLR(γ) schedule drift — including the stage-3
    ``--start_epoch`` scheduler fast-forward."""

    EPOCHS = 3
    STEPS = 3  # per epoch
    LR, WD, GAMMA = 1e-3, 1e-4, 0.8

    @staticmethod
    def _dealias(module):
        """Clone aliased .t()-view adjacency Parameters (see
        test_net_parity._dealias_parameters) so torch's in-place Adam
        updates don't corrupt shared storage."""
        for m in module.modules():
            for _, p in m.named_parameters(recurse=False):
                p.data = p.data.clone()

    def _batches(self, units_in, units_out, n):
        rng = np.random.default_rng(42)
        out = []
        for _ in range(n):
            x = rng.normal(size=(4, 10, 15, units_in)).astype(np.float32) * .5
            t = rng.normal(size=(4, 10, 15 * units_out)).astype(np.float32)
            out.append((x, t))
        return out

    def _run_torch(self, ref_net, batches, start_epoch):
        import torch
        import net_aagc
        criterion = net_aagc.pose_loss()
        opt = torch.optim.Adam(ref_net.parameters(), self.LR,
                               weight_decay=self.WD)
        sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=self.GAMMA)
        for _ in range(start_epoch):  # ref: train_a3gc_tp.py:287-290
            sched.step()
        ref_net.eval()  # dropout off; autograd still flows
        losses, i = [], 0
        for _ in range(self.EPOCHS):
            for _ in range(self.STEPS):
                x, target = batches[i]
                i += 1
                pred, _ = ref_net(torch.from_numpy(x))
                loss = criterion.forward(pred.reshape(target.shape),
                                         torch.from_numpy(target))
                opt.zero_grad()
                loss.backward()
                opt.step()
                losses.append(float(loss))
            sched.step()  # per-epoch, ref: train_a3gc_tp.py:248
        return losses

    def _run_ours(self, params, cfg, batches, start_epoch):
        import optax
        from a3gc_tpu.models.pipeline import pose_loss, pose_net_forward
        from a3gc_tpu.train import make_optimizer
        tc = TrainConfig(lr=self.LR, weight_decay=self.WD,
                         lr_decay=self.GAMMA, start_epoch=start_epoch)
        opt = make_optimizer(tc, self.STEPS, params, cfg)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, x, target):
            def loss_fn(p):
                pred, _ = pose_net_forward(p, cfg, x)
                return pose_loss(pred.reshape(target.shape), target)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for x, t in batches[:self.EPOCHS * self.STEPS]:
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(x), jnp.asarray(t))
            losses.append(float(loss))
        return losses, params

    @pytest.mark.parametrize("stage,start_epoch", [(1, 0), (3, 0), (3, 2)])
    def test_a3gc_step_dynamics_match_torch(self, stage, start_epoch, nira,
                                            reference_path):
        import torch
        import net_aagc
        from a3gc_tpu.compat import graph_net_params_from_state_dict
        units_in = {1: 12, 3: 15}[stage]
        units_out = {1: 3, 3: 9}[stage]
        torch.manual_seed(7 + stage)
        ref = net_aagc.A3GC_net(units_in, units_out, 16,
                                torch.from_numpy(nira))
        self._dealias(ref)
        sd0 = {k: v.detach().cpu().numpy().copy()
               for k, v in ref.state_dict().items()}
        params = graph_net_params_from_state_dict(sd0, "a3gc", prefix="")
        cfg = PoseNetConfig(
            net=N.GraphNetConfig(cell="a3gc", units_in=units_in,
                                 units_out=units_out, units_hidden=16),
            rotsize={1: 3, 3: 9}[stage])

        batches = self._batches(units_in, units_out,
                                self.EPOCHS * self.STEPS)
        ref_losses = self._run_torch(ref, batches, start_epoch)
        our_losses, our_params = self._run_ours(params, cfg, batches,
                                                start_epoch)

        np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-5)
        sd_after = {k: v.detach().cpu().numpy()
                    for k, v in ref.state_dict().items()}
        ref_after = graph_net_params_from_state_dict(sd_after, "a3gc",
                                                     prefix="")
        for ours, theirs in zip(jax.tree_util.tree_leaves(our_params),
                                jax.tree_util.tree_leaves(ref_after)):
            np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                                       atol=2e-5)


class TestSchedulerFastForward:
    def test_start_epoch_fast_forwards_lr(self, nira, packed):
        """--start_epoch resumes the per-epoch ExponentialLR where it left
        off (ref: train_a3gc_tp.py:287-290, fixed for all stages)."""
        from a3gc_tpu.train import make_optimizer
        cfg, params = make_stage(1, nira, hidden=8)
        tc0 = TrainConfig(batch_size=4, lr=1.0, lr_decay=0.5, start_epoch=0)
        tc2 = TrainConfig(batch_size=4, lr=1.0, lr_decay=0.5, start_epoch=2)
        r0 = StageRunner(1, cfg, params, tc0, steps_per_epoch=2)
        r2 = StageRunner(1, cfg, params, tc2, steps_per_epoch=2)
        raw = {k: v[:4] for k, v in packed.items()}
        # one step each; compare parameter update magnitudes: the
        # fast-forwarded schedule starts at lr * decay^2
        s0, _ = r0.train_step(r0.state, raw, jax.random.PRNGKey(0))
        s2, _ = r2.train_step(r2.state, raw, jax.random.PRNGKey(0))
        d0 = np.abs(np.asarray(s0.params.linear_in.kernel)
                    - np.asarray(params.linear_in.kernel)).max()
        d2 = np.abs(np.asarray(s2.params.linear_in.kernel)
                    - np.asarray(params.linear_in.kernel)).max()
        np.testing.assert_allclose(d2, d0 * 0.25, rtol=1e-3)


class TestTailBatches:
    """Partial tail batches are kept, padded to the static batch size and
    weight-masked — the reference's DataLoaders never drop them
    (drop_last defaults False, ref: train_a3gc_tp.py:209-221)."""

    def test_sampler_pads_and_weights(self, packed):
        s = DP.Sampler(packed, 3, shuffle=False, pad_remainder=True)
        batches = list(s)
        assert len(batches) == len(s) == 3           # ceil(8 / 3)
        np.testing.assert_array_equal(batches[0]["_weight"], [1, 1, 1])
        np.testing.assert_array_equal(batches[2]["_weight"], [1, 1, 0])
        for k in packed:                 # every sequence exactly once, w=1
            got = np.concatenate(
                [b[k][b["_weight"] > 0] for b in batches])
            np.testing.assert_array_equal(got, packed[k])
        # pad rows repeat real sequences (finite, realistic values)
        np.testing.assert_array_equal(batches[2]["acc"][2], packed["acc"][0])

    def test_dataset_smaller_than_batch_tiles(self, packed):
        two = {k: v[:2] for k, v in packed.items()}
        (b,) = list(DP.Sampler(two, 5, shuffle=False, pad_remainder=True))
        np.testing.assert_array_equal(b["_weight"], [1, 1, 0, 0, 0])
        np.testing.assert_array_equal(b["acc"][2], two["acc"][0])

    def test_padded_step_matches_native_size_step(self, nira, packed):
        # one weighted step on [3 real + 1 pad] == one step on the native
        # [3] batch (noise/dropout off so rng shape differences vanish)
        cfg, params = make_stage(1, nira)
        tc = lambda b: TrainConfig(batch_size=b, leaf_noise_std=0.0,
                                   full_noise_std=0.0)
        r_pad = StageRunner(1, cfg, params, tc(4), steps_per_epoch=1)
        r_ref = StageRunner(1, cfg, params, tc(3), steps_per_epoch=1)
        padded = {k: v[[0, 1, 2, 0]] for k, v in packed.items()}
        padded["_weight"] = np.array([1, 1, 1, 0], np.float32)
        small = {k: v[:3] for k, v in packed.items()}
        rng = jax.random.PRNGKey(7)
        state_pad, loss_pad = r_pad.train_step(r_pad.state, padded, rng)
        state_ref, loss_ref = r_ref.train_step(r_ref.state, small, rng)
        np.testing.assert_allclose(float(loss_pad), float(loss_ref),
                                   rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
            state_pad.params, state_ref.params)

    @pytest.mark.slow
    def test_padded_accum_equals_monolithic(self, nira, packed):
        # pads land entirely in the second microbatch: the weighted
        # combine must still reproduce the monolithic weighted gradient
        cfg, params = make_stage(1, nira)
        mk = lambda k: TrainConfig(batch_size=4, accum_steps=k,
                                   leaf_noise_std=0.0, full_noise_std=0.0)
        r1 = StageRunner(1, cfg, params, mk(1), steps_per_epoch=1)
        r2 = StageRunner(1, cfg, params, mk(2), steps_per_epoch=1)
        padded = {k: v[[0, 1, 2, 0]] for k, v in packed.items()}
        padded["_weight"] = np.array([1, 1, 1, 0], np.float32)
        rng = jax.random.PRNGKey(3)
        s1, l1 = r1.train_step(r1.state, dict(padded), rng)
        s2, l2 = r2.train_step(r2.state, dict(padded), rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
            s1.params, s2.params)

    def test_eval_epoch_scores_only_real_sequences(self, nira, packed):
        cfg, params = make_stage(1, nira)
        tc = TrainConfig(batch_size=4, leaf_noise_std=0.0,
                         full_noise_std=0.0)
        runner = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
        five = {k: v[:5] for k, v in packed.items()}
        padded = runner.eval_epoch(
            DP.Sampler(five, 4, shuffle=False, pad_remainder=True))
        exact = runner.eval_epoch(
            DP.Sampler(five, 5, shuffle=False, drop_remainder=True))
        np.testing.assert_allclose(padded, exact, rtol=1e-6)

    def test_driver_runs_non_divisible_dataset(self, nira, packed):
        # end-to-end: a dataset smaller than the batch trains and
        # validates (this exact case aborted the protocol dry run)
        cfg, params = make_stage(1, nira)
        tc = TrainConfig(batch_size=4, max_epochs=2, patience=0,
                         leaf_noise_std=0.0, full_noise_std=0.0)
        runner = StageRunner(1, cfg, params, tc, steps_per_epoch=1)
        three = {k: v[:3] for k, v in packed.items()}
        run_cascade_training(
            {1: runner},
            lambda salt: DP.Sampler(three, 4, shuffle=True,
                                    seed=(0, salt), pad_remainder=True),
            lambda: DP.Sampler(three, 4, shuffle=False,
                               pad_remainder=True),
            tc)
        loss = runner.eval_epoch(
            DP.Sampler(three, 4, shuffle=False, pad_remainder=True))
        assert np.isfinite(loss)


class TestGracefulInterrupt:
    """Preemption-safe training: SIGTERM/SIGINT → save current params as a
    normal checkpoint, log an "interrupted" event, return cleanly."""

    def test_epoch_boundary_interrupt_saves_and_stops(self, nira, packed):
        from a3gc_tpu.train import GracefulInterrupt  # noqa: F401 (API)

        tc = TrainConfig(batch_size=4, max_epochs=10, patience=100)
        cfg, params = make_stage(1, nira, hidden=8)
        runners = {1: StageRunner(1, cfg, params, tc, steps_per_epoch=2)}
        events, saves = [], []
        calls = {"n": 0}

        def interrupt():
            # epoch 0: 2 per-step checks + 1 boundary check stay False;
            # the 4th call (epoch 1, first step) flips True
            calls["n"] += 1
            return calls["n"] >= 4

        run_cascade_training(
            runners,
            lambda: DP.Sampler(packed, 4, seed=0),
            lambda: DP.Sampler(packed, 4, shuffle=False, seed=0),
            tc,
            save_fn=lambda st, ep, p: saves.append((st, ep)),
            log_fn=events.append,
            interrupt=interrupt)

        assert events[-1].get("event") == "interrupted"
        assert events[-1]["epoch"] == 1
        # stopped at the step boundary: epoch 1 ran 0 steps
        assert int(runners[1].state.step) == 2
        # epoch-0 improvement save + the interrupt save of epoch 1
        assert saves == [(1, 0), (1, 1)]

    def test_immediate_interrupt_stops_first_epoch(self, nira, packed):
        tc = TrainConfig(batch_size=4, max_epochs=10, patience=100)
        cfg, params = make_stage(1, nira, hidden=8)
        runners = {1: StageRunner(1, cfg, params, tc, steps_per_epoch=2)}
        events = []
        run_cascade_training(
            runners,
            lambda: DP.Sampler(packed, 4, seed=0),
            lambda: DP.Sampler(packed, 4, shuffle=False, seed=0),
            tc, log_fn=events.append, interrupt=lambda: True)
        assert int(runners[1].state.step) == 0
        assert [e.get("event") for e in events] == ["interrupted"]

    def test_interrupt_checker_rejects_meshless_multiprocess(
            self, monkeypatch):
        """Multi-process training with a mesh-less runner has no way to
        sync the stop flag (the signaled process would return alone and
        deadlock the survivors): interrupt_checker must reject it UP
        FRONT, not mid-run."""
        from a3gc_tpu.parallel.multihost import interrupt_checker

        # single-process: plain flag read, mesh irrelevant
        assert interrupt_checker(lambda: True, None)() is True
        assert interrupt_checker(None, None)() is False

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="mesh"):
            interrupt_checker(lambda: False, None)
        # no interrupt configured -> nothing to sync, always fine
        assert interrupt_checker(None, None)() is False

    def test_signal_handler_mechanics(self):
        import os
        import signal

        from a3gc_tpu.train import GracefulInterrupt

        before = signal.getsignal(signal.SIGTERM)
        with GracefulInterrupt() as gi:
            assert not gi()
            os.kill(os.getpid(), signal.SIGTERM)
            assert gi()                      # first signal: cooperative
            with pytest.raises(KeyboardInterrupt):
                os.kill(os.getpid(), signal.SIGTERM)   # second: escape
        assert signal.getsignal(signal.SIGTERM) == before

    @pytest.mark.slow
    def test_cli_sigterm_checkpoints_and_resumes(self, tmp_path):
        """End-to-end preemption drill: SIGTERM a real `cli train` run
        mid-training; it must exit 0 with an interrupt checkpoint that a
        resume run picks up."""
        import json
        import os
        import signal
        import subprocess
        import sys
        import time

        from tests.conftest import REPO_ROOT

        npz = str(tmp_path / "data.npz")
        np.savez(npz, **synthetic_packed_dataset(n_seqs=8, seq_len=16,
                                                 seed=0))
        env = {k: v for k, v in os.environ.items()
               if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
        env.update(PYTHONPATH=REPO_ROOT, JAX_PLATFORMS="cpu")
        cmd = [sys.executable, "-m", "a3gc_tpu.cli", "train",
               "--model", "a3gc", "-b", "4", "--epochs", "100000",
               "--patience", "100000", "--start_at", "3",
               "--hu1", "8", "--hu2", "8", "--hu3", "8",
               "--name", "run", "--save_root", str(tmp_path / "runs"),
               "--train_data", npz, "--valid_data", npz]
        proc = subprocess.Popen(cmd, env=env, cwd=str(tmp_path),
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        log_path = tmp_path / "runs" / "run" / "train_log.jsonl"
        deadline = time.time() + 300
        try:
            while time.time() < deadline:        # wait for ≥2 epoch lines
                if log_path.exists() and \
                        len(log_path.read_text().splitlines()) >= 2:
                    break
                assert proc.poll() is None, proc.communicate()[0]
                time.sleep(0.5)
            else:
                raise AssertionError("no epoch lines before deadline")
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert proc.returncode == 0, out
        events = [json.loads(line)
                  for line in log_path.read_text().splitlines()]
        assert events[-1].get("event") == "interrupted", events[-1]

        from a3gc_tpu.utils import discover_latest, restore_params
        found = discover_latest(str(tmp_path / "runs" / "run"), 3)
        assert found is not None
        cfg, params = make_stage(3, load_adjacency_template(), hidden=8)
        restored = restore_params(found[0], params)
        assert jax.tree_util.tree_structure(restored) == \
            jax.tree_util.tree_structure(params)
