"""Eval tooling: worst-frame extraction, streaming session, DIP evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from a3gc_tpu.data import load_adjacency_template
from a3gc_tpu.eval import DipEvaluator, StreamingSession
from a3gc_tpu.eval.worst_frames import (
    compare_models,
    per_frame_errors,
    select_extreme_frames,
)
from a3gc_tpu.models import nets as N
from a3gc_tpu.models.pipeline import (CascadeConfig, PoseNetConfig,
                                      init_pose_net)
from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = tmp_path_factory.mktemp("smpl") / "s.pkl"
    return load_parametric_model(write_synthetic_smpl_pickle(str(p),
                                                             n_vertices=120))


def poses(n, seed, noise=0.0):
    aa = Rotation.random(n * 24, random_state=seed).as_rotvec() * 0.3
    if noise:
        rng = np.random.default_rng(seed)
        aa = aa + rng.normal(scale=noise, size=aa.shape)
    return Rotation.from_rotvec(aa).as_matrix().reshape(
        n, 24, 3, 3).astype(np.float32)


class TestWorstFrames:
    def test_select_respects_separation(self):
        scores = np.zeros(2000)
        scores[[100, 150, 900, 1500]] = [10, 9, 8, 7]
        sel = select_extreme_frames(scores, k=3, min_separation=300)
        assert sel[0] == 100 and 150 not in sel
        assert set(sel) == {100, 900, 1500}

    def test_compare_models(self, model, tmp_path):
        gt = poses(700, seed=0)
        pred_a = poses(700, seed=0, noise=0.2)   # worse
        pred_b = poses(700, seed=0, noise=0.05)  # better
        out = compare_models(model, [gt[:400], gt[400:]],
                             [pred_a[:400], pred_a[400:]],
                             [pred_b[:400], pred_b[400:]],
                             k=2, min_separation=100,
                             out_dir=str(tmp_path / "bw"))
        err_a = per_frame_errors(model, [gt], [pred_a])
        err_b = per_frame_errors(model, [gt], [pred_b])
        assert err_a.mean() > err_b.mean()
        assert len(out["b_improves_most"]) == 2
        import pickle
        with open(tmp_path / "bw" / "b_improves_most.p", "rb") as f:
            payload = pickle.load(f)
        assert payload["gt"].shape == (2, 24, 3, 3)


class TestStreaming:
    def test_state_threads_across_windows(self):
        nira = load_adjacency_template()
        cfg = PoseNetConfig(net=N.GraphNetConfig(
            cell="a3gc", units_in=12, units_out=3, units_hidden=8),
            rotsize=3)
        params = init_pose_net(jax.random.PRNGKey(0), cfg, nira)
        sess = StreamingSession(params, cfg, window=10)

        rng = np.random.default_rng(0)
        w1 = rng.normal(size=(10, 15, 12)).astype(np.float32)
        w2 = rng.normal(size=(10, 15, 12)).astype(np.float32)

        out_a = sess.step(w1)
        out_b = sess.step(w2)          # carried state
        sess.reset()
        out_b_fresh = sess.step(w2)    # zero state
        assert out_a.shape == (10, 15, 3)
        assert np.abs(out_b - out_b_fresh).max() > 1e-7

    def test_streaming_throughput_shape(self):
        nira = load_adjacency_template()
        cfg = PoseNetConfig(net=N.GraphNetConfig(
            cell="ggru", units_in=12, units_out=3, units_hidden=8),
            rotsize=3)
        params = init_pose_net(jax.random.PRNGKey(1), cfg, nira)
        sess = StreamingSession(params, cfg, window=5)
        for _ in range(3):
            out = sess.step(np.zeros((5, 15, 12), np.float32))
        assert out.shape == (5, 15, 3)


class TestRunWindows:
    """Upload-ahead window driver (PROFILE_ASYNC: -29% per-window wall
    through the relay): results and carried state must be identical to
    the per-window step loop."""

    def test_equals_step_loop(self, model):
        from scipy.spatial.transform import Rotation

        from a3gc_tpu.eval.streaming import (StreamingCascade,
                                             streaming_predictions)

        nira = load_adjacency_template()

        def g(ui, uo, h, rot):
            return PoseNetConfig(net=N.GraphNetConfig(
                cell="a3gc", units_in=ui, units_out=uo, units_hidden=h),
                rotsize=rot)

        cfg = CascadeConfig(stage1=g(12, 3, 8, 3), stage2=g(15, 3, 8, 3),
                            stage3=g(15, 9, 8, 9))
        params3 = tuple(init_pose_net(jax.random.PRNGKey(i), c, nira)
                        for i, c in enumerate((cfg.stage1, cfg.stage2,
                                               cfg.stage3)))
        W, n = 5, 4
        ori = Rotation.random(n * W * 6, random_state=50).as_matrix(
        ).reshape(n, W, 54).astype(np.float32)
        acc = np.random.default_rng(51).normal(
            scale=0.5, size=(n, W, 18)).astype(np.float32)

        a = StreamingCascade(params3, cfg, model, window=W)
        b = StreamingCascade(params3, cfg, model, window=W)
        got = a.run_windows(ori, acc)
        want = np.stack([np.asarray(b.step(ori[k], acc[k]))
                         for k in range(n)])
        np.testing.assert_allclose(got, want, atol=0)       # identical
        for x, y in zip(jax.tree_util.tree_leaves(a._states),
                        jax.tree_util.tree_leaves(b._states)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=0)

        # streaming_predictions now routes plain sessions through it;
        # partial-tail sensor-hold semantics unchanged
        T = n * W - 3
        flat_o = ori.reshape(-1, 54)[:T]
        flat_a = acc.reshape(-1, 18)[:T]
        a.reset()
        pred = streaming_predictions(a, flat_o, flat_a)
        assert pred.shape[0] == T


class TestStreamingSessionBuffered:
    """Lookahead/history on the SINGLE-NET online mode (VERDICT r3 #3):
    the same buffered transactional emission as StreamingCascade, over
    one net with one carried state (ref: net_aagc.py:1022-1031)."""

    def _dip(self, h=8, n_out=12):
        cfg = PoseNetConfig(net=N.DIPConfig(n_input=10, n_output=n_out,
                                            n_hidden=h), rotsize=3)
        params = init_pose_net(jax.random.PRNGKey(3), cfg)
        return cfg, params

    def test_kp_exact_construction(self):
        """Emission for window k at buffer fill f == one pass over the
        f·W buffered frames from the state pinned at the oldest buffered
        window, sliced at the emitted window; the carried state advances
        through the OLDEST window alone once at capacity; flush emits
        the un-emitted tail over the whole buffer."""
        from a3gc_tpu.eval.streaming import StreamingSession as SS

        cfg, params = self._dip()
        W, K, P = 6, 1, 1
        cap = P + K + 1
        T = 5 * W
        rng = np.random.default_rng(0)
        x = rng.normal(size=(T, 10)).astype(np.float32)

        sess = SS(params, cfg, window=W, lookahead=K, history=P)
        emitted = []
        for t in range(0, T, W):
            o = sess.step(x[t:t + W])
            if o is not None:
                emitted.append(o)
        tail = sess.flush()
        assert tail is not None and tail.shape[0] == K * W
        emitted.append(tail)
        got = np.concatenate(emitted)
        assert got.shape[0] == T

        # oracle: manual buffer replay with plain jitted forwards
        import jax.numpy as jnp
        from a3gc_tpu.models.pipeline import pose_net_forward

        @jax.jit
        def fwd(params, xx, state):
            return pose_net_forward(params, cfg, xx, state)

        zero = N.dip_zero_state(cfg.net, 1)
        state, buf, want = zero, [], []
        for k in range(T // W):
            buf.append(x[k * W:(k + 1) * W])
            f = len(buf)
            if f >= K + 1:
                ctx = jnp.asarray(np.concatenate(buf)[None])
                out, _ = fwd(params, ctx, state)
                lo = (f - K - 1) * W
                want.append(np.asarray(out[0, lo:lo + W]))
            if f == cap:
                _, state = fwd(params,
                               jnp.asarray(buf[0][None]), state)
                buf.pop(0)
        # flush: one pass over the remaining buffer, newest K windows
        f = len(buf)
        ctx = jnp.asarray(np.concatenate(buf)[None])
        out, _ = fwd(params, ctx, state)
        want.append(np.asarray(out[0, (f - K) * W:]))
        np.testing.assert_allclose(got, np.concatenate(want), atol=2e-6)

    def test_multi_equals_single_with_recycle(self):
        """streams=S multiplexing with ragged lengths and slot recycling
        == the per-sequence path, plain AND buffered."""
        from a3gc_tpu.eval.streaming import (
            StreamingSession as SS, streaming_outputs,
            streaming_outputs_multi)

        cfg, params = self._dip()
        W = 5
        rng = np.random.default_rng(1)
        # 5 ragged sequences over 2 slots forces recycling; non-multiple
        # lengths cover the sensor-hold tail
        seqs = [rng.normal(size=(t, 10)).astype(np.float32)
                for t in (23, 11, 17, 9, 30)]

        for kw in ({}, {"lookahead": 1, "history": 1},
                   {"history": 2}):
            single = SS(params, cfg, window=W, **kw)
            want = [streaming_outputs(single, s) for s in seqs]
            multi = SS(params, cfg, window=W, streams=2, **kw)
            got = streaming_outputs_multi(multi, seqs)
            for i, (w, g) in enumerate(zip(want, got)):
                assert g.shape == w.shape
                np.testing.assert_allclose(
                    g, w, atol=2e-5, err_msg=f"seq {i} kw={kw}")

    def test_graph_net_buffered_smoke(self):
        """The buffered session also drives a graph single net (any
        reference PoseNet has the online mode, ref: net_aagc.py:802)."""
        from a3gc_tpu.eval.streaming import StreamingSession as SS

        nira = load_adjacency_template()
        cfg = PoseNetConfig(net=N.GraphNetConfig(
            cell="a3gc", units_in=12, units_out=3, units_hidden=8),
            rotsize=3)
        params = init_pose_net(jax.random.PRNGKey(0), cfg, nira)
        sess = SS(params, cfg, window=4, lookahead=1)
        rng = np.random.default_rng(2)
        outs = [sess.step(rng.normal(size=(4, 15, 12)).astype(np.float32))
                for _ in range(3)]
        assert outs[0] is None and outs[1].shape == (4, 15, 3)
        assert sess.flush().shape == (4, 15, 3)
        assert all(np.isfinite(o).all() for o in outs[1:])


class TestDipEvaluator:
    @pytest.mark.parametrize("rotsize", [9, 6])
    def test_runs_and_is_finite(self, model, rotsize):
        """rotsize 9 AND 6: the reference's evaluate_dip.py defaults to a
        6D-rotation net (ref: evaluate_dip.py:23, net_aagc.py:1068-1072)."""
        cfg = PoseNetConfig(net=N.DIPConfig(n_input=60,
                                            n_output=15 * rotsize,
                                            n_hidden=32), rotsize=rotsize)
        params = init_pose_net(jax.random.PRNGKey(0), cfg)
        stats = {
            "ori_mean_channel": np.zeros(54, np.float32),
            "ori_std_channel": np.ones(54, np.float32),
            "acc_mean_channel": np.zeros(18, np.float32),
            "acc_std_channel": np.ones(18, np.float32),
        }
        ev = DipEvaluator(params, cfg, model, stats)
        T = 100
        seqs = [{
            "ori": Rotation.random(T * 6, random_state=1).as_matrix(
            ).reshape(T, 54).astype(np.float32),
            "acc": np.random.default_rng(0).normal(
                size=(T, 18)).astype(np.float32),
            "pose": Rotation.random(T * 15, random_state=2).as_matrix(
            ).reshape(T, 135).astype(np.float32),
        }]
        mean, seconds, frames = ev.evaluate(seqs)
        assert mean.shape == (5, 2) and np.isfinite(mean).all()
        assert frames == T

        # the reference's per-net online mode, scored: window == T is one
        # offline pass (metrics match); windowed state carry stays finite
        # and covers the partial-tail sensor-hold policy (T=100, W=30)
        st_mean, _, st_frames = ev.evaluate_streaming(seqs, window=T)
        assert st_frames == T
        np.testing.assert_allclose(st_mean, mean, atol=0.1)
        np.testing.assert_allclose(st_mean[0], mean[0], atol=5e-3)
        win_mean, _, _ = ev.evaluate_streaming(seqs, window=30)
        assert np.isfinite(win_mean).all()

        # multiplexed dip streaming: ragged group over 2 slots (incl.
        # the short-group sequence-repeat padding) == per-sequence
        T2 = 70
        seqs2 = seqs + [{
            "ori": Rotation.random(T2 * 6, random_state=3).as_matrix(
            ).reshape(T2, 54).astype(np.float32),
            "acc": np.random.default_rng(2).normal(
                size=(T2, 18)).astype(np.float32),
            "pose": Rotation.random(T2 * 15, random_state=4).as_matrix(
            ).reshape(T2, 135).astype(np.float32),
        }] * 2
        one_mean, _, fr1 = ev.evaluate_streaming(seqs2, window=30)
        bat_mean, _, fr2 = ev.evaluate_streaming(seqs2, window=30,
                                                 batch_streams=2)
        assert fr1 == fr2 == T + 2 * T2
        # the multiplexed path recycles slots but is semantically the
        # per-sequence path — fp32 noise only
        np.testing.assert_allclose(bat_mean, one_mean, atol=1e-3)

        # the quality levers price through the dip online mode too
        kp_mean, _, fr3 = ev.evaluate_streaming(
            seqs2, window=30, lookahead=1, history=1, batch_streams=2)
        kp_one, _, _ = ev.evaluate_streaming(seqs2, window=30,
                                             lookahead=1, history=1)
        assert fr3 == fr1 and np.isfinite(kp_mean).all()
        np.testing.assert_allclose(kp_mean, kp_one, atol=1e-3)


class TestFlatCascadeEvaluator:
    def test_tp_cascade_eval(self, model):
        """TransPose (flat DIP-net) cascade through the bucketed evaluator."""
        from a3gc_tpu.eval import CascadeEvaluator
        from a3gc_tpu.models.pipeline import CascadeConfig, init_pose_net

        def d(ni, no, h, rot):
            return PoseNetConfig(net=N.DIPConfig(n_input=ni, n_output=no,
                                                 n_hidden=h), rotsize=rot)
        cfg = CascadeConfig(stage1=d(72, 15, 16, 3), stage2=d(87, 69, 16, 3),
                            stage3=d(141, 135, 16, 9))
        params3 = tuple(init_pose_net(jax.random.PRNGKey(i), c)
                        for i, c in enumerate(
                            (cfg.stage1, cfg.stage2, cfg.stage3)))
        T = 90
        seqs = [{
            "ori": Rotation.random(T * 6, random_state=5).as_matrix(
            ).reshape(T, 54).astype(np.float32),
            "acc": np.random.default_rng(1).normal(
                size=(T, 18)).astype(np.float32),
            "pose": Rotation.random(T * 15, random_state=6).as_matrix(
            ).reshape(T, 135).astype(np.float32),
        }]
        ev = CascadeEvaluator(params3, cfg, model)
        mean, seconds, frames = ev.evaluate(seqs)
        assert mean.shape == (5, 2) and np.isfinite(mean).all()
        assert frames == T

        # streaming evaluation covers the DENSE cascade path too:
        # window == T equals offline; windowed + history stays finite
        st_mean, _, st_frames, st_preds = ev.evaluate_streaming(
            seqs, window=T, return_preds=True)
        assert st_frames == T
        _, _, _, off_preds = ev.evaluate(seqs, return_preds=True)
        np.testing.assert_allclose(st_preds[0], off_preds[0], atol=2e-5)
        np.testing.assert_allclose(st_mean, mean, atol=0.1)
        win_mean, _, _ = ev.evaluate_streaming(seqs, window=30, history=1)
        assert np.isfinite(win_mean).all()


class TestStreamingCascade:
    def _build(self, model):
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.models.pipeline import CascadeConfig

        nira = load_adjacency_template()

        def g(ui, uo, h, rot):
            return PoseNetConfig(net=N.GraphNetConfig(
                cell="a3gc", units_in=ui, units_out=uo, units_hidden=h),
                rotsize=rot)

        cfg = CascadeConfig(stage1=g(12, 3, 8, 3), stage2=g(15, 3, 8, 3),
                            stage3=g(15, 9, 8, 9))
        params3 = tuple(
            init_pose_net(jax.random.PRNGKey(i), c, nira)
            for i, c in enumerate((cfg.stage1, cfg.stage2, cfg.stage3)))
        return StreamingCascade, cfg, params3

    def test_matches_offline_cascade(self, model):
        """One window == the offline cascade on the same frames (both see
        the whole window forward AND backward), and the carried state makes
        the second window differ from a reset second window."""
        from a3gc_tpu.models.pipeline import cascade_apply

        SC, cfg, params3 = self._build(model)
        sess = SC(params3, cfg, model, window=12)

        rng = np.random.default_rng(3)
        ori = Rotation.random(24 * 6, random_state=5).as_matrix().reshape(
            24, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(24, 18)).astype(np.float32)

        w1 = sess.step(ori[:12], acc[:12])
        assert w1.shape == (12, 24, 3, 3)

        from a3gc_tpu.data import pipeline as DPipe
        imu = DPipe.scatter_graph_inputs(jnp.asarray(ori[None, :12]),
                                         jnp.asarray(acc[None, :12]))
        offline = np.asarray(cascade_apply(params3, cfg, model, imu))
        np.testing.assert_allclose(w1, offline, atol=2e-5)

        w2 = sess.step(ori[12:], acc[12:])      # carried state
        sess.reset()
        w2_fresh = sess.step(ori[12:], acc[12:])
        assert np.abs(w2 - w2_fresh).max() > 1e-7

    def test_cli_stream_end_to_end(self, model, tmp_path):
        """The stream subcommand runs over a packed npz and prints stats."""
        import io, json, contextlib
        from a3gc_tpu import cli as CLI

        rng = np.random.default_rng(7)
        seqs = {}
        for i, T in enumerate((40, 25)):
            ori = Rotation.random(T * 6, random_state=i).as_matrix().reshape(
                T, 54).astype(np.float32)
            seqs[f"seq{i}_ori"] = ori
            seqs[f"seq{i}_acc"] = rng.normal(
                scale=0.5, size=(T, 18)).astype(np.float32)
            seqs[f"seq{i}_pose"] = np.tile(
                np.eye(3, dtype=np.float32).reshape(1, 1, 3, 3),
                (T, 15, 1, 1)).reshape(T, 135)
        inp = tmp_path / "test.npz"
        np.savez(inp, **seqs)
        out = tmp_path / "poses.npz"

        smpl = tmp_path / "s.pkl"
        write_synthetic_smpl_pickle(str(smpl), n_vertices=120)
        args = CLI.build_parser().parse_args([
            "stream", "--input", str(inp), "--window", "10",
            "--output", str(out), "--model", "a3gc",
            "--hu1", "8", "--hu2", "8", "--hu3", "8",
            "--smpl", str(smpl)])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            args.fn(args)
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["window"] == 10
        assert stats["windows"] == 6          # 40//10 + 25//10 windows
        assert stats["frames_per_sec"] > 0
        with np.load(out) as z:
            assert z["pose_000"].shape == (40, 24, 3, 3)
            assert z["pose_001"].shape == (20, 24, 3, 3)

    @pytest.mark.slow
    def test_cli_stream_evaluate_scores_emissions(self, model, tmp_path):
        """`stream --evaluate` prints the reference 5-metric table for
        the streamed emissions and puts sip_deg in the JSON line; it
        composes with --history/--lookahead, and a zero-divergence
        check holds: with window == sequence length the streamed SIP
        equals the offline evaluator's SIP on the same net."""
        import io, json, contextlib
        from a3gc_tpu import cli as CLI

        rng = np.random.default_rng(61)
        seqs = {}
        T = 30
        ori = Rotation.random(T * 6, random_state=61).as_matrix().reshape(
            T, 54).astype(np.float32)
        seqs["seq0_ori"] = ori
        seqs["seq0_acc"] = rng.normal(
            scale=0.5, size=(T, 18)).astype(np.float32)
        seqs["seq0_pose"] = Rotation.random(
            T * 15, random_state=62).as_matrix().reshape(
            T, 135).astype(np.float32)
        inp = tmp_path / "test.npz"
        np.savez(inp, **seqs)
        smpl = tmp_path / "s.pkl"
        write_synthetic_smpl_pickle(str(smpl), n_vertices=120)

        def run(extra):
            args = CLI.build_parser().parse_args([
                "stream", "--input", str(inp), "--model", "a3gc",
                "--hu1", "8", "--hu2", "8", "--hu3", "8",
                "--smpl", str(smpl), "--evaluate"] + extra)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                args.fn(args)
            out = buf.getvalue().strip().splitlines()
            return out, json.loads(out[-1])

        out, st = run(["--window", "10", "--history", "1",
                       "--lookahead", "1"])
        assert any("SIP Error" in ln for ln in out)
        assert st["evaluated_frames"] == 30
        assert np.isfinite(st["sip_deg"]) and st["sip_deg"] > 0

        # window == T: streaming IS the offline pass, so the reported
        # SIP must match the offline evaluator on the same random net
        _, st_full = run(["--window", str(T)])
        from a3gc_tpu.eval.run import CascadeEvaluator
        from a3gc_tpu.data.factory.dipimu import load_test_sequences
        SC, cfg, params3 = self._build(model)
        # rebuild the same params the CLI used (seeded identically)
        args = CLI.build_parser().parse_args([
            "stream", "--input", str(inp), "--model", "a3gc",
            "--hu1", "8", "--hu2", "8", "--hu3", "8",
            "--smpl", str(smpl)])
        from a3gc_tpu.cli import (_load_body_model, _load_cascade_params,
                                  _stage_configs)
        body = _load_body_model(args)
        nira = load_adjacency_template()
        cascade, is_graph = _stage_configs(args, precision="default")
        p3 = _load_cascade_params(args, cascade, is_graph, nira)
        ev = CascadeEvaluator(p3, cascade, body)
        mean, _, _ = ev.evaluate(load_test_sequences(str(inp)))
        np.testing.assert_allclose(st_full["sip_deg"], float(mean[0, 0]),
                                   atol=0.05)

    def test_pipelined_equals_synchronous(self, model):
        """step_async + flush produce exactly the synchronous poses."""
        SC, cfg, params3 = self._build(model)
        rng = np.random.default_rng(9)
        T, W = 36, 12
        ori = Rotation.random(T * 6, random_state=8).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)

        sess = SC(params3, cfg, model, window=W)
        sync = [sess.step(ori[t:t + W], acc[t:t + W])
                for t in range(0, T, W)]
        sess.reset()
        piped = [p for t in range(0, T, W)
                 if (p := sess.step_async(ori[t:t + W], acc[t:t + W]))
                 is not None]
        piped.append(sess.flush())
        assert len(piped) == len(sync)
        for a, b in zip(sync, piped):
            np.testing.assert_allclose(a, b, atol=0)


    def test_lookahead_exact_construction(self, model):
        """Lookahead emission for window k == cascade run over [k, k+2W)
        from the carried state, first W frames; carried state advances
        exactly like plain windowing; flush emits the final window
        without future context (== plain windowing's final window)."""
        SC, cfg, params3 = self._build(model)
        rng = np.random.default_rng(10)
        T, W = 36, 12
        ori = Rotation.random(T * 6, random_state=10).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)

        la = SC(params3, cfg, model, window=W, lookahead=True)
        emitted = []
        for t in range(0, T, W):
            p = la.step(ori[t:t + W], acc[t:t + W])
            if p is not None:
                emitted.append(p)
        emitted.append(la.flush())
        assert len(emitted) == T // W

        # oracle: manual construction with TWO plain sessions
        plain = SC(params3, cfg, model, window=W)      # state advance
        wide = SC(params3, cfg, model, window=2 * W)   # emission
        for k, t in enumerate(range(0, T, W)):
            if t + 2 * W <= T:
                wide._states = plain._states
                want = wide.step(ori[t:t + 2 * W], acc[t:t + 2 * W])[:W]
            else:
                want = None                            # final window
            got_plain = plain.step(ori[t:t + W], acc[t:t + W])
            if want is None:
                want = got_plain                       # flush semantics
            np.testing.assert_allclose(emitted[k], want, atol=1e-6,
                                       err_msg=f"window {k}")

    def test_lookahead_reduces_offline_divergence(self, model):
        """The point of the feature: with the SAME weights, lookahead
        streaming is strictly closer to the offline (full-sequence)
        output than plain windowed streaming, averaged over the
        non-final windows."""
        SC, cfg, params3 = self._build(model)
        rng = np.random.default_rng(11)
        T, W = 96, 12
        ori = Rotation.random(T * 6, random_state=11).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)

        offline = SC(params3, cfg, model, window=T).step(ori, acc)

        def run(lookahead):
            sess = SC(params3, cfg, model, window=W, lookahead=lookahead)
            out = [p for t in range(0, T, W)
                   if (p := sess.step(ori[t:t + W], acc[t:t + W]))
                   is not None]
            tail = sess.flush() if lookahead else None
            if tail is not None:
                out.append(tail)
            return np.concatenate(out)

        plain, la = run(False), run(True)
        # compare on the non-final region (the tail has no lookahead)
        n = T - W
        d_plain = np.abs(plain[:n] - offline[:n]).mean()
        d_la = np.abs(la[:n] - offline[:n]).mean()
        assert d_la < d_plain, (d_la, d_plain)

    def test_multi_stream_equals_independent_sessions(self, model):
        """streams=S serving == S independent single-stream sessions,
        including a per-stream reset mid-run (client 1 ends its sequence
        while client 0 keeps its carried state)."""
        SC, cfg, params3 = self._build(model)
        W, S = 8, 3
        multi = SC(params3, cfg, model, window=W, streams=S)
        singles = [SC(params3, cfg, model, window=W) for _ in range(S)]

        rng = np.random.default_rng(11)
        ori = Rotation.random(2 * W * S * 6, random_state=8).as_matrix(
        ).reshape(S, 2 * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, 2 * W, 18)).astype(np.float32)

        # window 1
        m1 = multi.step(ori[:, :W], acc[:, :W])
        assert m1.shape == (S, W, 24, 3, 3)
        for i in range(S):
            s1 = singles[i].step(ori[i, :W], acc[i, :W])
            np.testing.assert_allclose(m1[i], s1, atol=2e-5,
                                       err_msg=f"stream {i} window 1")

        # stream 1 starts a new sequence; others carry state
        multi.reset(stream=1)
        singles[1].reset()
        m2 = multi.step(ori[:, W:], acc[:, W:])
        for i in range(S):
            s2 = singles[i].step(ori[i, W:], acc[i, W:])
            np.testing.assert_allclose(m2[i], s2, atol=2e-5,
                                       err_msg=f"stream {i} window 2")

    def test_cli_stream_multi(self, model, tmp_path):
        """`stream --streams 2` multiplexes the packed sequences and prints
        aggregate stats."""
        import io, json, contextlib
        from a3gc_tpu import cli as CLI

        rng = np.random.default_rng(13)
        seqs = {}
        for i, T in enumerate((40, 25, 17)):
            ori = Rotation.random(T * 6, random_state=20 + i).as_matrix(
            ).reshape(T, 54).astype(np.float32)
            seqs[f"seq{i}_ori"] = ori
            seqs[f"seq{i}_acc"] = rng.normal(
                scale=0.5, size=(T, 18)).astype(np.float32)
            seqs[f"seq{i}_pose"] = np.tile(
                np.eye(3, dtype=np.float32).reshape(1, 1, 3, 3),
                (T, 15, 1, 1)).reshape(T, 135)
        inp = tmp_path / "test.npz"
        np.savez(inp, **seqs)

        smpl = tmp_path / "s.pkl"
        write_synthetic_smpl_pickle(str(smpl), n_vertices=120)
        args = CLI.build_parser().parse_args([
            "stream", "--input", str(inp), "--window", "10",
            "--streams", "2", "--model", "a3gc",
            "--hu1", "8", "--hu2", "8", "--hu3", "8",
            "--smpl", str(smpl)])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            args.fn(args)
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["streams"] == 2
        # seq0 (40f) + seq2 (17f->10f) on slot 0, seq1 (25f->20f) on slot 1
        assert stats["frames_per_sec"] > 0

        # and the pipelined (submit-side latency) variant
        args = CLI.build_parser().parse_args([
            "stream", "--input", str(inp), "--window", "10",
            "--streams", "2", "--pipelined", "--model", "a3gc",
            "--hu1", "8", "--hu2", "8", "--hu3", "8",
            "--smpl", str(smpl)])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            args.fn(args)
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["streams"] == 2 and stats["windows"] > 0


    def test_cli_stream_multi_short_sequences(self, model, tmp_path):
        """All sequences shorter than the window → a graceful JSON error,
        not an IndexError on the empty latency array."""
        import io, json, contextlib
        from a3gc_tpu import cli as CLI

        rng = np.random.default_rng(17)
        seqs = {}
        for i, T in enumerate((5, 7)):
            seqs[f"seq{i}_ori"] = Rotation.random(T * 6, random_state=i
                ).as_matrix().reshape(T, 54).astype(np.float32)
            seqs[f"seq{i}_acc"] = rng.normal(size=(T, 18)).astype(np.float32)
            seqs[f"seq{i}_pose"] = np.tile(
                np.eye(3, dtype=np.float32).reshape(1, 1, 3, 3),
                (T, 15, 1, 1)).reshape(T, 135)
        inp = tmp_path / "short.npz"
        np.savez(inp, **seqs)
        smpl = tmp_path / "s.pkl"
        write_synthetic_smpl_pickle(str(smpl), n_vertices=120)
        args = CLI.build_parser().parse_args([
            "stream", "--input", str(inp), "--window", "10",
            "--streams", "2", "--model", "a3gc",
            "--hu1", "8", "--hu2", "8", "--hu3", "8", "--smpl", str(smpl)])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            args.fn(args)
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["windows"] == 0 and "error" in stats

    def test_multi_stream_soak_state_stability(self, model):
        """Many windows with interleaved per-slot resets: outputs stay
        finite and per-slot state matches an independent session."""
        SC, cfg, params3 = self._build(model)
        W, S = 6, 2
        multi = SC(params3, cfg, model, window=W, streams=S)
        single = SC(params3, cfg, model, window=W)

        rng = np.random.default_rng(19)
        n_windows = 12
        ori = Rotation.random(n_windows * W * S * 6, random_state=21
            ).as_matrix().reshape(S, n_windows * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, n_windows * W, 18)
                         ).astype(np.float32)
        for w in range(n_windows):
            sl = slice(w * W, (w + 1) * W)
            if w in (4, 9):            # slot 0 restarts; slot 1 carries on
                multi.reset(stream=0)
                single.reset()
            m = multi.step(ori[:, sl], acc[:, sl])
            s0 = single.step(ori[0, sl], acc[0, sl])
            assert np.isfinite(m).all()
            np.testing.assert_allclose(m[0], s0, atol=3e-5,
                                       err_msg=f"window {w}")

    def test_mesh_online_equals_single_device(self, model):
        """StreamingCascade(mesh=...) — the shard_map'd ONLINE windowed
        step over the 8-device CPU mesh — matches the single-device
        multi-stream session across carried state, per-stream reset, and
        active masking."""
        from a3gc_tpu.config import MeshConfig
        from a3gc_tpu.parallel import make_mesh

        SC, cfg, params3 = self._build(model)
        W, S = 6, 8
        mesh = make_mesh(MeshConfig(data=8, model=1))
        local = SC(params3, cfg, model, window=W, streams=S)
        shard = SC(params3, cfg, model, window=W, streams=S, mesh=mesh)

        rng = np.random.default_rng(23)
        ori = Rotation.random(3 * W * S * 6, random_state=23).as_matrix(
        ).reshape(S, 3 * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, 3 * W, 18)).astype(np.float32)

        m1 = local.step(ori[:, :W], acc[:, :W])
        s1 = shard.step(ori[:, :W], acc[:, :W])
        np.testing.assert_allclose(s1, m1, atol=1e-6)

        local.reset(stream=3)
        shard.reset(stream=3)
        active = np.ones(S, np.float32)
        active[5] = 0.0                      # slot 5 idles this tick
        m2 = local.step(ori[:, W:2 * W], acc[:, W:2 * W], active=active)
        s2 = shard.step(ori[:, W:2 * W], acc[:, W:2 * W], active=active)
        live = [i for i in range(S) if active[i]]
        np.testing.assert_allclose(s2[live], m2[live], atol=1e-6)

        m3 = local.step(ori[:, 2 * W:], acc[:, 2 * W:])
        s3 = shard.step(ori[:, 2 * W:], acc[:, 2 * W:])
        np.testing.assert_allclose(s3, m3, atol=1e-6)

    @pytest.mark.slow
    def test_mesh_lookahead_composes(self, model):
        """lookahead=K on a mesh session: the buffered emission and
        state-advance passes both route through the shard_map'd step, so
        sharded lookahead == single-device lookahead (emissions, the
        emitted mask, and the flushed tails)."""
        from a3gc_tpu.config import MeshConfig
        from a3gc_tpu.parallel import make_mesh

        SC, cfg, params3 = self._build(model)
        W, S, K, n = 6, 8, 1, 4
        mesh = make_mesh(MeshConfig(data=8, model=1))
        local = SC(params3, cfg, model, window=W, streams=S, lookahead=K)
        shard = SC(params3, cfg, model, window=W, streams=S, lookahead=K,
                   mesh=mesh)

        rng = np.random.default_rng(37)
        ori = Rotation.random(n * W * S * 6, random_state=37).as_matrix(
        ).reshape(S, n * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, n * W, 18)).astype(np.float32)

        for w in range(n):
            sl = slice(w * W, (w + 1) * W)
            pm, em = local.step(ori[:, sl], acc[:, sl])
            ps, es = shard.step(ori[:, sl], acc[:, sl])
            np.testing.assert_array_equal(es, em, err_msg=f"window {w}")
            if em.any():
                np.testing.assert_allclose(ps[em], pm[em], atol=1e-6,
                                           err_msg=f"window {w}")
        tm, ts = local.flush(), shard.flush()
        for i in range(S):
            np.testing.assert_allclose(ts[i], tm[i], atol=1e-6,
                                       err_msg=f"tail {i}")

    def test_lookahead_depth2_exact_construction(self, model):
        """lookahead=2: emission for window k == cascade over [k, k+3W)
        from the carried state, first W frames; flush drains the 2-window
        tail as ONE continuous chunk == an offline pass over the
        remaining frames from the carried state."""
        SC, cfg, params3 = self._build(model)
        rng = np.random.default_rng(29)
        W, n = 8, 5
        T = n * W
        ori = Rotation.random(T * 6, random_state=29).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)

        la = SC(params3, cfg, model, window=W, lookahead=2)
        emitted = []
        for t in range(0, T, W):
            p = la.step(ori[t:t + W], acc[t:t + W])
            if p is not None:
                emitted.append(p)
        assert len(emitted) == n - 2      # first 2 ticks warm up
        tail = la.flush()
        assert tail.shape[0] == 2 * W

        # oracle: a plain session tracks the carried state; each emitted
        # window is a 3W-wide pass from that state, first W frames
        plain = SC(params3, cfg, model, window=W)
        for k in range(n - 2):
            t = k * W
            wide = SC(params3, cfg, model, window=3 * W)
            wide._states = plain._states
            want = wide.step(ori[t:t + 3 * W], acc[t:t + 3 * W])[:W]
            plain.step(ori[t:t + W], acc[t:t + W])
            np.testing.assert_allclose(emitted[k], want, atol=1e-6,
                                       err_msg=f"window {k}")
        # tail oracle: ONE offline pass over the remaining 2W frames
        # from the carried state
        wide = SC(params3, cfg, model, window=2 * W)
        wide._states = plain._states
        want_tail = wide.step(ori[3 * W:], acc[3 * W:])
        np.testing.assert_allclose(tail, want_tail, atol=1e-6)

    def test_lookahead_multi_stream_composes(self, model):
        """lookahead with streams=S: per-slot buffers make active masking
        and per-stream reset compose — each slot's emissions equal an
        independent single-stream lookahead session fed the same
        windows."""
        SC, cfg, params3 = self._build(model)
        W, S, K = 6, 2, 1
        multi = SC(params3, cfg, model, window=W, streams=S, lookahead=K)
        singles = [SC(params3, cfg, model, window=W, lookahead=K)
                   for _ in range(S)]

        rng = np.random.default_rng(31)
        n = 6
        ori = Rotation.random(n * W * S * 6, random_state=31).as_matrix(
        ).reshape(S, n * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, n * W, 18)).astype(np.float32)

        # slot 1 idles on tick 2 and resets (new sequence) on tick 4;
        # slot 0 streams continuously
        for w in range(n):
            sl = slice(w * W, (w + 1) * W)
            active = np.ones(S, np.float32)
            if w == 2:
                active[1] = 0.0
            if w == 4:
                multi.reset(stream=1)
                singles[1].reset()
            pose, emitted = multi.step(ori[:, sl], acc[:, sl],
                                       active=active)
            for i in range(S):
                if not active[i]:
                    continue
                want = singles[i].step(ori[i, sl], acc[i, sl])
                assert emitted[i] == (want is not None), f"w{w} s{i}"
                if want is not None:
                    np.testing.assert_allclose(
                        pose[i], want, atol=2e-5,
                        err_msg=f"window {w} stream {i}")
        # drain one slot's tail while the other keeps its buffer
        tail0 = multi.flush(stream=0)
        want0 = singles[0].flush()
        np.testing.assert_allclose(tail0, want0, atol=2e-5)


    @pytest.mark.slow
    def test_history_exact_construction(self, model):
        """history=P emission for window k == cascade over windows
        [k-p, k] (p = min(P, k) — best-effort at stream start) from the
        carried state at window k-p, LAST W frames: past attention
        context at ZERO added latency. The carried state advances
        exactly like plain windowing (lagged P windows until flush)."""
        SC, cfg, params3 = self._build(model)
        rng = np.random.default_rng(41)
        W, n, P = 8, 5, 2
        T = n * W
        ori = Rotation.random(T * 6, random_state=41).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)

        hi = SC(params3, cfg, model, window=W, history=P)
        emitted = [hi.step(ori[t:t + W], acc[t:t + W])
                   for t in range(0, T, W)]
        assert all(p is not None for p in emitted)    # zero latency

        # oracle: snapshot the plain-streaming state at every window
        # boundary, then each emission is a (p+1)·W-wide pass from the
        # snapshot P windows back, last W frames
        plain = SC(params3, cfg, model, window=W)
        states = []
        for t in range(0, T, W):
            states.append(plain._states)
            plain.step(ori[t:t + W], acc[t:t + W])
        states.append(plain._states)          # state after the stream
        wides = {}
        for k in range(n):
            p = min(P, k)
            lo = (k - p) * W
            wide = wides.setdefault(
                p, SC(params3, cfg, model, window=(p + 1) * W))
            wide._states = states[k - p]
            want = wide.step(ori[lo:(k + 1) * W],
                             acc[lo:(k + 1) * W])[-W:]
            np.testing.assert_allclose(emitted[k], want, atol=1e-6,
                                       err_msg=f"window {k}")

        # history-only flush: nothing un-emitted (returns None) but the
        # carried state advances through the buffered windows as ONE
        # continuous chunk (NOT per-window passes — the rnn1→rnn2
        # state-seeding quirk makes those differ; same chunk semantics
        # as the lookahead flush)
        assert hi.flush() is None
        chunk = SC(params3, cfg, model, window=P * W)
        chunk._states = states[n - P]
        chunk.step(ori[(n - P) * W:], acc[(n - P) * W:])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            hi._states, chunk._states)

    def test_history_composes_with_lookahead(self, model):
        """history=P + lookahead=K: emission for window e (lagged K)
        == cascade over windows [e-p, e+K] from the carried state at
        window e-p, the emitted window's W frames; flush drains the
        K-window tail WITH its history context leading the pass."""
        SC, cfg, params3 = self._build(model)
        rng = np.random.default_rng(43)
        W, n, P, K = 8, 6, 1, 1
        T = n * W
        ori = Rotation.random(T * 6, random_state=43).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)

        sess = SC(params3, cfg, model, window=W, lookahead=K, history=P)
        emitted = []
        for t in range(0, T, W):
            p = sess.step(ori[t:t + W], acc[t:t + W])
            if p is not None:
                emitted.append(p)
        assert len(emitted) == n - K          # K-window warmup lag
        tail = sess.flush()
        assert tail.shape[0] == K * W

        plain = SC(params3, cfg, model, window=W)
        states = []
        for t in range(0, T, W):
            states.append(plain._states)
            plain.step(ori[t:t + W], acc[t:t + W])
        wides = {}
        for e in range(n - K):                # emitted window index
            p = min(P, e)
            lo, hi_ = (e - p) * W, (e + K + 1) * W
            wide = wides.setdefault(
                p + K + 1, SC(params3, cfg, model, window=(p + K + 1) * W))
            wide._states = states[e - p]
            want = wide.step(ori[lo:hi_], acc[lo:hi_])[p * W:(p + 1) * W]
            np.testing.assert_allclose(emitted[e], want, atol=1e-6,
                                       err_msg=f"window {e}")
        # tail oracle: the buffer holds [n-K-P, n) at flush; ONE pass
        # over it from the carried state, last K·W frames
        b0 = n - K - P
        wide = SC(params3, cfg, model, window=(P + K) * W)
        wide._states = states[b0]
        want_tail = wide.step(ori[b0 * W:], acc[b0 * W:])[-K * W:]
        np.testing.assert_allclose(tail, want_tail, atol=1e-6)

    @pytest.mark.slow
    def test_history_multi_stream_composes(self, model):
        """history with streams=S: per-slot buffers make active masking
        and per-stream reset compose — each slot's emissions equal an
        independent single-stream history session fed the same
        windows."""
        SC, cfg, params3 = self._build(model)
        W, S, P = 6, 2, 1
        multi = SC(params3, cfg, model, window=W, streams=S, history=P)
        singles = [SC(params3, cfg, model, window=W, history=P)
                   for _ in range(S)]

        rng = np.random.default_rng(47)
        n = 5
        ori = Rotation.random(n * W * S * 6, random_state=47).as_matrix(
        ).reshape(S, n * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, n * W, 18)).astype(np.float32)

        # slot 1 idles on tick 2 and resets (new sequence) on tick 3 —
        # afterwards the two slots sit at DIFFERENT buffer fills, so one
        # tick runs two emission groups (distinct context lengths)
        for w in range(n):
            sl = slice(w * W, (w + 1) * W)
            active = np.ones(S, np.float32)
            if w == 2:
                active[1] = 0.0
            if w == 3:
                multi.reset(stream=1)
                singles[1].reset()
            pose, emitted = multi.step(ori[:, sl], acc[:, sl],
                                       active=active)
            for i in range(S):
                if not active[i]:
                    continue
                want = singles[i].step(ori[i, sl], acc[i, sl])
                assert emitted[i] == (want is not None), f"w{w} s{i}"
                if want is not None:
                    np.testing.assert_allclose(
                        pose[i], want, atol=2e-5,
                        err_msg=f"window {w} stream {i}")

    def test_fused_steady_state_equals_two_pass(self, model):
        """fused=True (the default) collapses the steady-state emission
        pass + oldest-window advance into ONE dispatch; emissions,
        carried states, and flush tails must equal the two-pass path
        exactly — through warmup fills, active masking, per-stream
        reset (slots at different fills ⇒ mixed fused/unfused groups in
        one tick), and flush."""
        SC, cfg, params3 = self._build(model)
        W, S, K, P, n = 6, 2, 1, 1, 6
        fused = SC(params3, cfg, model, window=W, streams=S,
                   lookahead=K, history=P)
        plain = SC(params3, cfg, model, window=W, streams=S,
                   lookahead=K, history=P, fused=False)
        assert fused._fused_fn is not None and plain._fused_fn is None

        rng = np.random.default_rng(67)
        ori = Rotation.random(n * W * S * 6, random_state=67).as_matrix(
        ).reshape(S, n * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, n * W, 18)).astype(np.float32)

        for w in range(n):
            sl = slice(w * W, (w + 1) * W)
            active = np.ones(S, np.float32)
            if w == 3:
                active[1] = 0.0
            if w == 4:
                fused.reset(stream=1)
                plain.reset(stream=1)
            pf, ef = fused.step(ori[:, sl], acc[:, sl], active=active)
            pp, ep = plain.step(ori[:, sl], acc[:, sl], active=active)
            np.testing.assert_array_equal(ef, ep, err_msg=f"window {w}")
            if ef.any():
                np.testing.assert_allclose(pf[ef], pp[ep], atol=0,
                                           err_msg=f"window {w}")
        for a, b in zip(jax.tree_util.tree_leaves(fused._states),
                        jax.tree_util.tree_leaves(plain._states)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0)
        tf, tp = fused.flush(), plain.flush()
        for a, b in zip(tf, tp):
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_allclose(a, b, atol=0)

    @pytest.mark.slow
    def test_flush_failure_leaves_session_consistent(self, model):
        """A device failure during flush must not poison the carried
        state or drop buffered windows (transactional, like the step
        path): the retry after a transient error produces exactly what
        a never-failed session produces."""
        SC, cfg, params3 = self._build(model)
        rng = np.random.default_rng(59)
        W, K = 8, 1
        T = 3 * W
        ori = Rotation.random(T * 6, random_state=59).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)

        sess = SC(params3, cfg, model, window=W, lookahead=K)
        ref = SC(params3, cfg, model, window=W, lookahead=K)
        for t in range(0, T, W):
            sess.step(ori[t:t + W], acc[t:t + W])
            ref.step(ori[t:t + W], acc[t:t + W])

        states_before = sess._states
        fills_before = [len(b) for b in sess._buffers]
        real_fn = sess._fn

        def boom(*a, **k):
            raise RuntimeError("transient device error")

        sess._fn = boom
        with pytest.raises(RuntimeError, match="transient"):
            sess.flush()
        assert sess._states is states_before
        assert [len(b) for b in sess._buffers] == fills_before
        sess._fn = real_fn
        np.testing.assert_allclose(sess.flush(), ref.flush(), atol=0)

    @pytest.mark.slow
    def test_mesh_history_composes(self, model):
        """history=P on a mesh session: warmup-fill and steady-state
        emission passes plus the state advance all route through the
        shard_map'd step — sharded == single-device."""
        from a3gc_tpu.config import MeshConfig
        from a3gc_tpu.parallel import make_mesh

        SC, cfg, params3 = self._build(model)
        W, S, P, n = 6, 8, 1, 3
        mesh = make_mesh(MeshConfig(data=8, model=1))
        local = SC(params3, cfg, model, window=W, streams=S, history=P)
        shard = SC(params3, cfg, model, window=W, streams=S, history=P,
                   mesh=mesh)

        rng = np.random.default_rng(53)
        ori = Rotation.random(n * W * S * 6, random_state=53).as_matrix(
        ).reshape(S, n * W, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(S, n * W, 18)).astype(np.float32)

        for w in range(n):
            sl = slice(w * W, (w + 1) * W)
            pm, em = local.step(ori[:, sl], acc[:, sl])
            ps, es = shard.step(ori[:, sl], acc[:, sl])
            np.testing.assert_array_equal(es, em, err_msg=f"window {w}")
            np.testing.assert_allclose(ps[em], pm[em], atol=1e-6,
                                       err_msg=f"window {w}")


class TestEvaluateStreaming:
    """`CascadeEvaluator.evaluate_streaming` — the published 5-metric
    table measured THROUGH the deployment streaming path (window /
    lookahead / history), plus the `evaluate --streaming` CLI surface."""

    def _sequences(self, lengths, seed=7):
        rng = np.random.default_rng(seed)
        seqs = []
        for i, T in enumerate(lengths):
            seqs.append({
                "ori": Rotation.random(T * 6, random_state=seed + i)
                .as_matrix().reshape(T, 54).astype(np.float32),
                "acc": rng.normal(scale=0.5, size=(T, 18))
                .astype(np.float32),
                "pose": Rotation.random(T * 15, random_state=seed + 40 + i)
                .as_matrix().reshape(T, 135).astype(np.float32),
            })
        return seqs

    def test_window_equals_sequence_matches_offline(self, model):
        """With window == T (no tail padding, no state carry) streaming
        IS one offline pass: predictions match the offline evaluator's
        and so does the metric table."""
        from a3gc_tpu.eval.run import CascadeEvaluator

        _, cfg, params3 = TestStreamingCascade()._build(model)
        ev = CascadeEvaluator(params3, cfg, model)
        seqs = self._sequences([24, 24])
        off_mean, _, _, off_preds = ev.evaluate(seqs, return_preds=True)
        st_mean, secs, frames, st_preds = ev.evaluate_streaming(
            seqs, window=24, return_preds=True)
        assert frames == 48 and secs > 0
        for sp, op in zip(st_preds, off_preds):
            np.testing.assert_allclose(sp, op, atol=2e-5)
        np.testing.assert_allclose(st_mean[0], off_mean[0], atol=5e-3)
        np.testing.assert_allclose(st_mean, off_mean, atol=0.1)

    def test_streaming_predictions_assembly_oracle(self, model):
        """streaming_predictions (partial tail + lookahead + history) ==
        an explicit step/flush construction over the same padded windows
        — bitwise, same compiled programs."""
        from a3gc_tpu.eval.streaming import streaming_predictions

        SC, cfg, params3 = TestStreamingCascade()._build(model)
        T, W, K, P = 30, 12, 1, 1
        seq = self._sequences([T], seed=11)[0]
        ori, acc = seq["ori"], seq["acc"]

        sess = SC(params3, cfg, model, window=W, lookahead=K, history=P)
        pred = streaming_predictions(sess, ori, acc)
        assert pred.shape == (T, 24, 3, 3)

        rem = (-T) % W
        orip = np.concatenate([ori, np.repeat(ori[-1:], rem, axis=0)])
        accp = np.concatenate([acc, np.repeat(acc[-1:], rem, axis=0)])
        manual = SC(params3, cfg, model, window=W, lookahead=K, history=P)
        outs = []
        for t in range(0, T + rem, W):
            p = manual.step(orip[t:t + W], accp[t:t + W])
            if p is not None:
                outs.append(np.asarray(p))
        tail = manual.flush()
        if tail is not None:
            outs.append(np.asarray(tail))
        expected = np.concatenate(outs)[:T]
        np.testing.assert_array_equal(pred, expected)

    def test_quality_levers_and_session_reuse(self, model):
        """One evaluator scores plain vs history-augmented streaming on
        ragged-length sequences; both are finite, and the session resets
        cleanly between sequences (per-sequence determinism)."""
        from a3gc_tpu.eval.run import CascadeEvaluator

        _, cfg, params3 = TestStreamingCascade()._build(model)
        ev = CascadeEvaluator(params3, cfg, model)
        seqs = self._sequences([30, 17], seed=13)
        plain, _, fr1, preds_a = ev.evaluate_streaming(
            seqs, window=12, return_preds=True)
        hist, _, fr2, preds_b = ev.evaluate_streaming(
            seqs, window=12, history=1, return_preds=True)
        assert fr1 == fr2 == 47
        assert np.isfinite(plain).all() and np.isfinite(hist).all()
        # history changes the emissions (context differs) ...
        assert np.abs(preds_a[0] - preds_b[0]).max() > 1e-7
        # ... and a repeat run is deterministic
        plain2, _, _ = ev.evaluate_streaming(seqs, window=12)
        np.testing.assert_array_equal(plain, plain2)

    @pytest.mark.slow
    def test_multiplexed_predictions_equal_single_slot(self, model):
        """streaming_predictions_multi (S slots, ragged lengths, slot
        recycling) == per-sequence streaming_predictions — plain AND
        buffered (lookahead+history) modes."""
        from a3gc_tpu.eval.streaming import (streaming_predictions,
                                             streaming_predictions_multi)

        SC, cfg, params3 = TestStreamingCascade()._build(model)
        W, S = 10, 3
        # 5 ragged sequences over 3 slots: forces recycling + a tick mix
        # of fresh, mid-stream, and retired slots
        seqs = self._sequences([34, 21, 10, 27, 15], seed=23)
        pairs = [(s["ori"], s["acc"]) for s in seqs]

        for kw in ({}, {"lookahead": 1, "history": 1}):
            multi = SC(params3, cfg, model, window=W, streams=S, **kw)
            single = SC(params3, cfg, model, window=W, **kw)
            got = streaming_predictions_multi(multi, pairs)
            for k, (o, a) in enumerate(pairs):
                want = streaming_predictions(single, o, a)
                np.testing.assert_allclose(
                    got[k], want, atol=2e-5,
                    err_msg=f"seq {k} kw={kw}")

    def test_evaluate_streaming_batched_equals_sequential(self, model):
        """evaluate_streaming(batch_streams=S) reproduces the
        per-sequence metric table (the multiplexed path is a wall-time
        lever, not a different protocol)."""
        from a3gc_tpu.eval.run import CascadeEvaluator

        _, cfg, params3 = TestStreamingCascade()._build(model)
        ev = CascadeEvaluator(params3, cfg, model)
        seqs = self._sequences([30, 17, 22], seed=29)
        seq_mean, _, fr1 = ev.evaluate_streaming(seqs, window=12, history=1)
        bat_mean, secs, fr2 = ev.evaluate_streaming(
            seqs, window=12, history=1, batch_streams=2)
        assert fr1 == fr2 == 69 and secs > 0
        # predictions agree to ~1e-8; angle metrics on near-random
        # (untrained) rotations amplify that to ~0.02° (ill-conditioned
        # extraction — see PROTOCOL_CROSSCHECK.md), hence the 0.1 budget
        np.testing.assert_allclose(bat_mean, seq_mean, atol=0.1)

    def test_cli_evaluate_streaming_writes_report(self, model, tmp_path):
        """`evaluate --streaming W --lookahead K --history P` runs end to
        end on a packed npz and writes the tagged report file."""
        import contextlib
        import io
        import os

        from a3gc_tpu import cli as CLI

        seq = self._sequences([26], seed=17)[0]
        inp = tmp_path / "test.npz"
        np.savez(inp, **{f"seq0_{k}": v for k, v in seq.items()})
        smpl = tmp_path / "s.pkl"
        write_synthetic_smpl_pickle(str(smpl), n_vertices=120)

        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            args = CLI.build_parser().parse_args([
                "evaluate", "--model", "a3gc",
                "--hu1", "8", "--hu2", "8", "--hu3", "8",
                "--smpl", str(smpl), "--datasets", str(inp),
                "--streaming", "10", "--lookahead", "1",
                "--history", "1"])
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                args.fn(args)
            out = buf.getvalue()
            assert "SIP Error" in out and "26 frames" in out
            report = (tmp_path / "evaluation_results" /
                      "a3gc_test.npz_stream10_K1_P1.txt")
            assert report.exists()
            assert "stream10_K1_P1" in report.read_text()
        finally:
            os.chdir(cwd)


class TestWorstFramesContract:
    def test_reference_18_pickle_layout(self, model, tmp_path):
        """compare_models writes the reference's exact artifact set
        (ref: get_worst_frames.py:123-175): 3 criteria x best/worst x
        {gt,tp,our}.p = 18 pickles of [k,24,3,3] frame arrays."""
        import pickle
        gt = poses(700, seed=4)
        pa = poses(700, seed=4, noise=0.2)
        pb = poses(700, seed=4, noise=0.05)
        out_dir = tmp_path / "best_worst"
        compare_models(model, [gt], [pa], [pb], k=2, min_separation=100,
                       out_dir=str(out_dir))
        n = 0
        for crit in ("respect_our", "respect_tp", "respect_comp"):
            for kind in ("worst", "best"):
                for fname in ("gt.p", "tp.p", "our.p"):
                    p = out_dir / crit / kind / fname
                    assert p.exists(), p
                    arr = pickle.load(open(p, "rb"))
                    assert arr.shape == (2, 24, 3, 3)
                    n += 1
        assert n == 18
        # respect_comp/worst must hold the frames where B improves most:
        # its gt rows equal gt at those indices
        with open(out_dir / "b_improves_most.p", "rb") as f:
            payload = pickle.load(f)
        comp_gt = pickle.load(open(out_dir / "respect_comp/worst/gt.p",
                                   "rb"))
        np.testing.assert_allclose(comp_gt, payload["gt"], atol=0)

    def test_render_writes_pngs(self, model, tmp_path):
        """--render rasterizes each selected frame (gt | A | B) as a PNG
        next to the pickles via the built-in headless renderer."""
        gt = poses(400, seed=5)
        pa = poses(400, seed=5, noise=0.2)
        pb = poses(400, seed=5, noise=0.05)
        out_dir = tmp_path / "bw"
        compare_models(model, [gt], [pa], [pb], k=2, min_separation=50,
                       out_dir=str(out_dir), render=True, render_size=96)
        pngs = list(out_dir.glob("*/*/??_frame*.png"))
        assert len(pngs) == 3 * 2 * 2          # criteria x kinds x k
        from PIL import Image
        im = Image.open(pngs[0])
        assert im.size == (96, 96)
        # not a blank canvas: the skeletons actually drew something
        assert np.asarray(im).min() < 250

