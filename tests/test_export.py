"""AOT deployment export (a3gc_tpu.export): the serialized StableHLO
artifacts must reproduce the live StreamingCascade exactly — state
threading, idle-slot masking, and baked-in normalization included — after a
full serialize → deserialize round trip through files on disk."""

import http.client
import json
import os
import threading

import numpy as np
import pytest

import jax

from a3gc_tpu.data import load_adjacency_template
from a3gc_tpu.models import nets as N
from a3gc_tpu.models.pipeline import (CascadeConfig, PoseNetConfig,
                                      init_pose_net)
from a3gc_tpu.smpl import load_parametric_model, write_synthetic_smpl_pickle


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = tmp_path_factory.mktemp("smpl") / "s.pkl"
    return load_parametric_model(write_synthetic_smpl_pickle(
        str(p), n_vertices=120))


def _graph_setup(cell="a3gc"):
    nira = load_adjacency_template()

    def g(ui, uo, h, rot):
        return PoseNetConfig(net=N.GraphNetConfig(
            cell=cell, units_in=ui, units_out=uo, units_hidden=h),
            rotsize=rot)

    cfg = CascadeConfig(stage1=g(12, 3, 8, 3), stage2=g(15, 3, 8, 3),
                        stage3=g(15, 9, 8, 9))
    params3 = tuple(init_pose_net(jax.random.PRNGKey(i), c, nira)
                    for i, c in enumerate((cfg.stage1, cfg.stage2,
                                           cfg.stage3)))
    return cfg, params3


def _flat_setup():
    def d(ni, no, h, rot):
        return PoseNetConfig(net=N.DIPConfig(
            n_input=ni, n_output=no, n_hidden=h), rotsize=rot)

    cfg = CascadeConfig(stage1=d(72, 15, 16, 3), stage2=d(87, 69, 16, 3),
                        stage3=d(141, 135, 16, 9))
    params3 = tuple(init_pose_net(jax.random.PRNGKey(i), c)
                    for i, c in enumerate((cfg.stage1, cfg.stage2,
                                           cfg.stage3)))
    return cfg, params3


def _roundtrip(tmp_path, params3, cfg, model, window, streams, **kw):
    from a3gc_tpu.export import (export_streaming_cascade, load_exported,
                                 save_exported)
    exp_step, exp_init, manifest = export_streaming_cascade(
        params3, cfg, model, window=window, streams=streams, **kw)
    d = save_exported(str(tmp_path / "artifact"), exp_step, exp_init,
                      manifest)
    return load_exported(d)


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=30)
    conn.request(method, path,
                 body=None if body is None else json.dumps(body),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def _dip_setup():
    cfg = PoseNetConfig(net=N.DIPConfig(n_input=60, n_output=15 * 9,
                                        n_hidden=16), rotsize=9)
    params = init_pose_net(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(11)
    stats = {
        "ori_mean_channel": rng.randn(54).astype(np.float32) * 0.1,
        "ori_std_channel": 1.0 + rng.rand(54).astype(np.float32),
        "acc_mean_channel": rng.randn(18).astype(np.float32) * 0.1,
        "acc_std_channel": 1.0 + rng.rand(18).astype(np.float32),
    }
    return cfg, params, stats


class TestDipExport:
    """Single-net dip AOT deployment (VERDICT r4 #1): the exported dip
    online program (trim -> normalize -> net -> IK, ref:
    net_aagc.py:1022-1031, evaluate_dip.py:88-91) must reproduce the
    live DipStreamingSession through the identical artifact stack —
    plain windowing, buffered (K, P) emission, flush, and HTTP serving."""

    def test_dip_artifact_matches_live_session(self, model, tmp_path):
        from a3gc_tpu.eval.streaming import DipStreamingSession
        from a3gc_tpu.export import (export_streaming_dip, load_exported,
                                     save_exported)

        cfg, params, stats = _dip_setup()
        W, S = 8, 2
        exp_step, exp_init, manifest = export_streaming_dip(
            params, cfg, model, window=W, streams=S, stats=stats)
        d = save_exported(str(tmp_path / "dip_art"), exp_step, exp_init,
                          manifest)
        art = load_exported(d)
        sess = DipStreamingSession(params, cfg, model, window=W,
                                   stats=stats, streams=S)
        rng = np.random.RandomState(5)
        states = art.zero_states()
        for _ in range(3):          # carried state threads across windows
            ori = rng.randn(S, W, 54).astype(np.float32)
            acc = rng.randn(S, W, 18).astype(np.float32)
            want = sess.step(ori, acc)
            pose, states = art.step(ori, acc, states)
            np.testing.assert_allclose(np.asarray(pose), want, atol=2e-5)
        m = json.load(open(tmp_path / "dip_art" / "manifest.json"))
        assert m["family"] == "dip" and m["normalized"]
        assert m["window"] == W and m["streams"] == S

    def test_dip_export_requires_stats(self, model):
        from a3gc_tpu.export import export_streaming_dip

        cfg, params, _ = _dip_setup()
        with pytest.raises(ValueError, match="stats"):
            export_streaming_dip(params, cfg, model, window=4, streams=1,
                                 stats=None)

    def test_dip_bundle_lookahead_history_matches_live(self, model,
                                                       tmp_path):
        """ArtifactLookaheadSession over a dip bundle == the live
        buffered DipStreamingSession: warmup Nones, per-window
        emissions, and the flushed tail."""
        from a3gc_tpu.eval.streaming import DipStreamingSession
        from a3gc_tpu.export import (ArtifactLookaheadSession,
                                     ExportedBundle, export_bundle,
                                     lookahead_geometries)

        cfg, params, stats = _dip_setup()
        W, K, P = 5, 1, 1
        d = export_bundle(str(tmp_path / "dip_bundle"), params, cfg,
                          model, lookahead_geometries([1], W, K, P),
                          stats=stats)
        art = ArtifactLookaheadSession(ExportedBundle(d), lookahead=K,
                                       history=P)
        live = DipStreamingSession(params, cfg, model, window=W,
                                   stats=stats, lookahead=K, history=P)
        rng = np.random.RandomState(6)
        n_windows = K + P + 3       # past warmup, into steady state
        for i in range(n_windows):
            ori = rng.randn(W, 54).astype(np.float32)
            acc = rng.randn(W, 18).astype(np.float32)
            want = live.step(ori, acc)
            got = art.step(ori, acc)
            if want is None:
                assert got is None, f"window {i}: warmup mismatch"
            else:
                np.testing.assert_allclose(got, want, atol=2e-5,
                                           err_msg=f"window {i}")
        want_tail = live.flush()
        got_tail = art.flush()
        assert (want_tail is None) == (got_tail is None)
        if want_tail is not None:
            np.testing.assert_allclose(got_tail, want_tail, atol=2e-5)

    def test_dip_http_server_serves_from_artifact(self, model, tmp_path):
        """`serve --artifact` for the dip family: the HTTP server over
        an ArtifactSession matches the live dip session (the recommended
        deployment config — artifact serving — now reaches dip)."""
        from a3gc_tpu.eval.streaming import DipStreamingSession
        from a3gc_tpu.export import (ArtifactSession,
                                     export_streaming_dip, load_exported,
                                     save_exported)
        from a3gc_tpu.serve import PoseServer

        cfg, params, stats = _dip_setup()
        W, S = 5, 2
        exp_step, exp_init, manifest = export_streaming_dip(
            params, cfg, model, window=W, streams=S, stats=stats)
        d = save_exported(str(tmp_path / "dip_srv"), exp_step, exp_init,
                          manifest)
        srv = PoseServer(None, None, None, port=0,
                         session=ArtifactSession(load_exported(d)))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            rng = np.random.RandomState(9)
            conn_poses = []
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            oris = rng.randn(2, W, 54).astype(np.float32)
            accs = rng.randn(2, W, 18).astype(np.float32)
            for i in range(2):
                st, out = _request(addr, "POST", "/v1/step", {
                    "slot": slot, "ori": oris[i].tolist(),
                    "acc": accs[i].tolist()})
                assert st == 200, out
                conn_poses.append(np.asarray(out["pose"], np.float32))
            live = DipStreamingSession(params, cfg, model, window=W,
                                       stats=stats)
            for i in range(2):
                np.testing.assert_allclose(conn_poses[i],
                                           live.step(oris[i], accs[i]),
                                           atol=2e-5)
        finally:
            srv.shutdown()

    def test_cli_export_dip(self, model, tmp_path, monkeypatch):
        """`cli export --model dip` writes a loadable dip artifact (the
        cli.py:950 bare-assert path, now real — VERDICT r4 #1/weak #2)."""
        import pickle

        from a3gc_tpu.cli import main
        from a3gc_tpu.export import load_exported
        from a3gc_tpu.smpl import write_synthetic_smpl_pickle

        cfg, params, stats = _dip_setup()
        smpl = write_synthetic_smpl_pickle(str(tmp_path / "s.pkl"),
                                           n_vertices=120)
        # stats file in the data-root layout _load_stats discovers
        stats_dir = tmp_path / "stats"
        stats_dir.mkdir()
        np.savez(stats_dir / "all_train_stats.npz", **stats)
        out = tmp_path / "dip_cli_art"
        main(["export", "--model", "dip", "--output", str(out),
              "--window", "4", "--smpl", smpl, "--norm",
              "--data_root", str(tmp_path), "--hu1", "16"])
        art = load_exported(str(out))
        assert art.manifest["family"] == "dip"
        pose, _ = art.step(np.zeros((1, 4, 54), np.float32),
                           np.zeros((1, 4, 18), np.float32),
                           art.zero_states())
        assert np.asarray(pose).shape == (1, 4, 24, 3, 3)


class TestExportedCascade:
    @pytest.mark.parametrize("cell", ["a3gc", "ggru"])
    def test_graph_artifact_matches_live_session(self, model, tmp_path,
                                                 cell):
        # ggru exercises the single-array (GRU) state pytree; a3gc the
        # (h, c) tuple layout
        from a3gc_tpu.eval.streaming import StreamingCascade
        cfg, params3 = _graph_setup(cell)
        W, S = 8, 2
        art = _roundtrip(tmp_path, params3, cfg, model, W, S)
        sess = StreamingCascade(params3, cfg, model, window=W, streams=S)

        rng = np.random.RandomState(0)
        states = art.zero_states()
        for _ in range(3):           # state must thread across windows
            ori = rng.randn(S, W, 54).astype(np.float32)
            acc = rng.randn(S, W, 18).astype(np.float32)
            want = sess.step(ori, acc)
            pose, states = art.step(ori, acc, states)
            np.testing.assert_allclose(np.asarray(pose), want, atol=2e-5)

        m = json.load(open(tmp_path / "artifact" / "manifest.json"))
        assert m["family"] == cell
        assert m["window"] == W and m["streams"] == S
        assert m["backend"] == "xla" and "cpu" in m["platforms"]
        assert os.path.getsize(tmp_path / "artifact" / "step.jaxexport") > 0

    def test_flat_tp_artifact_matches_live_session(self, model, tmp_path):
        from a3gc_tpu.eval.streaming import StreamingCascade
        cfg, params3 = _flat_setup()
        W = 8
        art = _roundtrip(tmp_path, params3, cfg, model, W, 1)
        sess = StreamingCascade(params3, cfg, model, window=W)
        rng = np.random.RandomState(1)
        states = art.zero_states()
        for _ in range(2):
            ori = rng.randn(1, W, 54).astype(np.float32)
            acc = rng.randn(1, W, 18).astype(np.float32)
            want = sess.step(ori[0], acc[0])
            pose, states = art.step(ori, acc, states)
            np.testing.assert_allclose(np.asarray(pose)[0], want, atol=2e-5)
        assert art.manifest["family"] == "tp"

    def test_idle_slot_state_untouched(self, model, tmp_path):
        cfg, params3 = _graph_setup()
        W, S = 6, 2
        art = _roundtrip(tmp_path, params3, cfg, model, W, S)
        rng = np.random.RandomState(2)
        states = art.zero_states()
        ori = rng.randn(S, W, 54).astype(np.float32)
        acc = rng.randn(S, W, 18).astype(np.float32)
        _, states = art.step(ori, acc, states)
        before = jax.tree_util.tree_map(np.asarray, states)
        _, after = art.step(ori, acc, states, active=[1.0, 0.0])
        # slot 1 was idle: every state leaf's slice 1 is bit-unchanged
        for b, a in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(np.asarray(a)[:, 1], b[:, 1])
            assert not np.allclose(np.asarray(a)[:, 0], b[:, 0])

    def test_baked_in_normalization(self, model, tmp_path):
        from a3gc_tpu.eval.streaming import StreamingCascade
        cfg, params3 = _graph_setup()
        W = 5
        rng = np.random.RandomState(3)
        stats = {
            "ori_mean_channel": rng.randn(54).astype(np.float32) * 0.1,
            "ori_std_channel": 1.0 + rng.rand(54).astype(np.float32),
            "acc_mean_channel": rng.randn(18).astype(np.float32) * 0.1,
            "acc_std_channel": 1.0 + rng.rand(18).astype(np.float32),
        }
        art = _roundtrip(tmp_path, params3, cfg, model, W, 1,
                         stats=stats, normalize=True)
        assert art.manifest["normalized"]
        sess = StreamingCascade(params3, cfg, model, window=W, stats=stats,
                                normalize=True)
        ori = rng.randn(1, W, 54).astype(np.float32)
        acc = rng.randn(1, W, 18).astype(np.float32)
        want = sess.step(ori[0], acc[0])
        pose, _ = art.step(ori, acc, art.zero_states())
        np.testing.assert_allclose(np.asarray(pose)[0], want, atol=2e-5)

    def test_corrupted_artifact_is_refused(self, model, tmp_path):
        cfg, params3 = _graph_setup()
        _roundtrip(tmp_path, params3, cfg, model, 4, 1)
        p = tmp_path / "artifact" / "step.jaxexport"
        blob = bytearray(p.read_bytes())
        blob[len(blob) // 2] ^= 0xFF               # flip one byte
        p.write_bytes(bytes(blob))
        from a3gc_tpu.export import load_exported
        with pytest.raises(ValueError, match="integrity"):
            load_exported(str(tmp_path / "artifact"))

    def test_pallas_backend_exports_tpu_only_artifact(self, model, tmp_path):
        # Mosaic lowering is cross-platform: a CPU process can BUILD the
        # tpu-only artifact (executing it needs a TPU). The round trip
        # must preserve the platform restriction.
        cfg, params3 = _graph_setup()
        art = _roundtrip(tmp_path, params3, cfg, model, 4, 1,
                         backend="pallas")
        assert art.manifest["backend"] == "pallas"
        assert art.manifest["platforms"] == ["tpu"]
        # the artifact must carry REAL Mosaic kernels even when exported
        # from a CPU process (interpret mode would silently bake plain
        # XLA ops instead): the serialized module contains the custom call
        raw = open(tmp_path / "artifact" / "step.jaxexport", "rb").read()
        assert b"tpu_custom_call" in raw
        with pytest.raises(Exception):    # cpu execution must be refused
            art.step(np.zeros((1, 4, 54), np.float32),
                     np.zeros((1, 4, 18), np.float32), art.zero_states())

    def test_http_server_serves_from_artifact(self, model, tmp_path):
        # cli serve --artifact: the dynamic-batching server runs straight
        # off the deployment artifact, matching a live session exactly
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.export import ArtifactSession
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = _graph_setup()
        W, S = 6, 2
        art = _roundtrip(tmp_path, params3, cfg, model, W, S)
        srv = PoseServer(None, None, None, port=0,
                         session=ArtifactSession(art))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            rng = np.random.RandomState(7)
            ori = rng.randn(2, W, 54).astype(np.float32)
            acc = rng.randn(2, W, 18).astype(np.float32)

            def req(method, path, body=None):
                conn = http.client.HTTPConnection(*addr, timeout=30)
                conn.request(method, path,
                             body=None if body is None else json.dumps(body),
                             headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                out = json.loads(resp.read())
                conn.close()
                return resp.status, out

            st, sess = req("POST", "/v1/session")
            assert st == 200, sess
            slot = sess["slot"]
            assert sess["window"] == W
            poses = []
            for w in range(2):
                st, out = req("POST", "/v1/step", {
                    "slot": slot, "ori": ori[w].tolist(),
                    "acc": acc[w].tolist()})
                assert st == 200, out
                poses.append(np.asarray(out["pose"], np.float32))
            st, _ = req("DELETE", f"/v1/session/{slot}")
            assert st == 200

            ref = StreamingCascade(params3, cfg, model, window=W)
            expect = [ref.step(ori[w], acc[w]) for w in range(2)]
            np.testing.assert_allclose(np.concatenate(poses),
                                       np.concatenate(expect), atol=3e-5)
        finally:
            srv.shutdown()

    def test_cli_stream_from_artifact(self, model, tmp_path, monkeypatch):
        # cli stream --artifact: same outputs as streaming with the live
        # checkpoint-loaded session
        from scipy.spatial.transform import Rotation
        from a3gc_tpu.cli import main
        from a3gc_tpu.eval.streaming import StreamingCascade

        cfg, params3 = _graph_setup()
        W = 10
        _roundtrip(tmp_path, params3, cfg, model, W, 1)

        rng = np.random.RandomState(5)
        T = 20
        ori = Rotation.random(T * 6, random_state=5).as_matrix().reshape(
            T, 54).astype(np.float32)
        acc = rng.normal(scale=0.5, size=(T, 18)).astype(np.float32)
        np.savez(tmp_path / "test.npz", seq0_ori=ori, seq0_acc=acc,
                 seq0_pose=np.tile(np.eye(3, dtype=np.float32),
                                   (T, 15, 1, 1)).reshape(T, 135))
        monkeypatch.chdir(tmp_path)
        main(["stream", "--input", str(tmp_path / "test.npz"),
              "--artifact", str(tmp_path / "artifact"),
              "--output", str(tmp_path / "poses.npz")])

        live = StreamingCascade(params3, cfg, model, window=W)
        expect = np.concatenate([live.step(ori[t:t + W], acc[t:t + W])
                                 for t in range(0, T, W)])
        with np.load(tmp_path / "poses.npz") as z:
            np.testing.assert_allclose(z["pose_000"], expect, atol=3e-5)

    def test_rotsize3_rejected_with_clear_error(self, model):
        # positions have no IK path; the builder must say so instead of
        # failing with a trace-time scatter shape mismatch
        from a3gc_tpu.eval.streaming import make_window_step
        nira = load_adjacency_template()

        def g(ui, uo, h, rot):
            return PoseNetConfig(net=N.GraphNetConfig(
                cell="a3gc", units_in=ui, units_out=uo, units_hidden=h),
                rotsize=rot)

        cfg = CascadeConfig(stage1=g(12, 3, 8, 3), stage2=g(15, 3, 8, 3),
                            stage3=g(15, 3, 8, 3))
        with pytest.raises(AssertionError, match="rotsize"):
            make_window_step(cfg, model)

    def test_cli_export_writes_artifact(self, tmp_path, monkeypatch):
        from a3gc_tpu.cli import main
        out = tmp_path / "cli_art"
        monkeypatch.chdir(tmp_path)
        main(["export", "--model", "a3gc", "--hu1", "8", "--hu2", "8",
              "--hu3", "8", "--window", "4", "--output", str(out)])
        assert (out / "manifest.json").exists()
        assert (out / "step.jaxexport").exists()
        assert (out / "init.jaxexport").exists()


class TestBundle:
    def test_bundle_serves_multiple_geometries(self, model, tmp_path):
        """ONE bundle directory covers several (streams, window)
        geometries; each selected sub-artifact matches a live session of
        that geometry."""
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.export import export_bundle, load_exported

        cfg, params3 = _graph_setup()
        d = export_bundle(str(tmp_path / "bundle"), params3, cfg, model,
                          geometries=[(1, 4), (2, 4), (1, 6)])
        rng = np.random.RandomState(3)
        for S, W in [(1, 4), (2, 4), (1, 6)]:
            art = load_exported(d, streams=S, window=W)
            assert (art.streams, art.window) == (S, W)
            sess = StreamingCascade(params3, cfg, model, window=W,
                                    streams=S)
            states = art.zero_states()
            ori = rng.randn(S, W, 54).astype(np.float32)
            acc = rng.randn(S, W, 18).astype(np.float32)
            pose, states = art.step(ori, acc, states)
            want = sess.step(ori, acc)
            np.testing.assert_allclose(
                np.asarray(pose).reshape(want.shape), want, atol=2e-5)

    @pytest.mark.slow
    def test_artifact_lookahead_matches_live_session(self, model,
                                                     tmp_path):
        """ArtifactLookaheadSession over a --lookahead bundle ==
        StreamingCascade(lookahead=K): warmup, emissions + emitted
        masks, active-slot masking, per-slot reset re-warm, and the
        grouped flush (distinct fill counts across slots)."""
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.export import (ArtifactLookaheadSession,
                                     ExportedBundle, export_bundle,
                                     lookahead_geometries)

        cfg, params3 = _graph_setup()
        S, W, K, n = 2, 4, 2, 5
        d = export_bundle(str(tmp_path / "la_bundle"), params3, cfg,
                          model,
                          geometries=lookahead_geometries([S], W, K))
        art = ArtifactLookaheadSession(ExportedBundle(d), streams=S,
                                       lookahead=K)
        live = StreamingCascade(params3, cfg, model, window=W, streams=S,
                                lookahead=K)

        rng = np.random.RandomState(11)
        emitted_slots = set()
        for w in range(n):
            ori = rng.randn(S, W, 54).astype(np.float32)
            acc = rng.randn(S, W, 18).astype(np.float32)
            active = None
            if w == 2:
                active = np.array([1.0, 0.0], np.float32)  # slot 1 idles
            if w == 4:
                art.reset(stream=1)     # slot 1 re-warms from empty
                live.reset(stream=1)
            pa, ea = art.step(ori, acc, active=active)
            pl, el = live.step(ori, acc, active=active)
            np.testing.assert_array_equal(ea, el, err_msg=f"window {w}")
            if el.any():
                emitted_slots |= set(np.flatnonzero(el))
                np.testing.assert_allclose(pa[el], pl[el], atol=2e-5,
                                           err_msg=f"window {w}")
        assert emitted_slots == {0, 1}   # both slots' emissions compared
        # slots hold DIFFERENT fill counts (slot 1 re-warmed on the last
        # window: fills [2, 1]) — exercises the grouped per-fill flush
        # passes and their activity masking of non-group slots
        assert sorted(len(b) for b in art._buffers) == [1, 2]
        ta, tl = art.flush(), live.flush()
        for i in range(S):
            if tl[i] is None:
                assert ta[i] is None, i
            else:
                assert ta[i].shape == tl[i].shape
                np.testing.assert_allclose(ta[i], tl[i], atol=2e-5,
                                           err_msg=f"tail {i}")
        # missing geometry -> actionable error
        d2 = export_bundle(str(tmp_path / "short"), params3, cfg, model,
                           geometries=[(S, W)])
        with pytest.raises(KeyError, match="--lookahead"):
            ArtifactLookaheadSession(ExportedBundle(d2), streams=S,
                                     lookahead=1)

    def test_artifact_history_matches_live_session(self, model, tmp_path):
        """ArtifactLookaheadSession(history=P, lookahead=K) over a
        --history bundle == StreamingCascade(history=P, lookahead=K):
        warmup-fill emission groups, the steady-state capacity group,
        active masking, per-slot reset re-warm, and the grouped flush
        with history context."""
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.export import (ArtifactLookaheadSession,
                                     ExportedBundle, export_bundle,
                                     lookahead_geometries)

        cfg, params3 = _graph_setup()
        S, W, K, P, n = 2, 4, 1, 1, 5
        d = export_bundle(str(tmp_path / "hist_bundle"), params3, cfg,
                          model,
                          geometries=lookahead_geometries([S], W, K, P))
        art = ArtifactLookaheadSession(ExportedBundle(d), streams=S,
                                       lookahead=K, history=P)
        live = StreamingCascade(params3, cfg, model, window=W, streams=S,
                                lookahead=K, history=P)

        rng = np.random.RandomState(13)
        for w in range(n):
            ori = rng.randn(S, W, 54).astype(np.float32)
            acc = rng.randn(S, W, 18).astype(np.float32)
            active = None
            if w == 2:
                active = np.array([1.0, 0.0], np.float32)  # slot 1 idles
            if w == 4:
                art.reset(stream=1)     # slot 1 re-warms from empty
                live.reset(stream=1)
            pa, ea = art.step(ori, acc, active=active)
            pl, el = live.step(ori, acc, active=active)
            np.testing.assert_array_equal(ea, el, err_msg=f"window {w}")
            if el.any():
                np.testing.assert_allclose(pa[el], pl[el], atol=2e-5,
                                           err_msg=f"window {w}")
        # slots at different fills -> grouped flush passes
        assert len({len(b) for b in art._buffers}) == 2
        ta, tl = art.flush(), live.flush()
        for i in range(S):
            if tl[i] is None:
                assert ta[i] is None, i
            else:
                np.testing.assert_allclose(ta[i], tl[i], atol=2e-5,
                                           err_msg=f"tail {i}")
        # history-only needs its own geometries too
        with pytest.raises(KeyError, match="--history"):
            ArtifactLookaheadSession(
                ExportedBundle(export_bundle(
                    str(tmp_path / "short_h"), params3, cfg, model,
                    geometries=[(S, W)])),
                streams=S, lookahead=0, history=1)

    def test_serve_artifact_lookahead(self, model, tmp_path):
        """PoseServer over an ArtifactLookaheadSession: 202 warmup, then
        lagged emissions; POST /v1/flush drains the buffered tail — the
        full lookahead serving stack with no checkpoints or model
        assets."""
        from a3gc_tpu.export import (ArtifactLookaheadSession,
                                     ExportedBundle, export_bundle,
                                     lookahead_geometries)
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = _graph_setup()
        W, K = 4, 1
        d = export_bundle(str(tmp_path / "srv_la"), params3, cfg, model,
                          geometries=lookahead_geometries([1], W, K))
        session = ArtifactLookaheadSession(ExportedBundle(d), lookahead=K)
        srv = PoseServer(None, None, None, port=0, session=session,
                         lookahead=K)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.httpd.server_address
        try:
            def req(method, path, body=None):
                conn = http.client.HTTPConnection(*addr, timeout=30)
                conn.request(method, path,
                             body=None if body is None
                             else json.dumps(body),
                             headers={"Content-Type": "application/json"})
                r = conn.getresponse()
                out = json.loads(r.read())
                conn.close()
                return r.status, out

            rng = np.random.RandomState(5)
            _, sess_info = req("POST", "/v1/session")
            slot = sess_info["slot"]
            body = {"slot": slot,
                    "ori": rng.randn(W, 54).astype(np.float32).tolist(),
                    "acc": rng.randn(W, 18).astype(np.float32).tolist()}
            st, out = req("POST", "/v1/step", body)
            assert st == 202 and out.get("warmup"), out
            st, out = req("POST", "/v1/step", body)
            assert st == 200 and np.isfinite(
                np.asarray(out["pose"])).all()
            st, out = req("POST", "/v1/flush", {"slot": slot})
            assert st == 200 and out["frames"] == K * W, out
        finally:
            srv.shutdown()

    def test_bundle_selection_errors(self, model, tmp_path):
        from a3gc_tpu.export import export_bundle, load_exported

        cfg, params3 = _graph_setup()
        d = export_bundle(str(tmp_path / "b2"), params3, cfg, model,
                          geometries=[(1, 4), (2, 4)])
        # default = first entry
        art = load_exported(d)
        assert (art.streams, art.window) == (1, 4)
        with pytest.raises(KeyError, match="no geometry"):
            load_exported(d, streams=7)

    def test_cli_export_bundle_and_serve_selects(self, tmp_path):
        """`cli export --streams 1 2` writes a bundle; the artifact
        loaders pick a geometry by --streams/--window."""
        from a3gc_tpu.cli import main
        from a3gc_tpu.export import ArtifactSession, load_exported

        out = tmp_path / "cli_bundle"
        main(["export", "--model", "a3gc", "--hu1", "8", "--hu2", "8",
              "--hu3", "8", "--window", "4", "--streams", "1", "2",
              "--output", str(out)])
        assert (out / "bundle.json").exists()
        sess = ArtifactSession(load_exported(str(out), streams=2))
        assert sess.streams == 2 and sess.window == 4
        pose = sess.step(np.zeros((2, 4, 54), np.float32),
                         np.zeros((2, 4, 18), np.float32))
        assert np.isfinite(pose).all()
