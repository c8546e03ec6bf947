"""Dynamic-batching HTTP serving: concurrent clients through one
multi-stream program == independent single-stream sessions, regardless of
how requests coalesce into ticks (per-slot masking keeps idle state
untouched)."""

import http.client
import json
import threading
from concurrent.futures import ThreadPoolExecutor

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


@pytest.fixture(scope="module")
def setup(model):
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
    return cfg, params3


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=30)
    conn.request(method, path,
                 body=None if body is None else json.dumps(body),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


class TestPoseServer:
    def test_concurrent_clients_match_single_sessions(self, setup, model):
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W, n_clients, n_windows = 6, 3, 3
        srv = PoseServer(params3, cfg, model, window=W, streams=4, port=0,
                         max_wait_ms=20.0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        addr = srv.address
        try:
            rng = np.random.default_rng(3)
            ori = Rotation.random(n_clients * n_windows * W * 6,
                                  random_state=4).as_matrix().reshape(
                n_clients, n_windows * W, 54).astype(np.float32)
            acc = rng.normal(scale=0.5,
                             size=(n_clients, n_windows * W, 18)
                             ).astype(np.float32)

            def client(ci):
                st, sess = _request(addr, "POST", "/v1/session")
                assert st == 200, sess
                slot = sess["slot"]
                poses = []
                for w in range(n_windows):
                    sl = slice(w * W, (w + 1) * W)
                    st, out = _request(addr, "POST", "/v1/step", {
                        "slot": slot,
                        "ori": ori[ci, sl].tolist(),
                        "acc": acc[ci, sl].tolist()})
                    assert st == 200, out
                    poses.append(np.asarray(out["pose"], np.float32))
                st, _ = _request(addr, "DELETE", f"/v1/session/{slot}")
                assert st == 200
                return np.concatenate(poses)

            with ThreadPoolExecutor(n_clients) as ex:
                served = list(ex.map(client, range(n_clients)))

            # oracle: independent single-stream sessions
            for ci in range(n_clients):
                ref = StreamingCascade(params3, cfg, model, window=W)
                expect = []
                for w in range(n_windows):
                    sl = slice(w * W, (w + 1) * W)
                    expect.append(ref.step(ori[ci, sl], acc[ci, sl]))
                np.testing.assert_allclose(
                    served[ci], np.concatenate(expect), atol=3e-5,
                    err_msg=f"client {ci}")
        finally:
            srv.shutdown()

    def test_capacity_and_reset(self, setup, model):
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        W = 4
        srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        addr = srv.address
        try:
            st, s0 = _request(addr, "POST", "/v1/session")
            assert st == 200
            st, err = _request(addr, "POST", "/v1/session")
            assert st == 503 and "error" in err      # full

            from scipy.spatial.transform import Rotation
            rng = np.random.default_rng(8)
            ori = Rotation.random(W * 6, random_state=9).as_matrix(
            ).reshape(W, 54).astype(np.float32).tolist()
            acc = rng.normal(scale=0.5, size=(W, 18)).astype(
                np.float32).tolist()
            st, out1 = _request(addr, "POST", "/v1/step",
                                {"slot": s0["slot"], "ori": ori,
                                 "acc": acc})
            assert st == 200
            st, out2 = _request(addr, "POST", "/v1/step",
                                {"slot": s0["slot"], "ori": ori,
                                 "acc": acc})
            # carried state: second window differs from the first
            assert np.abs(np.asarray(out1["pose"])
                          - np.asarray(out2["pose"])).max() > 1e-7

            st, _ = _request(addr, "DELETE", f"/v1/session/{s0['slot']}")
            assert st == 200
            st, s1 = _request(addr, "POST", "/v1/session")
            assert st == 200                          # slot recycled
            st, out3 = _request(addr, "POST", "/v1/step",
                                {"slot": s1["slot"], "ori": ori,
                                 "acc": acc})
            # reset on release: fresh state reproduces window 1 exactly
            np.testing.assert_allclose(np.asarray(out3["pose"]),
                                       np.asarray(out1["pose"]), atol=1e-6)

            st, err = _request(addr, "POST", "/v1/step",
                               {"slot": s1["slot"], "ori": [[1.0]],
                                "acc": acc})
            assert st == 400 and "error" in err       # shape validation
        finally:
            srv.shutdown()


class TestFlushConcurrency:
    @pytest.mark.parametrize("K,P", [
        pytest.param(1, 0, marks=pytest.mark.slow),
        (0, 1),
        pytest.param(1, 1, marks=pytest.mark.slow),
    ])
    def test_random_step_flush_release_interleavings(self, setup, model,
                                                     K, P):
        """Threaded fuzz of the buffered batcher (lookahead, history,
        and composed — the history configs exercise the grouped
        per-fill emission passes under concurrency): clients randomly
        step / flush / release+reacquire their own slots. No response
        may hang, every 200-step returns a [W,24,3,3] pose and every
        200-flush u*W frames (the mailbox cross-wire the guards prevent
        would surface as a shape mismatch), and transient 4xx are only
        the documented races (released slot, request in flight)."""
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        W = 4
        srv = PoseServer(params3, cfg, model, window=W, streams=3, port=0,
                         max_wait_ms=2.0, lookahead=K, history=P)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            def client(ci):
                rng = np.random.default_rng(ci)
                ori = np.tile(np.eye(3, dtype=np.float32).reshape(-1),
                              (W, 6)).reshape(W, 54).tolist()
                acc = np.zeros((W, 18), np.float32).tolist()
                st, sess = _request(addr, "POST", "/v1/session")
                assert st == 200, sess
                slot = sess["slot"]
                ok = 0
                for _ in range(12):
                    op = rng.choice(["step", "step", "step", "flush",
                                     "cycle"])
                    if op == "step":
                        st, out = _request(addr, "POST", "/v1/step",
                                           {"slot": slot, "ori": ori,
                                            "acc": acc})
                        assert st in (200, 202), (st, out)
                        if st == 200:
                            pose = np.asarray(out["pose"], np.float32)
                            assert pose.shape == (W, 24, 3, 3), pose.shape
                            assert np.isfinite(pose).all()
                    elif op == "flush":
                        st, out = _request(addr, "POST", "/v1/flush",
                                           {"slot": slot})
                        assert st == 200, (st, out)
                        assert out["frames"] in (0, K * W), out["frames"]
                        if out["frames"]:
                            tail = np.asarray(out["pose"], np.float32)
                            assert tail.shape == (K * W, 24, 3, 3)
                    else:   # release + reacquire (slot may change)
                        st, _ = _request(addr, "DELETE",
                                         f"/v1/session/{slot}")
                        assert st == 200
                        st, sess = _request(addr, "POST", "/v1/session")
                        assert st == 200, sess
                        slot = sess["slot"]
                    ok += 1
                _request(addr, "DELETE", f"/v1/session/{slot}")
                return ok

            with ThreadPoolExecutor(3) as ex:
                results = list(ex.map(client, range(3)))
            assert results == [12, 12, 12]
            st, stats = _request(addr, "GET", "/v1/stats")
            assert st == 200 and stats["errors"] == 0
        finally:
            srv.shutdown()


class TestBinaryProtocol:
    def test_binary_step_matches_json(self, setup, model):
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W = 5
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        addr = srv.address
        try:
            rng = np.random.default_rng(23)
            ori = Rotation.random(W * 6, random_state=24).as_matrix(
            ).reshape(W, 54).astype(np.float32)
            acc = rng.normal(scale=0.5, size=(W, 18)).astype(np.float32)

            _, s0 = _request(addr, "POST", "/v1/session")
            _, s1 = _request(addr, "POST", "/v1/session")

            # JSON on slot 0
            st, out_j = _request(addr, "POST", "/v1/step", {
                "slot": s0["slot"], "ori": ori.tolist(),
                "acc": acc.tolist()})
            assert st == 200

            # binary on slot 1 (identical input → identical pose: fresh
            # state on both slots)
            body = (np.asarray([s1["slot"]], "<u4").tobytes()
                    + ori.astype("<f4").tobytes()
                    + acc.astype("<f4").tobytes())
            conn = http.client.HTTPConnection(*addr, timeout=30)
            conn.request("POST", "/v1/step", body=body,
                         headers={"Content-Type":
                                  "application/octet-stream"})
            resp = conn.getresponse()
            assert resp.status == 200
            pose_b = np.frombuffer(resp.read(), "<f4").reshape(W, 24, 3, 3)
            conn.close()
            np.testing.assert_allclose(
                pose_b, np.asarray(out_j["pose"], np.float32), atol=1e-6)

            # malformed binary → 400
            conn = http.client.HTTPConnection(*addr, timeout=30)
            conn.request("POST", "/v1/step", body=b"\x00\x01",
                         headers={"Content-Type":
                                  "application/octet-stream"})
            assert conn.getresponse().status == 400
            conn.close()
        finally:
            srv.shutdown()


class TestSeqDedup:
    """At-most-once window application (ADVICE r4): a step tagged with a
    per-slot sequence number that was already applied is answered from
    the cache, NOT re-applied to the carried state — the guard clients
    need to retry safely across an exec-recycle that ate a response."""

    def test_retried_seq_returns_cache_without_restep(self, setup, model):
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W = 5
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            ori = Rotation.random(2 * W * 6, random_state=40).as_matrix(
            ).reshape(2, W, 54).astype(np.float32)
            acc = np.random.default_rng(41).normal(
                scale=0.5, size=(2, W, 18)).astype(np.float32)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]

            st, out0 = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 0, "ori": ori[0].tolist(),
                "acc": acc[0].tolist()})
            assert st == 200
            # retry the SAME seq (garbage payload: it must not be applied)
            st, retry = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 0,
                "ori": np.zeros((W, 54)).tolist(),
                "acc": np.zeros((W, 18)).tolist()})
            assert st == 200
            np.testing.assert_array_equal(
                np.asarray(retry["pose"], np.float32),
                np.asarray(out0["pose"], np.float32))
            # the next window proves the state advanced exactly once
            st, out1 = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 1, "ori": ori[1].tolist(),
                "acc": acc[1].tolist()})
            assert st == 200
            ref = StreamingCascade(params3, cfg, model, window=W)
            w0 = ref.step(ori[0], acc[0])
            w1 = ref.step(ori[1], acc[1])
            np.testing.assert_allclose(
                np.asarray(out0["pose"], np.float32), w0, atol=3e-5)
            np.testing.assert_allclose(
                np.asarray(out1["pose"], np.float32), w1, atol=3e-5)

            # release clears the seq cache: a NEW session reusing the slot
            # with the same seq numbers must not see stale results
            _request(addr, "DELETE", f"/v1/session/{slot}")
            _, info2 = _request(addr, "POST", "/v1/session")
            st, fresh = _request(addr, "POST", "/v1/step", {
                "slot": info2["slot"], "seq": 0, "ori": ori[1].tolist(),
                "acc": acc[1].tolist()})
            assert st == 200
            ref2 = StreamingCascade(params3, cfg, model, window=W)
            np.testing.assert_allclose(
                np.asarray(fresh["pose"], np.float32),
                ref2.step(ori[1], acc[1]), atol=3e-5)
        finally:
            srv.shutdown()

    def test_binary_seq_header(self, setup, model):
        """Binary wire format: uint32 slot + uint32 seq + payload (4
        bytes longer than the untagged form) — retried seq bit-equal."""
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W = 5
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            ori = Rotation.random(W * 6, random_state=42).as_matrix(
            ).reshape(W, 54).astype(np.float32)
            acc = np.random.default_rng(43).normal(
                scale=0.5, size=(W, 18)).astype(np.float32)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]

            def bin_step(payload):
                conn = http.client.HTTPConnection(*addr, timeout=30)
                conn.request("POST", "/v1/step", body=payload,
                             headers={"Content-Type":
                                      "application/octet-stream"})
                resp = conn.getresponse()
                out = resp.read()
                conn.close()
                return resp.status, out

            body = (np.asarray([slot, 7], "<u4").tobytes()
                    + ori.astype("<f4").tobytes()
                    + acc.astype("<f4").tobytes())
            st, out0 = bin_step(body)
            assert st == 200
            st, retry = bin_step(body)
            assert st == 200 and retry == out0
        finally:
            srv.shutdown()


class TestRobustness:
    def test_invalid_slots_rejected_server_survives(self, setup, model):
        """Unacquired/out-of-range slots -> 4xx, and the dispatcher keeps
        serving valid clients afterwards (no one-request DoS)."""
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        W = 4
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        addr = srv.address
        try:
            ori = np.zeros((W, 54), np.float32).tolist()
            acc = np.zeros((W, 18), np.float32).tolist()
            # step on never-acquired, out-of-range, negative slots
            for bad in (0, 999, -2):
                st, err = _request(addr, "POST", "/v1/step",
                                   {"slot": bad, "ori": ori, "acc": acc})
                assert st == 400 and "error" in err, (bad, st, err)
            # delete of invalid slots
            for bad in (1, 999, -2):
                st, err = _request(addr, "DELETE", f"/v1/session/{bad}")
                assert st in (400, 404), (bad, st)

            # server still fully functional
            st, s0 = _request(addr, "POST", "/v1/session")
            assert st == 200
            st, out = _request(addr, "POST", "/v1/step",
                               {"slot": s0["slot"], "ori": ori,
                                "acc": acc})
            assert st == 200 and np.isfinite(
                np.asarray(out["pose"])).all()
            st, _ = _request(addr, "DELETE", f"/v1/session/{s0['slot']}")
            assert st == 200
        finally:
            srv.shutdown()


class TestAcquireUndeliverable:
    def test_failed_acquire_response_returns_slot(self, setup, model):
        """An acquire whose HTTP response cannot be delivered (client
        abandoned the connection — typical for acquires queued in the
        listening backlog across a recycle pause) must NOT leak the
        slot: the client never learned its id, so the handler
        un-acquires it (serve.py /v1/session OSError path)."""
        import io

        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        srv = PoseServer(params3, cfg, model, window=4, streams=2, port=0)
        # httpd.shutdown() blocks unless serve_forever is running
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            handler_cls = srv.httpd.RequestHandlerClass

            class _FailingWfile(io.RawIOBase):
                def writable(self):
                    return True

                def write(self, b):
                    raise BrokenPipeError(32, "client gone")

                def flush(self):
                    pass

            class _FakeSock:
                def __init__(self, raw):
                    self._raw = raw

                def makefile(self, mode, *a, **k):
                    if "r" in mode:
                        return io.BytesIO(self._raw)
                    return _FailingWfile()

                def sendall(self, b):
                    raise BrokenPipeError(32, "client gone")

                def close(self):
                    pass

                def shutdown(self, how):
                    pass

                def setsockopt(self, *a):
                    pass

            free_before = set(srv.batcher.free)
            req = b"POST /v1/session HTTP/1.1\r\nHost: t\r\n\r\n"
            try:
                handler_cls(_FakeSock(req), ("127.0.0.1", 1), srv.httpd)
            except OSError:
                pass  # the broken pipe propagating out of the handler
            assert set(srv.batcher.free) == free_before, (
                "undeliverable acquire leaked a slot")
        finally:
            srv.shutdown()


class TestServerOps:
    def test_stats_and_hot_reload(self, setup, model):
        """GET /v1/stats reports serving counters; POST /v1/reload swaps
        checkpoints into live sessions (carried state persists, outputs
        switch to the new params)."""
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        params3_b = tuple(init_pose_net(jax.random.PRNGKey(100 + i), c, 
                                        load_adjacency_template())
                          for i, c in enumerate((cfg.stage1, cfg.stage2,
                                                 cfg.stage3)))
        W = 4
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0,
                         reload_fn=lambda: params3_b)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            ori = Rotation.random(W * 6, random_state=11).as_matrix(
                ).reshape(W, 54).astype(np.float32).tolist()
            acc = np.zeros((W, 18), np.float32).tolist()

            st, sess = _request(addr, "POST", "/v1/session")
            slot = sess["slot"]
            st, out_a = _request(addr, "POST", "/v1/step",
                                 {"slot": slot, "ori": ori, "acc": acc})
            assert st == 200

            st, stats = _request(addr, "GET", "/v1/stats")
            assert st == 200
            assert stats["ticks"] >= 1 and stats["requests"] >= 1
            assert stats["active_sessions"] == 1
            assert stats["errors"] == 0
            assert stats["tick_ms_mean"] > 0

            st, r = _request(addr, "POST", "/v1/reload")
            assert st == 200 and r["reloaded"]

            # session survives the swap; same input now flows through the
            # NEW params (oracle: fresh single session with params B fed
            # the same two windows)
            st, out_b = _request(addr, "POST", "/v1/step",
                                 {"slot": slot, "ori": ori, "acc": acc})
            assert st == 200
            from a3gc_tpu.eval.streaming import StreamingCascade
            ref_a = StreamingCascade(params3, cfg, model, window=W)
            ref_b = StreamingCascade(params3_b, cfg, model, window=W)
            w1 = ref_a.step(np.asarray(ori, np.float32),
                            np.asarray(acc, np.float32))
            np.testing.assert_allclose(np.asarray(out_a["pose"]), w1,
                                       atol=3e-5)
            # oracle for window 2: params B with the state params A left
            ref_b._states = ref_a._states
            w2 = ref_b.step(np.asarray(ori, np.float32),
                            np.asarray(acc, np.float32))
            np.testing.assert_allclose(np.asarray(out_b["pose"]), w2,
                                       atol=3e-5)
        finally:
            srv.shutdown()

    def test_reload_without_source_is_501(self, setup, model):
        from a3gc_tpu.serve import PoseServer
        cfg, params3 = setup
        srv = PoseServer(params3, cfg, model, window=4, streams=1, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            st, out = _request(srv.address, "POST", "/v1/reload")
            assert st == 501 and "reload source" in out["error"]
        finally:
            srv.shutdown()

    def test_reload_under_concurrent_load(self, setup, model):
        """Hot-reloads racing client steps: every response is a valid pose
        from EITHER params version (the swap is tick-atomic), never an
        error or a mix."""
        from a3gc_tpu.serve import PoseServer
        cfg, params3 = setup
        nira = load_adjacency_template()
        params3_b = tuple(init_pose_net(jax.random.PRNGKey(50 + i), c, nira)
                          for i, c in enumerate((cfg.stage1, cfg.stage2,
                                                 cfg.stage3)))
        W = 4
        flip = {"v": 0}

        def reload_fn():
            flip["v"] ^= 1
            return params3_b if flip["v"] else params3

        srv = PoseServer(params3, cfg, model, window=W, streams=3, port=0,
                         max_wait_ms=2.0, reload_fn=reload_fn)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            ori = np.tile(np.eye(3, dtype=np.float32).reshape(-1),
                          (W, 6)).reshape(W, 54).tolist()
            acc = np.zeros((W, 18), np.float32).tolist()

            def client(_):
                st, sess = _request(addr, "POST", "/v1/session")
                assert st == 200, sess
                ok = 0
                for _ in range(6):
                    st, out = _request(addr, "POST", "/v1/step",
                                       {"slot": sess["slot"], "ori": ori,
                                        "acc": acc})
                    assert st == 200, out
                    pose = np.asarray(out["pose"], np.float32)
                    assert pose.shape == (W, 24, 3, 3)
                    assert np.isfinite(pose).all()
                    ok += 1
                _request(addr, "DELETE", f"/v1/session/{sess['slot']}")
                return ok

            def reloader():
                for _ in range(8):
                    st, r = _request(addr, "POST", "/v1/reload")
                    assert st == 200 and r["reloaded"], r
                return True

            with ThreadPoolExecutor(4) as ex:
                futs = [ex.submit(client, i) for i in range(3)]
                futs.append(ex.submit(reloader))
                results = [f.result() for f in futs]
            assert results == [6, 6, 6, True]
            st, stats = _request(addr, "GET", "/v1/stats")
            assert stats["errors"] == 0 and stats["requests"] == 18
        finally:
            srv.shutdown()


class TestLookaheadServing:
    def test_lookahead_server_warmup_then_matches_session(self, setup,
                                                          model):
        """PoseServer(lookahead=K): the first K steps answer 202
        warmup; every later step returns the lagged emission equal to an
        independent lookahead session fed the same windows."""
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W, K, n_windows = 6, 1, 4
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0,
                         max_wait_ms=5.0, lookahead=K)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        addr = srv.address
        try:
            rng = np.random.default_rng(5)
            ori = Rotation.random(n_windows * W * 6, random_state=6
                                  ).as_matrix().reshape(
                n_windows * W, 54).astype(np.float32)
            acc = rng.normal(scale=0.5, size=(n_windows * W, 18)
                             ).astype(np.float32)

            ref = StreamingCascade(params3, cfg, model, window=W,
                                   lookahead=K)
            _, slot_info = _request(addr, "POST", "/v1/session")
            slot = slot_info["slot"]
            got, want = [], []
            for w in range(n_windows):
                sl = slice(w * W, (w + 1) * W)
                status, out = _request(addr, "POST", "/v1/step", {
                    "slot": slot, "ori": ori[sl].tolist(),
                    "acc": acc[sl].tolist()})
                expect = ref.step(ori[sl], acc[sl])
                if w < K:
                    assert status == 202 and out.get("warmup"), out
                    assert out["lag"] == K
                    assert expect is None
                else:
                    assert status == 200, out
                    got.append(np.asarray(out["pose"], np.float32))
                    want.append(expect)
            for g, w_ in zip(got, want):
                np.testing.assert_allclose(g, w_, atol=2e-5)
            _request(addr, "DELETE", f"/v1/session/{slot}")
            # a fresh session on the released slot re-warms from empty
            _, info2 = _request(addr, "POST", "/v1/session")
            status, out = _request(addr, "POST", "/v1/step", {
                "slot": info2["slot"], "ori": ori[:W].tolist(),
                "acc": acc[:W].tolist()})
            assert status == 202 and out.get("warmup")
            st = _request(addr, "GET", "/v1/stats")[1]
            assert st["lookahead"] == K
        finally:
            srv.shutdown()

    def test_history_server_zero_latency_matches_session(self, setup,
                                                         model):
        """PoseServer(history=P): NO warmup — every step answers 200
        immediately with the history-context emission equal to an
        independent history session; /v1/flush returns 0 frames
        (nothing un-emitted) but still clears the slot's buffer and
        advances its state, so the slot keeps serving in sync."""
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W, P, n_windows = 6, 1, 3
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0,
                         max_wait_ms=2.0, history=P)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            rng = np.random.default_rng(23)
            ori = Rotation.random((n_windows + 1) * W * 6, random_state=24
                                  ).as_matrix().reshape(
                (n_windows + 1) * W, 54).astype(np.float32)
            acc = rng.normal(scale=0.5, size=((n_windows + 1) * W, 18)
                             ).astype(np.float32)

            ref = StreamingCascade(params3, cfg, model, window=W,
                                   history=P)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            for w in range(n_windows):
                sl = slice(w * W, (w + 1) * W)
                status, out = _request(addr, "POST", "/v1/step", {
                    "slot": slot, "ori": ori[sl].tolist(),
                    "acc": acc[sl].tolist()})
                expect = ref.step(ori[sl], acc[sl])
                assert status == 200, out           # zero-latency mode
                np.testing.assert_allclose(
                    np.asarray(out["pose"], np.float32), expect,
                    atol=2e-5, err_msg=f"window {w}")

            st, out = _request(addr, "POST", "/v1/flush", {"slot": slot})
            assert st == 200 and out["frames"] == 0, out
            assert ref.flush() is None
            # slot stays live and in sync after the no-tail flush
            sl = slice(n_windows * W, (n_windows + 1) * W)
            st, out = _request(addr, "POST", "/v1/step", {
                "slot": slot, "ori": ori[sl].tolist(),
                "acc": acc[sl].tolist()})
            expect = ref.step(ori[sl], acc[sl])
            assert st == 200, out
            np.testing.assert_allclose(
                np.asarray(out["pose"], np.float32), expect, atol=2e-5)
            assert _request(addr, "GET", "/v1/stats")[1]["history"] == P
        finally:
            srv.shutdown()

    @pytest.mark.slow
    def test_flush_drains_buffered_tail(self, setup, model):
        """POST /v1/flush returns the K buffered windows as one chunk ==
        an independent session's flush(); the slot then re-warms from
        empty. A plain-windowed server answers flush with 0 frames."""
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W, K, n_windows = 5, 2, 4
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0,
                         max_wait_ms=2.0, lookahead=K)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            rng = np.random.default_rng(17)
            ori = Rotation.random(n_windows * W * 6, random_state=18
                                  ).as_matrix().reshape(
                n_windows * W, 54).astype(np.float32)
            acc = rng.normal(scale=0.5, size=(n_windows * W, 18)
                             ).astype(np.float32)

            ref = StreamingCascade(params3, cfg, model, window=W,
                                   lookahead=K)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            for w in range(n_windows):
                sl = slice(w * W, (w + 1) * W)
                _request(addr, "POST", "/v1/step", {
                    "slot": slot, "ori": ori[sl].tolist(),
                    "acc": acc[sl].tolist()})
                ref.step(ori[sl], acc[sl])

            st, out = _request(addr, "POST", "/v1/flush", {"slot": slot})
            assert st == 200 and out["frames"] == K * W, out
            expect = ref.flush()
            np.testing.assert_allclose(
                np.asarray(out["pose"], np.float32), expect, atol=2e-5)

            # drained slot stays active and re-warms from empty
            st, out = _request(addr, "POST", "/v1/step", {
                "slot": slot, "ori": ori[:W].tolist(),
                "acc": acc[:W].tolist()})
            assert st == 202 and out.get("warmup"), out
            # second flush via the BINARY protocol: only 1 window
            # buffered -> f*W frames of raw f32 + X-Frames header
            conn = http.client.HTTPConnection(*addr, timeout=30)
            conn.request("POST", "/v1/flush",
                         body=np.asarray([slot], "<u4").tobytes(),
                         headers={"Content-Type":
                                  "application/octet-stream"})
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.getheader("X-Frames") == str(W)
            tail_b = np.frombuffer(resp.read(), "<f4")
            conn.close()
            assert tail_b.shape[0] == W * 24 * 3 * 3
            st, _ = _request(addr, "DELETE", f"/v1/session/{slot}")
            assert st == 200

            # invalid slot -> 400
            st, err = _request(addr, "POST", "/v1/flush", {"slot": 999})
            assert st == 400 and "error" in err
        finally:
            srv.shutdown()

        plain = PoseServer(params3, cfg, model, window=W, streams=1,
                           port=0)
        threading.Thread(target=plain.serve_forever, daemon=True).start()
        try:
            _, info = _request(plain.address, "POST", "/v1/session")
            st, out = _request(plain.address, "POST", "/v1/flush",
                               {"slot": info["slot"]})
            assert st == 200 and out["frames"] == 0 and out["pose"] == []
            # invalid slots are rejected on plain servers too
            st, err = _request(plain.address, "POST", "/v1/flush",
                               {"slot": 999})
            assert st == 400 and "error" in err
        finally:
            plain.shutdown()


class TestDipServing:
    """serve --model dip: the single-net online mode (ref:
    net_aagc.py:1022-1031) behind the SAME HTTP batcher as the cascade —
    concurrent clients match independent DipStreamingSessions, and the
    buffered (K) variant warms up then matches too."""

    @pytest.fixture(scope="class")
    def dip(self):
        cfg = PoseNetConfig(net=N.DIPConfig(n_input=60, n_output=15 * 9,
                                            n_hidden=16), rotsize=9)
        params = init_pose_net(jax.random.PRNGKey(7), cfg)
        stats = {
            "ori_mean_channel": np.zeros(54, np.float32),
            "ori_std_channel": np.ones(54, np.float32),
            "acc_mean_channel": np.zeros(18, np.float32),
            "acc_std_channel": np.ones(18, np.float32),
        }
        return cfg, params, stats

    def test_concurrent_clients_match_single_sessions(self, dip, model):
        from scipy.spatial.transform import Rotation

        from a3gc_tpu.eval.streaming import DipStreamingSession
        from a3gc_tpu.serve import PoseServer

        cfg, params, stats = dip
        W, n_clients, n_windows = 6, 2, 3
        session = DipStreamingSession(params, cfg, model, window=W,
                                      stats=stats, streams=3)
        srv = PoseServer(None, None, None, port=0, max_wait_ms=20.0,
                         session=session)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            rng = np.random.default_rng(8)
            ori = Rotation.random(n_clients * n_windows * W * 6,
                                  random_state=9).as_matrix().reshape(
                n_clients, n_windows * W, 54).astype(np.float32)
            acc = rng.normal(scale=0.5,
                             size=(n_clients, n_windows * W, 18)
                             ).astype(np.float32)

            def client(ci):
                st, sess = _request(addr, "POST", "/v1/session")
                assert st == 200, sess
                slot = sess["slot"]
                poses = []
                for w in range(n_windows):
                    sl = slice(w * W, (w + 1) * W)
                    st, out = _request(addr, "POST", "/v1/step", {
                        "slot": slot,
                        "ori": ori[ci, sl].tolist(),
                        "acc": acc[ci, sl].tolist()})
                    assert st == 200, out
                    poses.append(np.asarray(out["pose"], np.float32))
                st, _ = _request(addr, "DELETE", f"/v1/session/{slot}")
                assert st == 200
                return np.concatenate(poses)

            with ThreadPoolExecutor(n_clients) as ex:
                served = list(ex.map(client, range(n_clients)))

            for ci in range(n_clients):
                ref = DipStreamingSession(params, cfg, model, window=W,
                                          stats=stats)
                expect = []
                for w in range(n_windows):
                    sl = slice(w * W, (w + 1) * W)
                    expect.append(ref.step(ori[ci, sl], acc[ci, sl]))
                np.testing.assert_allclose(
                    served[ci], np.concatenate(expect), atol=3e-5,
                    err_msg=f"client {ci}")
        finally:
            srv.shutdown()

    def test_buffered_dip_server_warmup_then_matches(self, dip, model):
        from scipy.spatial.transform import Rotation

        from a3gc_tpu.eval.streaming import DipStreamingSession
        from a3gc_tpu.serve import PoseServer

        cfg, params, stats = dip
        W, K, P, n_windows = 6, 1, 1, 4
        session = DipStreamingSession(params, cfg, model, window=W,
                                      stats=stats, streams=2,
                                      lookahead=K, history=P)
        srv = PoseServer(None, None, None, port=0, max_wait_ms=5.0,
                         session=session, lookahead=K, history=P)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            ori = Rotation.random(n_windows * W * 6, random_state=10
                                  ).as_matrix().reshape(
                n_windows * W, 54).astype(np.float32)
            acc = np.random.default_rng(11).normal(
                scale=0.5, size=(n_windows * W, 18)).astype(np.float32)

            ref = DipStreamingSession(params, cfg, model, window=W,
                                      stats=stats, lookahead=K, history=P)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            for w in range(n_windows):
                sl = slice(w * W, (w + 1) * W)
                status, out = _request(addr, "POST", "/v1/step", {
                    "slot": slot, "ori": ori[sl].tolist(),
                    "acc": acc[sl].tolist()})
                expect = ref.step(ori[sl], acc[sl])
                if w < K:
                    assert status == 202 and out.get("warmup"), out
                    assert expect is None
                else:
                    assert status == 200, out
                    np.testing.assert_allclose(
                        np.asarray(out["pose"], np.float32), expect,
                        atol=3e-5, err_msg=f"window {w}")
            # flush drains the K-window buffered tail
            st, out = _request(addr, "POST", "/v1/flush", {"slot": slot})
            assert st == 200 and out["frames"] == K * W
            np.testing.assert_allclose(
                np.asarray(out["pose"], np.float32), ref.flush(),
                atol=3e-5)
        finally:
            srv.shutdown()


class TestRecycle:
    """State-preserving process recycle (VERDICT r3 #4 — the relay
    client leaks host buffers per jit call; a long-lived server must
    survive without operator babysitting)."""

    @pytest.mark.slow
    def test_snapshot_restore_roundtrip(self, setup, model):
        """snapshot -> fresh session -> restore == uninterrupted, incl.
        the buffered (K, P) window deques mid-warmup."""
        from scipy.spatial.transform import Rotation

        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.serve import session_restore, session_snapshot

        cfg, params3 = setup
        W, K, P = 6, 1, 1
        ori = Rotation.random(5 * W * 6, random_state=20).as_matrix(
        ).reshape(5, W, 54).astype(np.float32)
        acc = np.random.default_rng(21).normal(
            scale=0.5, size=(5, W, 18)).astype(np.float32)

        cont = StreamingCascade(params3, cfg, model, window=W,
                                lookahead=K, history=P)
        first = StreamingCascade(params3, cfg, model, window=W,
                                 lookahead=K, history=P)
        for i in range(3):      # 3 windows in: at capacity, buffers full
            cont.step(ori[i], acc[i])
            first.step(ori[i], acc[i])
        snap = session_snapshot(first)

        second = StreamingCascade(params3, cfg, model, window=W,
                                  lookahead=K, history=P)
        session_restore(second, snap)
        for i in (3, 4):
            want = cont.step(ori[i], acc[i])
            got = second.step(ori[i], acc[i])
            np.testing.assert_allclose(got, want, atol=2e-6,
                                       err_msg=f"window {i}")
        np.testing.assert_allclose(second.flush(), cont.flush(),
                                   atol=2e-6)

    def test_quiesce_rejects_new_work(self, setup, model):
        """quiesce(): returns occupied slots, then acquire -> None and
        step raises; an in-process (non-CLI) server 501s /v1/recycle."""
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        W = 6
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            occupied = srv.batcher.quiesce()
            assert occupied == [slot]
            assert srv.batcher.acquire() is None
            with pytest.raises(RuntimeError, match="recycling"):
                srv.batcher.step(slot, np.zeros((W, 54), np.float32),
                                 np.zeros((W, 18), np.float32))
            st, out = _request(addr, "POST", "/v1/recycle")
            assert st == 501 and "CLI-launched" in out["error"]
        finally:
            srv.shutdown()


@pytest.mark.slow
class TestRecycleE2E:
    def test_exec_recycle_preserves_sessions(self, model, tmp_path):
        """Subprocess `cli serve` on CPU: acquire, step, POST
        /v1/recycle, the fresh exec'd process inherits the socket and
        the slot's carried state — the next window equals an
        uninterrupted local session's."""
        import os
        import subprocess
        import sys
        import time as _time

        import jax as _jax
        from scipy.spatial.transform import Rotation

        from a3gc_tpu.data import load_adjacency_template
        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.smpl import write_synthetic_smpl_pickle
        from a3gc_tpu.utils import save_params

        nira = load_adjacency_template()

        def g(ui, uo, h, rot):
            return PoseNetConfig(net=N.GraphNetConfig(
                cell="a3gc", units_in=ui, units_out=uo, units_hidden=h),
                rotsize=rot)

        cfg = CascadeConfig(stage1=g(12, 3, 8, 3), stage2=g(15, 3, 8, 3),
                            stage3=g(15, 9, 8, 9))
        params3 = tuple(init_pose_net(_jax.random.PRNGKey(i), c, nira)
                        for i, c in enumerate((cfg.stage1, cfg.stage2,
                                               cfg.stage3)))
        ckpt = tmp_path / "ckpts"
        for i, p in enumerate(params3):
            save_params(p, str(ckpt), i + 1, 0, finetuning=True)
        smpl = write_synthetic_smpl_pickle(str(tmp_path / "s.pkl"),
                                           n_vertices=120)
        W = 6
        env = {"PATH": os.environ.get("PATH", ""),
               "PYTHONPATH": os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               "JAX_PLATFORMS": "cpu", "HOME": os.environ.get("HOME", "/"),
               "TMPDIR": str(tmp_path)}
        proc = subprocess.Popen(
            [sys.executable, "-m", "a3gc_tpu.cli", "serve",
             "--hu1", "8", "--hu2", "8", "--hu3", "8",
             "--path", str(ckpt), "--smpl", smpl, "--window", str(W),
             "--streams", "2", "--port", "0", "--recycle_rss_mb", "0"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env)
        try:
            line = proc.stdout.readline()
            addr_str = json.loads(line)["serving"]     # http://h:p
            host, port = addr_str.rsplit("//", 1)[1].rsplit(":", 1)
            addr = (host, int(port))

            ori = Rotation.random(3 * W * 6, random_state=30).as_matrix(
            ).reshape(3, W, 54).astype(np.float32)
            acc = np.random.default_rng(31).normal(
                scale=0.5, size=(3, W, 18)).astype(np.float32)

            st, info = _request(addr, "POST", "/v1/session")
            assert st == 200, info
            slot = info["slot"]
            st, out0 = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 0, "ori": ori[0].tolist(),
                "acc": acc[0].tolist()})
            assert st == 200, out0

            # trigger the state-preserving exec recycle
            try:
                _request(addr, "POST", "/v1/recycle")
            except Exception:
                pass            # the connection may die mid-handoff
            # the fresh process inherits the socket; poll until revived
            deadline = _time.time() + 180
            while True:
                assert _time.time() < deadline, "server did not revive"
                try:
                    st, stats = _request(addr, "GET", "/v1/stats")
                    if st == 200:
                        break
                    _time.sleep(2.0)    # 500 "recycling" from the dying
                    #                     generation's pre-exec window
                except Exception:
                    _time.sleep(2.0)
            assert stats["active_sessions"] == 1    # the slot survived

            # the seq cache survived the exec handoff: retrying window
            # 0's seq against the RESTORED process answers from cache
            # (identical pose) instead of re-applying the window to the
            # already-advanced carried state (ADVICE r4 medium)
            st, replay = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 0, "ori": ori[0].tolist(),
                "acc": acc[0].tolist()})
            assert st == 200, replay
            np.testing.assert_array_equal(
                np.asarray(replay["pose"], np.float32),
                np.asarray(out0["pose"], np.float32))

            st, out1 = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 1, "ori": ori[1].tolist(),
                "acc": acc[1].tolist()})
            assert st == 200, out1

            # oracle: uninterrupted local session
            ref = StreamingCascade(params3, cfg, model, window=W)
            w0 = ref.step(ori[0], acc[0])
            w1 = ref.step(ori[1], acc[1])
            np.testing.assert_allclose(
                np.asarray(out0["pose"], np.float32), w0, atol=3e-5)
            np.testing.assert_allclose(
                np.asarray(out1["pose"], np.float32), w1, atol=3e-5)
        finally:
            proc.kill()
            proc.wait()


class TestSeqInFlightDuplicate:
    """A retry racing its ORIGINAL request (both queued concurrently —
    typical when the listening-socket backlog drains after a recycle
    pause): the duplicate must wait for the original's completion, NOT
    re-enqueue the window (re-enqueueing would apply it to the carried
    state twice, or leave one of two mailbox waiters spinning forever)."""

    def test_duplicate_of_in_flight_seq_applies_once(self, setup, model):
        import time as _time

        from a3gc_tpu.eval.streaming import StreamingCascade
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W = 5
        srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            sess = srv.batcher.sess
            gate, entered = threading.Event(), threading.Event()

            class SlowSess:
                def __getattr__(self, name):        # reset/flush/params3
                    return getattr(sess, name)

                def step(self, *a, **k):
                    entered.set()
                    assert gate.wait(30)
                    return sess.step(*a, **k)

            ori = Rotation.random(2 * W * 6, random_state=50).as_matrix(
            ).reshape(2, W, 54).astype(np.float32)
            acc = np.random.default_rng(51).normal(
                scale=0.5, size=(2, W, 18)).astype(np.float32)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            srv.batcher.sess = SlowSess()
            try:
                payload = {"slot": slot, "seq": 0, "ori": ori[0].tolist(),
                           "acc": acc[0].tolist()}
                with ThreadPoolExecutor(2) as ex:
                    f1 = ex.submit(_request, addr, "POST", "/v1/step",
                                   payload)
                    assert entered.wait(30)   # original is INSIDE the tick
                    f2 = ex.submit(_request, addr, "POST", "/v1/step",
                                   payload)
                    _time.sleep(0.3)          # duplicate reaches step()
                    gate.set()
                    st1, out1 = f1.result(60)
                    st2, out2 = f2.result(60)
            finally:
                srv.batcher.sess = sess
            assert st1 == 200 and st2 == 200
            np.testing.assert_array_equal(np.asarray(out1["pose"]),
                                          np.asarray(out2["pose"]))
            # applied exactly ONCE: the next window matches the
            # single-application oracle
            st, out3 = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 1, "ori": ori[1].tolist(),
                "acc": acc[1].tolist()})
            assert st == 200
            ref = StreamingCascade(params3, cfg, model, window=W)
            ref.step(ori[0], acc[0])
            np.testing.assert_allclose(
                np.asarray(out3["pose"], np.float32),
                ref.step(ori[1], acc[1]), atol=3e-5)
        finally:
            srv.shutdown()

    def test_stale_older_seq_rejected(self, setup, model):
        """A very stale retry (an OLDER seq than the last applied) has no
        cached answer left — it must be refused, not re-applied."""
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W = 4
        srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            ori = Rotation.random(W * 6, random_state=52).as_matrix(
            ).reshape(W, 54).astype(np.float32)
            acc = np.random.default_rng(53).normal(
                scale=0.5, size=(W, 18)).astype(np.float32)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            for seq in (0, 1):
                st, _ = _request(addr, "POST", "/v1/step", {
                    "slot": slot, "seq": seq, "ori": ori.tolist(),
                    "acc": acc.tolist()})
                assert st == 200
            st, out = _request(addr, "POST", "/v1/step", {
                "slot": slot, "seq": 0, "ori": ori.tolist(),
                "acc": acc.tolist()})
            assert st == 400 and "stale seq" in out["error"]
        finally:
            srv.shutdown()


class TestAcquireIdempotency:
    """POST /v1/session with a client token: a retried acquire whose 200
    was lost re-presents the token and gets its ORIGINAL slot back
    instead of consuming (and leaking) a second one."""

    def test_token_retry_returns_same_slot(self, setup, model):
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        srv = PoseServer(params3, cfg, model, window=4, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            st, a = _request(addr, "POST", "/v1/session", {"token": "t-1"})
            assert st == 200
            st, b = _request(addr, "POST", "/v1/session", {"token": "t-1"})
            assert st == 200 and b["slot"] == a["slot"]
            _, stats = _request(addr, "GET", "/v1/stats")
            assert stats["active_sessions"] == 1    # no leak
            st, c = _request(addr, "POST", "/v1/session", {"token": "t-2"})
            assert st == 200 and c["slot"] != a["slot"]
            # release purges the token: re-presenting it is a FRESH
            # acquire (and must NOT claim the slot's next tenant)
            _request(addr, "DELETE", f"/v1/session/{a['slot']}")
            st, d = _request(addr, "POST", "/v1/session", {"token": "t-1"})
            assert st == 200
            _, stats = _request(addr, "GET", "/v1/stats")
            assert stats["active_sessions"] == 2
            # bad token type rejected
            st, e = _request(addr, "POST", "/v1/session", {"token": 7})
            assert st == 400
        finally:
            srv.shutdown()


class TestRecyclingGates:
    """Every batcher mutator must refuse work between quiesce() and the
    exec: a release or reload mutating slot/seq/param state mid-snapshot
    would tear the snapshot (or resurrect a freed slot after the exec)."""

    def test_release_and_reload_rejected_while_recycling(self, setup,
                                                         model):
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        srv = PoseServer(params3, cfg, model, window=4, streams=1, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            slot = srv.batcher.acquire()
            assert slot is not None
            with srv.batcher.lock:
                srv.batcher.recycling = True
            with pytest.raises(RuntimeError, match="recycling"):
                srv.batcher.release(slot)
            with pytest.raises(RuntimeError, match="recycling"):
                srv.batcher.swap_params(params3)
            assert srv.batcher.acquire() is None
            with srv.batcher.lock:
                srv.batcher.recycling = False
            assert srv.batcher.release(slot) is True
        finally:
            srv.shutdown()


class TestFlushVsInFlightStep:
    """A flush arriving while the slot's step is INSIDE the executing
    tick (already popped from pending) must be rejected, not accepted —
    both waiters share the results[slot] mailbox, so an accepted flush
    would cross-wire the responses (step waiter reads the flush tail;
    flush waiter hangs on the emptied mailbox)."""

    def test_flush_rejected_while_step_in_tick(self, setup, model):
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W = 5
        srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0,
                         lookahead=1)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            sess = srv.batcher.sess
            gate, entered = threading.Event(), threading.Event()

            class SlowSess:
                def __getattr__(self, name):
                    return getattr(sess, name)

                def step(self, *a, **k):
                    entered.set()
                    assert gate.wait(30)
                    return sess.step(*a, **k)

            ori = Rotation.random(W * 6, random_state=60).as_matrix(
            ).reshape(W, 54).astype(np.float32)
            acc = np.random.default_rng(61).normal(
                scale=0.5, size=(W, 18)).astype(np.float32)
            _, info = _request(addr, "POST", "/v1/session")
            slot = info["slot"]
            srv.batcher.sess = SlowSess()
            try:
                with ThreadPoolExecutor(1) as ex:
                    f1 = ex.submit(_request, addr, "POST", "/v1/step", {
                        "slot": slot, "seq": 0, "ori": ori.tolist(),
                        "acc": acc.tolist()})
                    assert entered.wait(30)   # step is INSIDE the tick
                    st, out = _request(addr, "POST", "/v1/flush",
                                       {"slot": slot})
                    assert st == 400 and "in flight" in out["error"]
                    gate.set()
                    st1, _ = f1.result(60)
                    assert st1 == 202        # lookahead warmup window
            finally:
                srv.batcher.sess = sess
            # after the tick, flush works normally again
            st, out = _request(addr, "POST", "/v1/flush", {"slot": slot})
            assert st == 200
        finally:
            srv.shutdown()


class TestAcquireDeliveryRace:
    """acquire_outcome: a failed response write un-acquires the slot
    ONLY when no concurrent handler for the same token delivered it —
    freeing a delivered slot would hand a client-owned session to the
    next acquirer."""

    def test_failed_write_after_concurrent_delivery_keeps_slot(
            self, setup, model):
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        srv = PoseServer(params3, cfg, model, window=4, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        b = srv.batcher
        try:
            # original handler allocates; retry handler rides the token
            s1 = b.acquire(token="T")
            s2 = b.acquire(token="T")
            assert s1 == s2 and s1 is not None
            # the RETRY's write lands first; the original's write fails
            b.acquire_outcome("T", s2, delivered=True)
            b.acquire_outcome("T", s1, delivered=False)
            assert s1 not in b.free          # client owns it — kept
            assert b.acquire_tokens.get("T") == s1
            # a later failed retry (token now delivered) also keeps it
            s3 = b.acquire(token="T")
            assert s3 == s1
            b.acquire_outcome("T", s3, delivered=False)
            assert s1 not in b.free
        finally:
            srv.shutdown()

    def test_all_writes_failed_frees_slot(self, setup, model):
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        srv = PoseServer(params3, cfg, model, window=4, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        b = srv.batcher
        try:
            s1 = b.acquire(token="U")
            s2 = b.acquire(token="U")
            assert s1 == s2
            b.acquire_outcome("U", s1, delivered=False)
            assert s1 not in b.free          # a sibling is still in flight
            b.acquire_outcome("U", s2, delivered=False)
            assert s1 in b.free              # last one out un-acquires
            assert "U" not in b.acquire_tokens
            # tokenless failed write frees immediately (no idempotency)
            s3 = b.acquire()
            b.acquire_outcome(None, s3, delivered=False)
            assert s3 in b.free
        finally:
            srv.shutdown()

    def test_restored_tokens_count_as_delivered(self, setup, model):
        """Across an exec-recycle the delivered set is rebuilt from the
        snapshot's tokens: a post-recycle retry whose write fails must
        not un-acquire a slot the client may already own."""
        from a3gc_tpu.serve import PoseServer

        cfg, params3 = setup
        srv = PoseServer(params3, cfg, model, window=4, streams=2, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        b = srv.batcher
        try:
            s1 = b.acquire(token="V")
            b.acquire_outcome("V", s1, delivered=True)
            # simulate the restore path's bookkeeping in a fresh process:
            # tokens carried, delivered rebuilt from them
            b.acquire_inflight.clear()
            b.acquire_delivered.clear()
            b.acquire_delivered.update({"V": s1})
            s2 = b.acquire(token="V")
            assert s2 == s1
            b.acquire_outcome("V", s2, delivered=False)
            assert s1 not in b.free
        finally:
            srv.shutdown()


class TestReleaseToken:
    """DELETE /v1/session/<slot> with the acquire token: a retried
    DELETE whose first attempt landed (response lost) must not release
    the slot's NEXT tenant — once the token no longer owns the slot the
    server answers 404, which the client treats as already-done."""

    def test_stale_delete_cannot_release_next_tenant(self, setup, model):
        from a3gc_tpu.serve import PoseServer
        from scipy.spatial.transform import Rotation

        cfg, params3 = setup
        W = 4
        srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        addr = srv.address
        try:
            st, a = _request(addr, "POST", "/v1/session", {"token": "t-A"})
            assert st == 200
            st, _ = _request(addr, "DELETE", f"/v1/session/{a['slot']}",
                             {"token": "t-A"})
            assert st == 200
            # next tenant takes the same slot (streams=1)
            st, c = _request(addr, "POST", "/v1/session", {"token": "t-B"})
            assert st == 200 and c["slot"] == a["slot"]
            # A's auto-retried DELETE arrives late: 404, tenant unharmed
            st, out = _request(addr, "DELETE", f"/v1/session/{a['slot']}",
                               {"token": "t-A"})
            assert st == 404
            _, stats = _request(addr, "GET", "/v1/stats")
            assert stats["active_sessions"] == 1
            ori = Rotation.random(W * 6, random_state=62).as_matrix(
            ).reshape(W, 54).astype(np.float32)
            acc = np.zeros((W, 18), np.float32)
            st, _ = _request(addr, "POST", "/v1/step", {
                "slot": c["slot"], "seq": 0, "ori": ori.tolist(),
                "acc": acc.tolist()})
            assert st == 200                 # B's session still live
            # tokenless DELETE keeps legacy semantics
            st, _ = _request(addr, "DELETE", f"/v1/session/{c['slot']}")
            assert st == 200
        finally:
            srv.shutdown()
