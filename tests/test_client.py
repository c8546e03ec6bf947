"""PoseClient — the productized wire client (a3gc_tpu/client.py) drives
a live PoseServer exactly like hand-rolled HTTP: binary + JSON parity
with the direct session, warmup/flush semantics, at-most-once retried
steps via the seq cache, context-manager lifecycle."""

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


def _windows(n_windows, W, seed=0):
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(seed)
    ori = Rotation.random(n_windows * W * 6, random_state=seed
                          ).as_matrix().reshape(
        n_windows * W, 54).astype(np.float32)
    acc = rng.normal(scale=0.5, size=(n_windows * W, 18)).astype(np.float32)
    return [(ori[w * W:(w + 1) * W], acc[w * W:(w + 1) * W])
            for w in range(n_windows)]


@pytest.mark.parametrize("binary", [True, False])
def test_client_matches_direct_session(setup, model, binary):
    from a3gc_tpu.client import PoseClient
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.serve import PoseServer

    cfg, params3 = setup
    W = 6
    srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ref = StreamingCascade(params3, cfg, model, window=W)
        with PoseClient(*srv.address, binary=binary,
                        retry_s=5.0, retry_interval=0.1) as c:
            assert c.window == W and c.slot is not None
            for ori, acc in _windows(3, W, seed=1):
                pose = c.step(ori, acc)
                np.testing.assert_allclose(pose, ref.step(ori, acc),
                                           atol=2e-5)
            assert c.flush() is None        # plain windowing: no tail
            st = c.stats()
            assert st["active_sessions"] == 1
        assert c.slot is None               # context exit released
        assert c.stats()["active_sessions"] == 0
    finally:
        srv.shutdown()


def test_client_warmup_and_flush(setup, model):
    """Against a lookahead server the client returns None for the K
    warmup windows, then lagged emissions equal to the live session;
    flush() drains the buffered tail as one chunk."""
    from a3gc_tpu.client import PoseClient
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.serve import PoseServer

    cfg, params3 = setup
    W, K, P, n_win = 6, 1, 1, 4
    srv = PoseServer(params3, cfg, model, window=W, streams=2, port=0,
                     lookahead=K, history=P)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ref = StreamingCascade(params3, cfg, model, window=W,
                               lookahead=K, history=P)
        with PoseClient(*srv.address) as c:
            for i, (ori, acc) in enumerate(_windows(n_win, W, seed=2)):
                got, want = c.step(ori, acc), ref.step(ori, acc)
                if want is None:
                    assert got is None, f"window {i}"
                else:
                    np.testing.assert_allclose(got, want, atol=2e-5,
                                               err_msg=f"window {i}")
            tail, want_tail = c.flush(), ref.flush()
            assert (tail is None) == (want_tail is None)
            if want_tail is not None:
                np.testing.assert_allclose(tail, want_tail, atol=2e-5)
            assert c.flush() is None        # drained: nothing buffered
    finally:
        srv.shutdown()


def test_client_retried_step_is_at_most_once(setup, model):
    """A re-sent (seq, window) — what the client's retry path issues
    after a lost response — is answered from the server's seq cache:
    identical bytes back, carried state NOT advanced a second time."""
    from a3gc_tpu.client import PoseClient
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.serve import PoseServer

    cfg, params3 = setup
    W = 6
    srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ref = StreamingCascade(params3, cfg, model, window=W)
        wins = _windows(3, W, seed=3)
        with PoseClient(*srv.address) as c:
            first = c.step(*wins[0])
            np.testing.assert_allclose(first, ref.step(*wins[0]),
                                       atol=2e-5)
            # simulate the retry: re-issue the SAME seq + window
            c._seq -= 1
            again = c.step(*wins[0])
            np.testing.assert_array_equal(again, first)
            # state advanced exactly once: the next windows still match
            for ori, acc in wins[1:]:
                np.testing.assert_allclose(c.step(ori, acc),
                                           ref.step(ori, acc), atol=2e-5)
    finally:
        srv.shutdown()


def test_client_acquire_waits_for_free_slot(setup, model):
    """acquire(wait=True) retries a full server (503) until a slot
    frees; wait=False surfaces the 503 as ServerError."""
    from a3gc_tpu.client import PoseClient, ServerError
    from a3gc_tpu.serve import PoseServer

    cfg, params3 = setup
    srv = PoseServer(params3, cfg, model, window=4, streams=1, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        holder = PoseClient(*srv.address, retry_s=5.0, retry_interval=0.05)
        holder.acquire()
        quick = PoseClient(*srv.address, retry_s=0.0)
        with pytest.raises(ServerError) as ei:
            quick.acquire(wait=False)
        assert ei.value.status == 503
        waiter = PoseClient(*srv.address, retry_s=10.0,
                            retry_interval=0.05)
        t = threading.Timer(0.3, holder.release)
        t.start()
        try:
            assert waiter.acquire(wait=True) is not None
        finally:
            t.join()
        waiter.release()
    finally:
        srv.shutdown()


def test_client_input_validation(setup, model):
    from a3gc_tpu.client import PoseClient
    from a3gc_tpu.serve import PoseServer

    cfg, params3 = setup
    W = 4
    srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = PoseClient(*srv.address)
        with pytest.raises(RuntimeError, match="acquire"):
            c.step(np.zeros((W, 54), np.float32),
                   np.zeros((W, 18), np.float32))
        c.acquire()
        with pytest.raises(ValueError, match="need ori"):
            c.step(np.zeros((W + 1, 54), np.float32),
                   np.zeros((W, 18), np.float32))
        c.release()
        c.release()                         # idempotent no-op
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_client_rides_exec_recycle(setup, model, tmp_path):
    """PoseClient steps through a state-preserving exec recycle with no
    caller-visible interruption: its retry budget absorbs the pause
    (requests queue in the inherited listening socket or fail and are
    re-sent with the SAME seq), and the post-recycle windows equal an
    uninterrupted local session's."""
    import os
    import subprocess
    import sys

    from a3gc_tpu.client import PoseClient
    from a3gc_tpu.data import load_adjacency_template
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.smpl import write_synthetic_smpl_pickle
    from a3gc_tpu.utils import save_params

    cfg, params3 = setup
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
        import json as _json
        addr_str = _json.loads(proc.stdout.readline())["serving"]
        host, port = addr_str.rsplit("//", 1)[1].rsplit(":", 1)

        wins = _windows(3, W, seed=4)
        ref = StreamingCascade(params3, cfg, model, window=W)
        with PoseClient(host, int(port), retry_s=180.0,
                        retry_interval=1.0) as c:
            np.testing.assert_allclose(c.step(*wins[0]),
                                       ref.step(*wins[0]), atol=3e-5)
            c.recycle()     # exec handoff; the next step rides the pause
            for ori, acc in wins[1:]:
                np.testing.assert_allclose(c.step(ori, acc),
                                           ref.step(ori, acc), atol=3e-5)
            assert c.stats()["active_sessions"] == 1
    finally:
        proc.kill()
        proc.wait()


def test_client_unknown_fate_window_guard(setup, model):
    """After a transport failure that exhausts the retry budget, the
    window's fate is unknown: the client refuses a DIFFERENT next window
    (it could double-apply the old one), accepts a retry of the SAME
    window, and the seq numbering stays consistent with the server."""
    from a3gc_tpu.client import PoseClient
    from a3gc_tpu.eval.streaming import StreamingCascade
    from a3gc_tpu.serve import PoseServer

    cfg, params3 = setup
    W = 6
    srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ref = StreamingCascade(params3, cfg, model, window=W)
        wins = _windows(3, W, seed=5)
        c = PoseClient(*srv.address, retry_s=0.0)
        c.acquire()
        np.testing.assert_allclose(c.step(*wins[0]), ref.step(*wins[0]),
                                   atol=2e-5)
        # transport dies before the request reaches the server
        real = c._roundtrip
        c._roundtrip = lambda *a, **k: (_ for _ in ()).throw(
            ConnectionError("wire cut"))
        with pytest.raises(ConnectionError):
            c.step(*wins[1])
        c._roundtrip = real
        # a DIFFERENT window is refused while wins[1]'s fate is unknown
        with pytest.raises(RuntimeError, match="unknown"):
            c.step(*wins[2])
        # retrying the SAME window succeeds and applies exactly once
        np.testing.assert_allclose(c.step(*wins[1]), ref.step(*wins[1]),
                                   atol=2e-5)
        np.testing.assert_allclose(c.step(*wins[2]), ref.step(*wins[2]),
                                   atol=2e-5)
        c.release()
    finally:
        srv.shutdown()


def test_client_keepalive_and_token_release(setup, model):
    """The client rides ONE kept-alive connection across steps (HTTP/1.1
    server), reconnects transparently if it drops, and its DELETE
    carries the acquire token (release() then closes the connection)."""
    from a3gc_tpu.client import PoseClient
    from a3gc_tpu.serve import PoseServer

    cfg, params3 = setup
    W = 6
    srv = PoseServer(params3, cfg, model, window=W, streams=1, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        wins = _windows(3, W, seed=9)
        c = PoseClient(*srv.address)
        c.acquire()
        assert c._token is not None
        assert c.step(*wins[0]) is not None
        conn = c._conn
        assert conn is not None              # kept alive after a step
        assert c.step(*wins[1]) is not None
        assert c._conn is conn               # SAME connection reused
        # a dropped connection reconnects transparently
        c._conn.close()
        assert c.step(*wins[2]) is not None
        c.release()
        assert c._conn is None and c._token is None
        # the slot is actually free again
        assert srv.batcher.acquire() is not None
    finally:
        srv.shutdown()
