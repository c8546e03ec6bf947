"""L4 input pipeline: batch assembly parity with the reference datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3gc_tpu.config import joint_set as JS
from a3gc_tpu.data import pipeline as DP
from a3gc_tpu.data.stats import compute_stats, load_stats, save_stats
from a3gc_tpu.data.synthetic import synthetic_packed_dataset


@pytest.fixture(scope="module")
def packed():
    return synthetic_packed_dataset(n_seqs=6, seq_len=20, seed=0)


class TestGraphBatch:
    def test_scatter_matches_reference_semantics(self, packed):
        """Reproduce GraphDataset_tp.__getitem__ (ref: datasets.py:45-73)
        in numpy and compare."""
        raw = {k: jnp.asarray(v) for k, v in packed.items()}
        out = DP.graph_batch(raw, stats=None, rng=None)
        inputs, leaf_in, full_in, leaf, full, smpl = [np.asarray(o) for o in out]

        # reference-style manual assembly for sequence 0
        ori = packed["ori"][0]
        acc = packed["acc"][0]
        fp = packed["full_pos"][0]
        inputs_ref = np.zeros((20, 15, 12), np.float32)
        cat = np.concatenate(
            (acc.reshape(-1, 6, 3)[:, :5], ori.reshape(-1, 6, 9)[:, :5]), -1)
        for i, el in enumerate(JS.input_joints):
            inputs_ref[:, el] = cat[:, i]
        np.testing.assert_allclose(inputs[0], inputs_ref, atol=1e-6)

        leaf_ref = np.zeros((20, 15, 3), np.float32)
        for i, el in enumerate(JS.leaf_nodes_reduced):
            leaf_ref[:, el] = fp[:, JS.leaf_nodes[i]]
        np.testing.assert_allclose(leaf[0].reshape(20, 15, 3), leaf_ref,
                                   atol=1e-6)
        np.testing.assert_allclose(
            full[0].reshape(20, 15, 3), fp[:, np.asarray(JS.reduced)],
            atol=1e-6)
        np.testing.assert_allclose(smpl[0], packed["pose"][0], atol=0)

    def test_noise_only_on_inputs(self, packed):
        raw = {k: jnp.asarray(v) for k, v in packed.items()}
        clean = DP.graph_batch(raw, rng=None)
        noisy = DP.graph_batch(raw, rng=jax.random.PRNGKey(0))
        # targets identical, teacher-forcing inputs perturbed
        np.testing.assert_allclose(np.asarray(clean[3]), np.asarray(noisy[3]))
        np.testing.assert_allclose(np.asarray(clean[4]), np.asarray(noisy[4]))
        assert np.abs(np.asarray(clean[2]) - np.asarray(noisy[2])).max() > 0
        got = np.std(np.asarray(noisy[2]) - np.asarray(clean[2]))
        assert 0.01 < got < 0.05   # ~N(0, 0.025)

    def test_normalization(self, packed):
        stats = {
            "ori_mean_channel": jnp.full((54,), 0.5),
            "ori_std_channel": jnp.full((54,), 2.0),
            "acc_mean_channel": jnp.zeros((18,)),
            "acc_std_channel": jnp.full((18,), 4.0),
        }
        raw = {k: jnp.asarray(v) for k, v in packed.items()}
        inputs, *_ = DP.graph_batch(raw, stats=stats)
        base, *_ = DP.graph_batch(raw, stats=None)
        # acc occupies features 0:3 of each populated node
        node = JS.input_joints[0]
        np.testing.assert_allclose(np.asarray(inputs[..., node, :3]),
                                   np.asarray(base[..., node, :3]) / 4.0,
                                   atol=1e-6)


class TestFlatAndDipBatch:
    def test_flat_shapes(self, packed):
        raw = {k: jnp.asarray(v) for k, v in packed.items()}
        out = DP.flat_batch(raw, rng=jax.random.PRNGKey(1))
        shapes = [tuple(o.shape) for o in out]
        assert shapes == [(6, 20, 72), (6, 20, 15), (6, 20, 69),
                          (6, 20, 15), (6, 20, 69), (6, 20, 135)]

    def test_dip_drops_root_channels(self, packed):
        stats = {
            "ori_mean_channel": jnp.zeros((54,)),
            "ori_std_channel": jnp.ones((54,)),
            "acc_mean_channel": jnp.zeros((18,)),
            "acc_std_channel": jnp.ones((18,)),
        }
        raw = {k: jnp.asarray(v) for k, v in packed.items()}
        inputs, smpl = DP.dip_batch(raw, stats)
        assert inputs.shape == (6, 20, 60)
        np.testing.assert_allclose(np.asarray(inputs[..., :15]),
                                   packed["acc"][..., :15], atol=1e-6)


class TestSampler:
    def test_epoch_covers_all(self, packed):
        s = DP.Sampler(packed, batch_size=2, shuffle=True, seed=1)
        seen = 0
        for raw in s:
            assert raw["acc"].shape == (2, 20, 18)
            seen += 2
        assert seen == 6 and len(s) == 3

    def test_shuffle_differs_across_epochs(self, packed):
        s = DP.Sampler(packed, batch_size=6, shuffle=True, seed=2)
        a = next(iter(s))["acc"]
        b = next(iter(s))["acc"]
        assert not np.allclose(a, b)

    def test_sharded_empty_epoch_raises(self, packed):
        # 6 rows over 4 shards: cap=2, real=[2,2,2,0] — shard 3 can't
        # contribute a full drop_remainder share; must raise, not yield
        # a silent zero-batch epoch (train loss 0.0)
        s = DP.Sampler(packed, batch_size=4, shuffle=False)
        with pytest.raises(ValueError, match="sharded epoch is empty"):
            list(s.iter_indices_sharded(4))
        # pad_remainder covers the same shape with weighted pads
        s = DP.Sampler(packed, batch_size=4, shuffle=False,
                       pad_remainder=True)
        batches = list(s.iter_indices_sharded(4))
        assert len(batches) == 2
        w = np.stack([w for _, w in batches])
        assert w.sum() == 6                  # every real row exactly once


class TestStats:
    def test_compute_matches_torch_semantics(self):
        rng = np.random.default_rng(0)
        chunks = [rng.normal(size=(40, 18)), rng.normal(size=(25, 18))]
        stats = compute_stats({"acc": chunks})
        allx = np.concatenate(chunks)
        np.testing.assert_allclose(stats["acc_mean_channel"],
                                   allx.mean(0), atol=1e-5)
        np.testing.assert_allclose(stats["acc_std_channel"],
                                   allx.std(0, ddof=1), atol=1e-5)
        np.testing.assert_allclose(stats["acc_std_all"],
                                   allx.std(ddof=1), atol=1e-5)

    def test_save_load_round_trip(self, tmp_path):
        stats = compute_stats({"acc": [np.ones((10, 18))]})
        p = save_stats(stats, str(tmp_path / "s.npz"))
        back = load_stats(p)
        np.testing.assert_allclose(back["acc_mean_channel"],
                                   stats["acc_mean_channel"])

    def test_convert_torch_stats(self, tmp_path, reference_path):
        from a3gc_tpu.data.stats import convert_torch_stats
        src = "/root/reference/data/all_train_stats.pt"
        out = convert_torch_stats(src, str(tmp_path / "ref.npz"))
        stats = load_stats(out)
        assert stats["acc_mean_channel"].shape == (18,)
        assert stats["ori_std_channel"].shape == (54,)
        assert stats["full_pos_mean_channel"].shape == (24, 3)


def test_shipped_stats_assets_match_reference():
    """The shipped assets/stats npz files equal a fresh conversion of the
    reference's .pt stats (they are committed so --norm works standalone)."""
    import os
    import numpy as np
    from a3gc_tpu.data.stats import convert_torch_stats, load_stats

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("all_train_stats", "all_sym_train_stats"):
        shipped = load_stats(os.path.join(root, "a3gc_tpu", "assets",
                                          "stats", f"{name}.npz"))
        src = f"/root/reference/data/{name}.pt"
        if not os.path.isfile(src):
            continue
        fresh = load_stats(convert_torch_stats(
            src, f"/tmp/_stats_check_{name}.npz"))
        assert set(shipped) == set(fresh)
        for k in shipped:
            np.testing.assert_array_equal(shipped[k], fresh[k], err_msg=k)


class TestTorchDataConverter:
    """Reference packed .pt datasets (transform_to_torch_data* layouts,
    ref: postprocess_data.py:143-203) convert to this framework's npz
    schemas and feed straight into the Sampler / test-sequence loader."""

    def test_train_layout_roundtrip(self, tmp_path):
        import torch
        from a3gc_tpu.compat import convert_torch_dataset
        from a3gc_tpu.data import pipeline as DP

        N, T = 4, 12
        rng = np.random.RandomState(0)
        torch.save({
            "ori": torch.from_numpy(rng.randn(N, T, 6, 9)),
            "acc": torch.from_numpy(rng.randn(N, T, 6, 3)),
            "pose": torch.from_numpy(rng.randn(N, T, 15, 3, 3)),
            "leaf_pos": torch.from_numpy(rng.randn(N, T, 5, 3)),
            "full_pos": torch.from_numpy(rng.randn(N, T, 24, 3)),
        }, tmp_path / "train_pos.pt")
        out = convert_torch_dataset(str(tmp_path / "train_pos.pt"),
                                    str(tmp_path / "train.npz"))
        packed = DP.load_packed(out)
        assert packed["ori"].shape == (N, T, 54)
        assert packed["acc"].shape == (N, T, 18)
        assert packed["pose"].shape == (N, T, 135)
        assert packed["full_pos"].shape == (N, T, 24, 3)
        assert packed["leaf_pos"].shape == (N, T, 5, 3)
        assert all(v.dtype == np.float32 for v in packed.values())
        batches = list(DP.Sampler(packed, 2, seed=0))
        assert len(batches) == 2
        # BOTH training pipelines consume the converted file: graph
        # derives leaf from full_pos, flat reads leaf_pos directly
        raw = {k: jnp.asarray(v) for k, v in batches[0].items()}
        DP.graph_batch(raw)
        out_flat = DP.flat_batch(raw)
        assert out_flat[1].shape == (2, T, 15)
        # values survive the conversion
        src = torch.load(tmp_path / "train_pos.pt", weights_only=False)
        np.testing.assert_allclose(
            packed["ori"][0, 0],
            src["ori"][0, 0].numpy().reshape(54).astype(np.float32))

    def test_test_layout_roundtrip(self, tmp_path):
        import torch
        from a3gc_tpu.compat import convert_torch_dataset
        from a3gc_tpu.data.factory.dipimu import load_test_sequences

        rng = np.random.RandomState(1)
        lengths = (20, 35)
        torch.save({
            "ori": [torch.from_numpy(rng.randn(t, 54)) for t in lengths],
            "acc": [torch.from_numpy(rng.randn(t, 18)) for t in lengths],
            "pose": [torch.from_numpy(rng.randn(t, 15, 3, 3))
                     for t in lengths],
        }, tmp_path / "test.pt")
        out = convert_torch_dataset(str(tmp_path / "test.pt"),
                                    str(tmp_path / "test.npz"))
        seqs = load_test_sequences(out)
        assert len(seqs) == 2
        for seq, t in zip(seqs, lengths):
            assert seq["ori"].shape == (t, 54)
            assert seq["acc"].shape == (t, 18)
            assert seq["pose"].shape == (t, 135)

    def test_non_dataset_pt_is_rejected(self, tmp_path):
        import torch
        from a3gc_tpu.compat import convert_torch_dataset
        torch.save({"state_dict": {}}, tmp_path / "ckpt.pt")
        with pytest.raises(AssertionError, match="packed dataset"):
            convert_torch_dataset(str(tmp_path / "ckpt.pt"),
                                  str(tmp_path / "x.npz"))
