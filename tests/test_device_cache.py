"""DeviceCachedLoader yields bit-identical batches to the host loader."""

import numpy as np

from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.data.batching import DeviceCachedLoader, SpeechDataLoader
from ctc_pytorch_tpu.data.dataset import SpeechDataset
from ctc_pytorch_tpu.data.kaldi_io import ArkWriter
from ctc_pytorch_tpu.vocab import Vocab


import pytest


@pytest.mark.parametrize("mode", ["bucket", "quantized"])
def test_device_cache_equals_host_loader(tmp_path, mode):
    rng = np.random.RandomState(0)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with ArkWriter(ark, scp) as w:
        for i in range(23):
            w.write(f"u{i:02d}",
                    rng.randn(20 + rng.randint(60), 7).astype(np.float32))
    (tmp_path / "units").write_text("a\nb\nc\n")
    with open(tmp_path / "lab", "w") as f:
        for i in range(23):
            f.write(f"u{i:02d} " + " ".join(rng.choice(["a", "b", "c"], 4))
                    + "\n")
    cfg = Config()
    cfg.left_ctx, cfg.right_ctx = 1, 1
    cfg.n_skip_frame, cfg.n_downsample = 2, 2
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, scp, str(tmp_path / "lab"), cfg)
    host = SpeechDataLoader(ds, 4, shuffle=True, num_buckets=3, seed=7,
                            mode=mode)
    dev = DeviceCachedLoader(
        SpeechDataLoader(ds, 4, shuffle=True, num_buckets=3, seed=7,
                         mode=mode)
    )
    assert dev.total_bytes() > 0
    for epoch in (0, 1):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        hb, db = list(host), list(dev)
        assert len(hb) == len(db)
        for h, d in zip(hb, db):
            np.testing.assert_array_equal(h.feats, np.asarray(d.feats))
            np.testing.assert_array_equal(h.labels, np.asarray(d.labels))
            np.testing.assert_array_equal(h.input_lengths,
                                          np.asarray(d.input_lengths))
            np.testing.assert_allclose(h.input_frac,
                                       np.asarray(d.input_frac), rtol=1e-6)
            np.testing.assert_array_equal(h.example_mask,
                                          np.asarray(d.example_mask))
            np.testing.assert_array_equal(h.label_lengths,
                                          np.asarray(d.label_lengths))
            assert h.utts == d.utts


def test_estimate_bytes_matches_upload(tmp_path):
    """The pre-upload budget estimate equals the real uploaded footprint
    (cli/train.py budget-checks with estimate_bytes BEFORE device_put)."""
    rng = np.random.RandomState(1)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with ArkWriter(ark, scp) as w:
        for i in range(17):
            w.write(f"u{i:02d}",
                    rng.randn(12 + rng.randint(40), 6).astype(np.float32))
    (tmp_path / "units").write_text("a\nb\n")
    with open(tmp_path / "lab", "w") as f:
        for i in range(17):
            f.write(f"u{i:02d} a b\n")
    cfg = Config()
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, scp, str(tmp_path / "lab"), cfg)
    loader = SpeechDataLoader(ds, 4, shuffle=False, num_buckets=3)
    est = DeviceCachedLoader.estimate_bytes(loader)
    real = DeviceCachedLoader(loader).total_bytes()
    assert est == real


def test_prefetch_loader_equals_host_loader(tmp_path):
    """PrefetchLoader (async device_put overlap) is batch-identical to the
    host loader it wraps."""
    from ctc_pytorch_tpu.data.batching import PrefetchLoader

    rng = np.random.RandomState(2)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with ArkWriter(ark, scp) as w:
        for i in range(15):
            w.write(f"u{i:02d}",
                    rng.randn(10 + rng.randint(30), 5).astype(np.float32))
    (tmp_path / "units").write_text("a\nb\n")
    with open(tmp_path / "lab", "w") as f:
        for i in range(15):
            f.write(f"u{i:02d} a b a\n")
    cfg = Config()
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, scp, str(tmp_path / "lab"), cfg)
    host = SpeechDataLoader(ds, 4, shuffle=True, num_buckets=2, seed=9)
    pre = PrefetchLoader(
        SpeechDataLoader(ds, 4, shuffle=True, num_buckets=2, seed=9)
    )
    for epoch in (0, 1):
        host.set_epoch(epoch)
        pre.set_epoch(epoch)
        hb, pb = list(host), list(pre)
        assert len(hb) == len(pb)
        for h, p in zip(hb, pb):
            np.testing.assert_array_equal(h.feats, np.asarray(p.feats))
            np.testing.assert_array_equal(h.labels, np.asarray(p.labels))
            np.testing.assert_array_equal(h.input_lengths,
                                          np.asarray(p.input_lengths))
            np.testing.assert_array_equal(h.input_frac, np.asarray(p.input_frac))
            np.testing.assert_array_equal(h.example_mask,
                                          np.asarray(p.example_mask))
            assert h.utts == p.utts
            # EVERY tensor field must arrive as a committed device array —
            # a host field would force a per-step reshard inside jit
            import jax

            for field in ("feats", "labels", "input_frac", "input_lengths",
                          "label_lengths", "example_mask"):
                assert isinstance(getattr(p, field), jax.Array), field


def test_device_cache_under_mesh():
    """Mesh mode: replicated buckets, batch gathers sharded over 'data'."""
    import jax

    from ctc_pytorch_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.RandomState(3)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        ark, scp = os.path.join(td, "f.ark"), os.path.join(td, "f.scp")
        with ArkWriter(ark, scp) as w:
            for i in range(19):
                w.write(f"u{i:02d}",
                        rng.randn(16 + rng.randint(30), 5).astype(np.float32))
        open(os.path.join(td, "units"), "w").write("a\nb\n")
        with open(os.path.join(td, "lab"), "w") as f:
            for i in range(19):
                f.write(f"u{i:02d} a b a\n")
        cfg = Config()
        cfg.left_ctx = cfg.right_ctx = 0
        cfg.n_skip_frame = cfg.n_downsample = 1
        vocab = Vocab(os.path.join(td, "units"))
        ds = SpeechDataset(vocab, scp, os.path.join(td, "lab"), cfg)
        mesh = make_mesh()
        host = SpeechDataLoader(ds, 8, shuffle=True, num_buckets=2, seed=5)
        dev = DeviceCachedLoader(
            SpeechDataLoader(ds, 8, shuffle=True, num_buckets=2, seed=5),
            mesh=mesh,
        )
        for h, d in zip(host, dev):
            np.testing.assert_array_equal(h.feats, np.asarray(d.feats))
            np.testing.assert_array_equal(h.labels, np.asarray(d.labels))
            # the gathered batch is sharded over the data axis
            shard_devs = {s.device for s in d.feats.addressable_shards}
            assert len(shard_devs) == 8
