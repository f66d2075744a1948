"""863-recipe capability tests: INI configs, text-ark conversion, cached
dataset, acc-mode scheduler, hardtanh CNN variant, target flattening."""

import numpy as np

import jax

from ctc_pytorch_tpu.config import load_config
from ctc_pytorch_tpu.data.convert import CachedDataset, cache_dataset, text_ark_to_binary
from ctc_pytorch_tpu.data.kaldi_io import load_mat, read_scp
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train.scheduler import PlateauScheduler
from ctc_pytorch_tpu.utils import flatten_targets, unflatten_targets


def test_863_conf_files_load():
    cfg = load_config("recipes/my_863/lstm_ctc.conf")
    assert cfg.feature_dim == 40  # n_feats alias
    assert cfg.num_class == 66
    assert cfg.scheduler_mode == "acc"
    assert cfg.least_train_epoch == 5
    assert cfg.grad_clip == 400
    cfg2 = load_config("recipes/my_863/cnn_lstm_ctc.conf")
    assert cfg2.cnn.add_cnn is True
    assert cfg2.cnn.kernel_size == [(11, 5)]
    assert cfg2.cnn.activation_function == "hardtanh"
    # reference arithmetic: floor((201-5)/2)+1 = 99 freq bins, x16 channels
    assert cfg2.cnn.output_freq_len(201) == 99
    spec = ModelSpec.from_config(cfg2, num_class=67)
    assert spec.rnn_in_after_cnn == 99 * 16
    assert cfg.dev_over_train and cfg2.dev_over_train


def test_dev_over_train_pass(tmp_path):
    """863 parity: each epoch runs a separate eval over the TRAINING set
    and records acc*100 as training_cer_results (the reference's
    mislabeled "cer on training set", cnn_lstm_ctc.py:203-206)."""
    from ctc_pytorch_tpu.config import CNNConfig, Config
    from ctc_pytorch_tpu.data.batching import SpeechDataLoader
    from ctc_pytorch_tpu.data.dataset import SpeechDataset
    from ctc_pytorch_tpu.data.kaldi_io import ArkWriter
    from ctc_pytorch_tpu.train.checkpoint import load_package
    from ctc_pytorch_tpu.train.loop import Trainer
    from ctc_pytorch_tpu.vocab import Vocab

    rng = np.random.RandomState(0)
    with ArkWriter(str(tmp_path / "f.ark"), str(tmp_path / "f.scp")) as w:
        for i in range(8):
            w.write(f"u{i}", rng.randn(20, 7).astype(np.float32))
    (tmp_path / "units").write_text("a\nb\n")
    with open(tmp_path / "lab", "w") as f:
        for i in range(8):
            f.write(f"u{i} " + " ".join(rng.choice(["a", "b"], 3)) + "\n")
    cfg = Config()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    cfg.rnn_input_size = 7
    cfg.rnn_hidden_size = 8
    cfg.rnn_layers = 1
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    cfg.scheduler_mode = "acc"
    cfg.dev_over_train = True
    cfg.save_every = 0
    cfg.least_train_epoch = 0
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, str(tmp_path / "f.scp"),
                       str(tmp_path / "lab"), cfg)
    mk = lambda: SpeechDataLoader(ds, 4, num_buckets=1)
    tr = Trainer(cfg, ModelSpec.from_config(cfg, num_class=vocab.n_words),
                 out_dir=str(tmp_path / "out"))
    logs = []
    best = tr.fit(mk(), mk(), num_epoches=2, log=logs.append)
    assert len(tr.histories["training_cer_results"]) == 2
    assert any("cer on training set is" in l for l in logs)
    pkg = load_package(best)
    assert pkg["manifest"]["training_cer_results"] == (
        tr.histories["training_cer_results"]
    )


def test_timit_recipe_loads():
    cfg = load_config("recipes/timit/ctc_config.yaml")
    assert cfg.spliced_dim == 243
    cfg39 = load_config("recipes/timit/mfcc_39_config.yaml")
    assert cfg39.feature_dim == 39
    assert cfg39.cnn.add_cnn is False


def test_cnn_lstm_ctc_863_forward():
    """The 863 fixed-CNN architecture end to end (hardtanh, no padding)."""
    cfg = load_config("recipes/my_863/cnn_lstm_ctc.conf")
    cfg.dtype = "float32"
    cfg.rnn_hidden_size = 16
    cfg.rnn_layers = 2
    spec = ModelSpec.from_config(cfg, num_class=67)
    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)
    x = np.random.RandomState(0).randn(2, 24, 201).astype(np.float32)
    lp, _ = CTCModel.apply(spec, params, state, x)
    # time: floor((24-11)/2)+1 = 7
    assert lp.shape == (7, 2, 67)
    assert spec.output_time_len(24) == 7


def test_text_ark_conversion(tmp_path):
    p = tmp_path / "feats.txt"
    p.write_text(
        "utt1  [\n  1.0 2.0 \n  3.0 4.0 ]\nutt2  [\n  5.0 6.0 ]\n"
    )
    n = text_ark_to_binary(p, tmp_path / "f.ark", tmp_path / "f.scp")
    assert n == 2
    scp = dict(read_scp(tmp_path / "f.scp"))
    np.testing.assert_allclose(load_mat(scp["utt1"]), [[1, 2], [3, 4]])


def test_cached_dataset_roundtrip(tmp_path):
    class Tiny:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return (np.full((i + 2, 4), i, np.float32),
                    np.arange(i + 1, dtype=np.int32), f"u{i}")

    cache = cache_dataset(Tiny(), tmp_path / "cache.npz")
    ds = CachedDataset(cache)
    assert len(ds) == 3
    feat, label, utt = ds[1]
    assert feat.shape == (3, 4) and (feat == 1).all()
    assert list(label) == [0, 1]
    assert utt == "u1"
    np.testing.assert_array_equal(ds.lengths(), [2, 3, 4])
    np.testing.assert_array_equal(ds.label_lengths(), [1, 2, 3])


def test_acc_mode_scheduler_and_warmup():
    # acc mode works in PERCENT (dev() returns acc*100,
    # cnn_lstm_ctc.py:82); update() takes the fraction run_epoch returns
    s = PlateauScheduler(end_adjust_acc=1.5, mode="acc")
    # improving accuracy -> snapshot, no decay
    d = s.update(dev_loss=0.0, dev_acc=0.80)
    assert d.snapshot and not d.decay_lr
    # collapse in accuracy: 863 resets the counter, never decays here
    # (cnn_lstm_ctc.py:224-225)
    d = s.update(dev_loss=0.0, dev_acc=0.10)
    assert not d.decay_lr and not d.rollback and s.adjust_rate_count == 0
    # ten in-band epochs (within 1.5 points of best) under warmup: counter
    # saturates but no decay...
    for _ in range(10):
        d = s.update(dev_loss=0.0, dev_acc=0.801, allow_adjust=False)
    assert s.adjust_time == 0 and not d.decay_lr
    # ...and ten more with adjustment allowed -> decay + rollback
    for _ in range(10):
        d = s.update(dev_loss=0.0, dev_acc=0.801, allow_adjust=True)
    assert d.decay_lr and d.rollback
    assert s.adjust_time == 1


def test_flatten_unflatten_targets():
    labels = np.array([[1, 2, 0], [3, 0, 0], [4, 5, 6]], np.int32)
    lens = np.array([2, 1, 3])
    flat, fl = flatten_targets(labels, lens)
    np.testing.assert_array_equal(flat, [1, 2, 3, 4, 5, 6])
    back = unflatten_targets(flat, lens)
    np.testing.assert_array_equal(back, labels)
