"""End-to-end pipeline integration test on a synthetic mini-corpus:
prep -> features+CMVN -> train -> LM -> greedy & beam decode.
Mirrors run.sh stages 0-4 on fake TIMIT data."""

import numpy as np
import pytest

from ctc_pytorch_tpu.cli import make_feat, train_lm
from ctc_pytorch_tpu.cli.test import evaluate
from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.data import SpeechDataLoader, SpeechDataset
from ctc_pytorch_tpu.data.prep import prepare_timit
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train import Trainer
from ctc_pytorch_tpu.vocab import Vocab
from tests.test_prep import _write_sphere


def _fake_corpus(root, n_per_spk=3):
    """Speakers across train + dev/test; tone-coded phone 'words'."""
    rng = np.random.RandomState(0)
    # train speakers + one dev speaker (faks0) + one test speaker (mdab0)
    layout = [("train", "fabc0"), ("train", "mdef0"), ("train", "fghi0"),
              ("test", "faks0"), ("test", "mdab0")]
    for split, spk in layout:
        d = root / split / "dr1" / spk
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per_spk):
            sent = f"si{100 + i}"
            # 0.5 s of noise
            samples = (rng.randn(8000) * 500).astype(np.int16)
            _write_sphere(d / f"{sent}.wav", samples)
            phones = rng.choice(["sh", "ih", "k"], size=4)
            lines = [
                f"{j * 2000} {(j + 1) * 2000} {ph}"
                for j, ph in enumerate(phones)
            ]
            (d / f"{sent}.phn").write_text("\n".join(lines) + "\n")
            (d / f"{sent}.wrd").write_text("0 8000 word\n")


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    corpus = tmp_path / "timit"
    data = tmp_path / "data"
    _fake_corpus(corpus)

    # stage 0: prep
    counts = prepare_timit(corpus, data, "60-39")
    assert counts["train"] == 9 and counts["dev"] == 3 and counts["test"] == 3
    units = (data / "units").read_text().split()
    assert units == ["ih", "k", "sh"]

    # stage 1: features + global CMVN
    make_feat.main(["fbank", str(data), "--num-mel-bins", "12",
                    "--splits", "train", "dev", "test"])
    assert (data / "train" / "fbank.scp").exists()
    assert (data / "global_fbank_cmvn.npz").exists()
    # train features are globally variance-normalised
    from ctc_pytorch_tpu.data.kaldi_io import iter_ark

    all_feats = np.vstack([m for _, m in iter_ark(data / "train" / "fbank.ark")])
    np.testing.assert_allclose(all_feats.mean(axis=0), 0.0, atol=1e-3)
    np.testing.assert_allclose(all_feats.std(axis=0), 1.0, atol=1e-2)

    # stage 2: train a tiny model for 2 epochs
    cfg = Config()
    cfg.vocab_file = str(data / "units")
    cfg.train_scp_path = str(data / "train" / "fbank.scp")
    cfg.train_lab_path = str(data / "train" / "phn_text")
    cfg.valid_scp_path = str(data / "dev" / "fbank.scp")
    cfg.valid_lab_path = str(data / "dev" / "phn_text")
    cfg.test_scp_path = str(data / "test" / "fbank.scp")
    cfg.test_lab_path = str(data / "test" / "phn_text")
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.feature_dim = 13  # 12 mel + energy
    cfg.left_ctx, cfg.right_ctx = 0, 1
    cfg.n_skip_frame, cfg.n_downsample = 1, 1
    cfg.rnn_input_size = 26
    cfg.rnn_hidden_size = 16
    cfg.rnn_layers = 1
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    cfg.batch_size = 4
    cfg.num_buckets = 1
    cfg.lm_path = str(data / "lm_phone_bg.arpa")

    vocab = Vocab(cfg.vocab_file)
    assert vocab.n_words == 5
    train_ds = SpeechDataset(vocab, cfg.train_scp_path, cfg.train_lab_path, cfg)
    dev_ds = SpeechDataset(vocab, cfg.valid_scp_path, cfg.valid_lab_path, cfg)
    spec = ModelSpec.from_config(cfg, num_class=vocab.n_words)
    trainer = Trainer(cfg, spec)
    best = trainer.fit(
        SpeechDataLoader(train_ds, 4, num_buckets=1),
        SpeechDataLoader(dev_ds, 4, num_buckets=1, shuffle=False),
        num_epoches=2, log=lambda *a: None,
    )
    assert best.exists()

    # stage 3: LM
    train_lm.main([str(data)])
    assert (data / "lm_phone_bg.arpa").exists()

    # stage 4: greedy + beam decode run end-to-end and report metrics
    cfg.decode_type = "Greedy"
    res_g = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    assert np.isfinite(res_g["cer"]) and np.isfinite(res_g["wer"])
    cfg.decode_type = "Beam"
    cfg.beam_width = 4
    res_b = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    assert np.isfinite(res_b["wer"])
