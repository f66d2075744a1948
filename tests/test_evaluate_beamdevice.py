"""evaluate() with decode_type=BeamDevice: on-device batched beam in stage 4."""

import pytest

import numpy as np

from ctc_pytorch_tpu.cli import make_feat, train_lm
from ctc_pytorch_tpu.cli.test import evaluate
from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.data import SpeechDataLoader, SpeechDataset
from ctc_pytorch_tpu.data.prep import prepare_timit
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train import Trainer
from ctc_pytorch_tpu.vocab import Vocab
from tests.test_pipeline_e2e import _fake_corpus

pytestmark = pytest.mark.slow


def test_beamdevice_stage4(tmp_path):
    corpus, data = tmp_path / "timit", tmp_path / "data"
    _fake_corpus(corpus)
    prepare_timit(corpus, data, "60-39")
    make_feat.main(["fbank", str(data), "--num-mel-bins", "12",
                    "--splits", "train", "dev", "test"])
    train_lm.main([str(data)])

    cfg = Config()
    cfg.vocab_file = str(data / "units")
    cfg.train_scp_path = str(data / "train" / "fbank.scp")
    cfg.train_lab_path = str(data / "train" / "phn_text")
    cfg.valid_scp_path = str(data / "dev" / "fbank.scp")
    cfg.valid_lab_path = str(data / "dev" / "phn_text")
    cfg.test_scp_path = str(data / "test" / "fbank.scp")
    cfg.test_lab_path = str(data / "test" / "phn_text")
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.feature_dim = 13
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    cfg.rnn_input_size = 13
    cfg.rnn_hidden_size = 8
    cfg.rnn_layers = 1
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    cfg.batch_size = 4
    cfg.num_buckets = 1
    cfg.lm_path = str(data / "lm_phone_bg.arpa")

    vocab = Vocab(cfg.vocab_file)
    spec = ModelSpec.from_config(cfg, num_class=vocab.n_words)
    trainer = Trainer(cfg, spec)
    best = trainer.fit(
        SpeechDataLoader(
            SpeechDataset(vocab, cfg.train_scp_path, cfg.train_lab_path, cfg),
            4, num_buckets=1,
        ),
        SpeechDataLoader(
            SpeechDataset(vocab, cfg.valid_scp_path, cfg.valid_lab_path, cfg),
            4, num_buckets=1, shuffle=False,
        ),
        num_epoches=1, log=lambda *a: None,
    )

    cfg.decode_type = "BeamDevice"
    cfg.beam_width = 4
    # default path is the fused group decode (cfg.fused_decode=True)
    res_dev = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    cfg.fused_decode = False
    res_stream = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    cfg.fused_decode = True
    cfg.decode_type = "Beam"
    res_host = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    # identical decodes -> identical error rates (fused == streaming == host)
    assert res_dev["cer"] == res_host["cer"] == res_stream["cer"]
    assert res_dev["wer"] == res_host["wer"] == res_stream["wer"]

    cfg.decode_type = "Greedy"
    res_gf = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    cfg.fused_decode = False
    res_gs = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    assert res_gf["cer"] == res_gs["cer"]
    assert res_gf["wer"] == res_gs["wer"]
