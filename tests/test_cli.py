"""CLI smoke tests: orchestrator stages, vocab multi-column parity, dither."""

import numpy as np
import pytest

from ctc_pytorch_tpu.cli import run as run_cli
from ctc_pytorch_tpu.frontend import FrontendConfig, fbank
from ctc_pytorch_tpu.vocab import Vocab
from tests.test_prep import _fake_timit


def test_run_stages_0_1(tmp_path):
    _fake_timit(tmp_path / "timit")
    run_cli.main([
        "--timit", str(tmp_path / "timit"), "--data", str(tmp_path / "data"),
        "--stage", "0", "--stop-stage", "1", "--feat", "fbank",
    ])
    assert (tmp_path / "data" / "units").exists()
    assert (tmp_path / "data" / "train" / "fbank.scp").exists()
    assert (tmp_path / "data" / "global_fbank_cmvn.npz").exists()


def test_vocab_multicolumn_lines(tmp_path):
    # reference read_lang adds fields[1:] of multi-column lines
    p = tmp_path / "units"
    p.write_text("w1 aa bb\ncc\n")
    v = Vocab(p)
    assert "aa" in v and "bb" in v and "cc" in v
    assert "w1" not in v
    assert v.word2index["aa"] == 2


@pytest.mark.slow
def test_waveform_train_then_decode_cli(tmp_path):
    """Stage 2 -> stage 4 roundtrip for feature_type=waveform packages.

    Regression: cli.test used to feed raw padded samples straight into the
    model (no step-fused frontend), crashing on any waveform-trained
    package."""
    from ctc_pytorch_tpu.cli import test as test_cli
    from ctc_pytorch_tpu.cli import train as train_cli
    from ctc_pytorch_tpu.config import Config
    from ctc_pytorch_tpu.data.prep.sphere import write_wav
    from ctc_pytorch_tpu.frontend.e2e import WaveFrontendSpec

    rng = np.random.RandomState(0)
    units = ["aa", "bb", "cc"]
    (tmp_path / "units").write_text("".join(u + "\n" for u in units))
    for split, n in (("train", 8), ("dev", 4), ("test", 4)):
        d = tmp_path / split
        d.mkdir()
        scp, lab = [], []
        for i in range(n):
            labs = [units[rng.randint(3)] for _ in range(2)]
            # tone-coded so 2 epochs at least run stably (not asserted on PER)
            s = np.concatenate([
                (500 * np.sin(2 * np.pi * (400 + 300 * units.index(l))
                              * np.arange(3200) / 16000.0)
                 + 30 * rng.randn(3200)) for l in labs
            ])
            write_wav(d / f"u{i}.wav", s.astype(np.int16))
            scp.append(f"{split}u{i} {d / f'u{i}.wav'}\n")
            lab.append(f"{split}u{i} {' '.join(labs)}\n")
        (d / "wav.scp").write_text("".join(scp))
        (d / "phn_text").write_text("".join(lab))

    fe = WaveFrontendSpec(frontend=FrontendConfig(num_mel_bins=12),
                          left_ctx=0, right_ctx=1, n_skip_frame=2)
    cfg = Config()
    cfg.exp_name = "wavtest"
    cfg.data_dir = str(tmp_path)
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.feature_type = "waveform"
    cfg.feature_dim = 13  # 12 mel + energy
    cfg.left_ctx, cfg.right_ctx = fe.left_ctx, fe.right_ctx
    cfg.n_skip_frame, cfg.n_downsample = fe.n_skip_frame, 1
    cfg.rnn_input_size = fe.feature_dim()
    cfg.rnn_hidden_size = 16
    cfg.rnn_layers = 1
    cfg.cnn.add_cnn = False
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    cfg.num_epoches = 2
    cfg.num_buckets = 1
    cfg.batch_size = 4
    cfg.device_cache = False
    cfg.vocab_file = str(tmp_path / "units")
    for split in ("train", "valid", "test"):
        d = "dev" if split == "valid" else split
        setattr(cfg, f"{split}_scp_path", str(tmp_path / d / "wav.scp"))
        setattr(cfg, f"{split}_lab_path", str(tmp_path / d / "phn_text"))
    cfg.decode_type = "Greedy"
    conf = tmp_path / "conf.yaml"
    cfg.to_yaml(conf)

    best = train_cli.main(["--conf", str(conf)])
    res = test_cli.evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    assert np.isfinite(res["cer"]) and np.isfinite(res["wer"])


def test_dither_changes_features_deterministically():
    w = (np.random.RandomState(0).randn(4000) * 500).astype(np.float32)
    f0 = np.asarray(fbank(w, FrontendConfig(dither=0.0)))
    f1 = np.asarray(fbank(w, FrontendConfig(dither=1.0, dither_seed=1)))
    f1b = np.asarray(fbank(w, FrontendConfig(dither=1.0, dither_seed=1)))
    f2 = np.asarray(fbank(w, FrontendConfig(dither=1.0, dither_seed=2)))
    assert not np.allclose(f0, f1)
    np.testing.assert_array_equal(f1, f1b)  # deterministic per seed
    assert not np.allclose(f1, f2)
