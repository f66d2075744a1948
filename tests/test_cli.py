"""CLI smoke tests: orchestrator stages, vocab multi-column parity, dither."""

import numpy as np

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


def test_dither_changes_features_deterministically():
    w = (np.random.RandomState(0).randn(4000) * 500).astype(np.float32)
    f0 = np.asarray(fbank(w, FrontendConfig(dither=0.0)))
    f1 = np.asarray(fbank(w, FrontendConfig(dither=1.0, dither_seed=1)))
    f1b = np.asarray(fbank(w, FrontendConfig(dither=1.0, dither_seed=1)))
    f2 = np.asarray(fbank(w, FrontendConfig(dither=1.0, dither_seed=2)))
    assert not np.allclose(f0, f1)
    np.testing.assert_array_equal(f1, f1b)  # deterministic per seed
    assert not np.allclose(f1, f2)
