"""Waveform-in configuration through the dataset + cli/train path."""

import pytest

import numpy as np

from ctc_pytorch_tpu.cli import train as train_cli
from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.data import SpeechDataLoader, SpeechDataset
from ctc_pytorch_tpu.data.prep.sphere import write_wav
from ctc_pytorch_tpu.vocab import Vocab


def _wav_corpus(data, n=6, seed=0):
    rng = np.random.RandomState(seed)
    data.mkdir(parents=True, exist_ok=True)
    units = ["aa", "bb"]
    (data / "units").write_text("\n".join(units) + "\n")
    for split, count in [("train", n), ("dev", 2)]:
        d = data / split
        d.mkdir(exist_ok=True)
        with open(d / "wav.scp", "w") as scp, open(d / "text", "w") as lab:
            for i in range(count):
                labels = rng.choice(units, size=2)
                wav = (rng.randn(4800) * 300).astype(np.float64)
                t = np.arange(4800) / 16000.0
                for j, u in enumerate(labels):
                    seg = slice(j * 2400, (j + 1) * 2400)
                    wav[seg] += 3000 * np.sin(
                        2 * np.pi * (400 + 600 * units.index(u)) * t[seg]
                    )
                utt = f"{split}{i}"
                write_wav(d / f"{utt}.wav", wav.astype(np.int16))
                scp.write(f"{utt} {d / f'{utt}.wav'}\n")
                lab.write(f"{utt} {' '.join(labels)}\n")


def test_waveform_dataset_items(tmp_path):
    data = tmp_path / "data"
    _wav_corpus(data)
    cfg = Config()
    cfg.feature_type = "waveform"
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    vocab = Vocab(data / "units")
    ds = SpeechDataset(vocab, data / "train" / "wav.scp",
                       data / "train" / "text", cfg)
    feat, label, utt = ds[0]
    assert feat.shape == (4800, 1)
    assert ds.lengths()[0] == 4800
    loader = SpeechDataLoader(ds, 2, num_buckets=1)
    batch = next(iter(loader))
    assert batch.feats.shape[2] == 1
    assert (batch.input_lengths == 4800).all()


@pytest.mark.slow
def test_waveform_cli_train(tmp_path):
    data = tmp_path / "data"
    _wav_corpus(data)
    conf = tmp_path / "wave.yaml"
    conf.write_text(f"""
exp_name: 'wave_e2e'
checkpoint_dir: '{tmp_path}/ckpt'
vocab_file: '{data}/units'
train_scp_path: '{data}/train/wav.scp'
train_lab_path: '{data}/train/text'
valid_scp_path: '{data}/dev/wav.scp'
valid_lab_path: '{data}/dev/text'
data_dir: '{data}'
feature_type: "waveform"
feature_dim: 13
left_ctx: 0
right_ctx: 1
n_skip_frame: 2
n_downsample: 1
rnn_input_size: 26
rnn_hidden_size: 8
rnn_layers: 1
rnn_type: "nn.LSTM"
bidirectional: True
batch_norm: True
drop_out: 0.0
add_cnn: False
init_lr: 0.005
num_epoches: 1
batch_size: 2
num_buckets: 1
dtype: "float32"
seed: 1
""")
    best = train_cli.main(["--conf", str(conf)])
    assert best.exists()
