"""863-recipe end-to-end: INI config -> cli/train.main -> evaluate.

Exercises the legacy path: spectrum features (text-ark converted), explicit
num_class (+1 blank), accuracy-keyed scheduler with warmup, grad clipping,
rotating file logs, and the config_used.yaml rewrite with the best path.
"""

import pytest

import numpy as np

from ctc_pytorch_tpu.cli import train as train_cli
from ctc_pytorch_tpu.cli.test import evaluate
from ctc_pytorch_tpu.config import load_config
from ctc_pytorch_tpu.data.convert import text_ark_to_binary
from ctc_pytorch_tpu.data.kaldi_io import ArkWriter


def _make_863_data(data, n_utts=8, dim=20, n_class=4, seed=0):
    rng = np.random.RandomState(seed)
    data.mkdir(parents=True, exist_ok=True)
    units = [f"sy{i}" for i in range(n_class)]
    (data / "units").write_text("\n".join(units) + "\n")
    for split, n in [("train", n_utts), ("dev", 4), ("test", 4)]:
        d = data / split
        d.mkdir(exist_ok=True)
        with ArkWriter(d / "spectrum.ark", d / "spectrum.scp") as w, \
                open(d / "text", "w") as lab:
            for i in range(n):
                labels = rng.choice(units, size=3)
                t = rng.randint(18, 30)
                feat = rng.randn(t, dim).astype(np.float32) * 0.1
                for j, u in enumerate(labels):
                    feat[j * 6 : j * 6 + 6, units.index(u) * 4] += 2.0
                utt = f"{split}{i:02d}"
                w.write(utt, feat)
                lab.write(f"{utt} {' '.join(labels)}\n")
    return units


@pytest.mark.slow
def test_863_ini_training_e2e(tmp_path):
    data = tmp_path / "data"
    units = _make_863_data(data, dim=20, n_class=4)
    conf = tmp_path / "lstm_ctc.conf"
    conf.write_text(f"""
[Data]
dataset = 863_corpus
vocab_file = {data}/units
train_scp_path = {data}/train/spectrum.scp
train_lab_path = {data}/train/text
valid_scp_path = {data}/dev/spectrum.scp
valid_lab_path = {data}/dev/text
test_scp_path = {data}/test/spectrum.scp
test_lab_path = {data}/test/text
feature_type = spectrum
n_feats = 20
left_ctx = 0
right_ctx = 0
n_skip_frame = 1
n_downsample = 1

[Model]
rnn_input_size = 20
rnn_hidden_size = 12
rnn_layers = 1
rnn_type = nn.GRU
bidirectional = True
batch_norm = True
num_class = 5
drop_out = 0

[Training]
exp_name = lstm_ctc_863
checkpoint_dir = {tmp_path}/ckpt
init_lr = 0.005
num_epoches = 2
least_train_epoch = 1
end_adjust_acc = 1.5
lr_decay = 0.5
batch_size = 4
weight_decay = 0.005
scheduler_mode = acc
grad_clip = 400
seed = 1
verbose_step = 2
num_buckets = 1
dtype = float32
log_dir = {tmp_path}/log
decode_type = Greedy
""")
    best = train_cli.main(["--conf", str(conf)])
    assert best.exists()
    # rotating file log written (863's init_logger behavior)
    assert any((tmp_path / "log").glob("*.log"))
    # config snapshot carries the best-model path (cnn_lstm_ctc.py:257-258)
    used = load_config(tmp_path / "ckpt" / "lstm_ctc_863" / "config_used.yaml")
    assert used.model_file == str(best)
    # num_class semantics: 5 units + blank = 6 outputs
    from ctc_pytorch_tpu.train.checkpoint import model_from_package

    spec, _, _, _ = model_from_package(best)
    assert spec.num_class == 6
    assert spec.rnn_cell == "gru"
    # stage-4 decode on the package
    cfg = load_config(conf)
    res = evaluate(cfg, str(best), verbose=False, log=lambda *a: None)
    assert np.isfinite(res["cer"]) and np.isfinite(res["wer"])
