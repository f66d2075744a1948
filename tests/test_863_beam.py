"""863 syllable-level beam decode (VERDICT r2 item 7 / BASELINE config #4).

Trains the 863-shaped recipe (spectrum features, GRU, explicit num_class)
on a small Mandarin-syllable corpus, trains a syllable bigram LM, and
decodes with the LM-fused beam at width 20 through all three search
implementations — python, C++ (when built), and BeamDevice — asserting
they agree with each other and score sanely.  Reference path:
``my_863_corpus/steps/test.py:64-67`` + ``BeamSearch.py``.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def test_863_syllable_beam_decode(tmp_path):
    from tools.soak_863 import mandarin_syllables

    from ctc_pytorch_tpu.cli import train as train_cli
    from ctc_pytorch_tpu.cli.test import evaluate
    from ctc_pytorch_tpu.config import load_config
    from ctc_pytorch_tpu.decode.ngram_lm import train_bigram_lm
    from tools.parity.gen_corpus import generate

    data = tmp_path / "data"
    units = mandarin_syllables(16)
    generate(data, n_train=48, n_dev=8, n_test=8, dim=24,
             unit_names=units, feat_name="spectrum", text_name="text",
             min_phones=3, max_phones=7, min_dur=3, max_dur=6, seed=7)
    lm_path = data / "lm_syllable_bg.arpa"
    train_bigram_lm(
        (l.split(" ", 1)[1] for l in
         (data / "train" / "text").read_text().splitlines()),
        lm_path,
    )

    conf = tmp_path / "syl.conf"
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
n_feats = 24
left_ctx = 0
right_ctx = 0
n_skip_frame = 1
n_downsample = 1

[Model]
rnn_input_size = 24
rnn_hidden_size = 16
rnn_layers = 1
rnn_type = nn.GRU
bidirectional = True
batch_norm = True
num_class = 17
drop_out = 0

[Training]
exp_name = syl_beam
checkpoint_dir = {tmp_path}/ckpt
init_lr = 0.008
num_epoches = 10
least_train_epoch = 1
end_adjust_acc = 1.5
lr_decay = 0.5
batch_size = 8
weight_decay = 0.0
scheduler_mode = acc
grad_clip = 400
seed = 1
verbose_step = 50
num_buckets = 1
dtype = float32
log_dir = {tmp_path}/log
decode_type = BeamDevice
beam_width = 20
lm_alpha = 0.1
lm_path = {lm_path}
""")
    best = train_cli.main(["--conf", str(conf)])
    assert best.exists()

    decoded = {}
    scores = {}
    for name, overrides in (
        ("device", {"decode_type": "BeamDevice"}),
        ("python", {"decode_type": "Beam", "beam_use_native": False}),
        ("native", {"decode_type": "Beam", "beam_use_native": True}),
    ):
        cfg = load_config(conf)
        for k, v in overrides.items():
            setattr(cfg, k, v)
        lines = []
        res = evaluate(cfg, str(best), verbose=True, log=lines.append)
        decoded[name] = [l.split(":", 1)[1].strip()
                        for l in lines if l.startswith("decoded")]
        scores[name] = res
        assert np.isfinite(res["cer"]) and np.isfinite(res["wer"])

    # the three searches implement the same scoring rules — strings agree
    assert decoded["python"] == decoded["native"], (decoded, scores)
    assert decoded["python"] == decoded["device"], (decoded, scores)
    assert scores["python"]["wer"] == scores["device"]["wer"]
