"""Fused stage-4 decode (decode/fused.py) equals the streaming decode.

The fused path must change dispatch granularity ONLY: per-utterance
decoded strings — greedy and on-device beam — must match what the
streaming per-batch loop produces (``test_ctc.py:69-112`` contract).
"""

import jax
import numpy as np
import pytest

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.data.batching import DeviceCachedLoader, SpeechDataLoader
from ctc_pytorch_tpu.data.dataset import SpeechDataset
from ctc_pytorch_tpu.data.kaldi_io import ArkWriter
from ctc_pytorch_tpu.decode import BeamDecoder, GreedyDecoder
from ctc_pytorch_tpu.decode.fused import make_fused_decode_fn
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.vocab import Vocab

import jax.numpy as jnp


def _setup(tmp_path, n_utts=19, dim=7, add_cnn=False):
    rng = np.random.RandomState(0)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with ArkWriter(ark, scp) as w:
        for i in range(n_utts):
            w.write(f"u{i:02d}",
                    rng.randn(20 + rng.randint(40), dim).astype(np.float32))
    (tmp_path / "units").write_text("a\nb\nc\n")
    with open(tmp_path / "lab", "w") as f:
        for i in range(n_utts):
            f.write(f"u{i:02d} " + " ".join(rng.choice(["a", "b", "c"], 4))
                    + "\n")
    cfg = Config()
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    cfg.feature_dim = dim
    cfg.rnn_input_size = dim
    cfg.rnn_hidden_size = 8
    cfg.rnn_layers = 1
    if add_cnn:
        # time stride 2: the fused path must reproduce the streaming
        # int(frac * T_out(t_pad)) length arithmetic through the conv.
        # rnn_input_size stays the PRE-conv feature dim — the model
        # derives the post-conv size itself (reference contract,
        # model_ctc.py:111).
        cfg.n_downsample = 2
        cfg.cnn = CNNConfig(
            add_cnn=True, layers=1, channel=[(1, 4)],
            kernel_size=[(3, 3)], stride=[(2, 2)], padding=[(1, 1)],
            pooling=None,
        )
    else:
        cfg.cnn = CNNConfig(add_cnn=False)
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, scp, str(tmp_path / "lab"), cfg)
    spec = ModelSpec.from_config(cfg, num_class=vocab.n_words)
    params, mstate = CTCModel.init(jax.random.PRNGKey(0), spec)
    return cfg, vocab, ds, spec, params, mstate


def _streaming_strings(spec, params, mstate, loader, decode_one):
    """utt -> decoded string via the per-batch streaming loop."""
    out = {}
    for batch in loader:
        lp, _ = CTCModel.apply(spec, params, mstate,
                               jnp.asarray(batch.feats),
                               frac=jnp.asarray(batch.input_frac))
        sizes = (batch.input_frac * lp.shape[0]).astype(np.int32)
        hyps = decode_one(lp, sizes)
        for i, utt in enumerate(batch.utts):
            if batch.example_mask[i]:
                out[utt] = hyps[i]
    return out


def _fused_strings(fused, cached, to_str):
    out = {}
    for arrs, pos, mask, t_pad, idx in cached.epoch_groups(
        0, with_indices=True
    ):
        tokens, lens = fused(arrs, pos, t_pad)
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        for bi in range(pos.shape[0]):
            for i in range(pos.shape[1]):
                if mask[bi, i]:
                    out[cached._utts[int(idx[bi, i])]] = to_str(
                        tokens[bi, i], int(lens[bi, i])
                    )
    return out


@pytest.mark.parametrize("mode,add_cnn", [
    ("bucket", False),
    ("quantized", False),
    # one CNN case stays fast (quantized = the shipped default mode);
    # the bucket twin compiles a second conv program -> slow tier
    ("quantized", True),
    pytest.param("bucket", True, marks=pytest.mark.slow),
])
def test_fused_greedy_equals_streaming(tmp_path, mode, add_cnn):
    cfg, vocab, ds, spec, params, mstate = _setup(tmp_path, add_cnn=add_cnn)
    mk = lambda: SpeechDataLoader(ds, 4, shuffle=False, num_buckets=3,
                                  mode=mode)
    g = GreedyDecoder(vocab.index2word)
    want = _streaming_strings(spec, params, mstate, mk(), g.decode)
    fused = make_fused_decode_fn(spec, params, mstate, mode="greedy")
    got = _fused_strings(fused, DeviceCachedLoader(mk()), g.scorer.to_string)
    assert got == want and len(got) == len(ds)


def test_fused_beam_equals_streaming(tmp_path):
    from ctc_pytorch_tpu.decode.ngram_lm import train_bigram_lm

    cfg, vocab, ds, spec, params, mstate = _setup(tmp_path, n_utts=9)
    rng = np.random.RandomState(1)
    lm_path = str(tmp_path / "lm.arpa")
    train_bigram_lm(
        [" ".join(rng.choice(["a", "b", "c"], 5)) for _ in range(20)],
        lm_path,
    )
    bd = BeamDecoder(vocab.index2word, beam_width=4, lm_path=lm_path,
                     lm_alpha=0.1)
    mk = lambda: SpeechDataLoader(ds, 4, shuffle=False, num_buckets=2)
    want = _streaming_strings(
        spec, params, mstate, mk(),
        lambda lp, sizes: bd.decode_on_device(lp, sizes, max_len=32),
    )
    fused = make_fused_decode_fn(
        spec, params, mstate, mode="beam", beam_width=4, beam_max_len=32,
        lm_table=bd.lm_table, lm_alpha=bd.lm_alpha,
    )
    # streaming BeamDevice joins tokens WITHOUT to_string's leading space
    # (reference quirk preserved); the fused path must match it exactly
    beam_str = lambda toks, n: " ".join(
        bd.int2char[int(t)] for t in toks[:n])
    got = _fused_strings(fused, DeviceCachedLoader(mk()), beam_str)
    assert got == want and len(got) == len(ds)


def test_epoch_groups_with_indices_consistent(tmp_path):
    """idx rows map back to the same utts/positions __iter__ produces."""
    cfg, vocab, ds, spec, params, mstate = _setup(tmp_path)
    cached = DeviceCachedLoader(
        SpeechDataLoader(ds, 4, shuffle=True, num_buckets=3, seed=3)
    )
    cached.set_epoch(1)
    seen = {}
    for arrs, pos, mask, t_pad, idx in cached.epoch_groups(
        1, with_indices=True
    ):
        for bi in range(pos.shape[0]):
            for i in range(pos.shape[1]):
                if mask[bi, i]:
                    seen[cached._utts[int(idx[bi, i])]] = int(pos[bi, i])
    utts = {b_utt for b in cached for b_utt in b.utts}
    assert set(seen) == utts and len(seen) == len(ds)
