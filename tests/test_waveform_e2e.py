"""Waveform-in end-to-end: on-device frontend fused into the train step."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.data.batching import Batch
from ctc_pytorch_tpu.frontend import FrontendConfig, fbank, make_context, skip_frames
from ctc_pytorch_tpu.frontend.e2e import (
    WaveFrontendSpec,
    build_frontend_fn,
    waveform_frontend,
)
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train.loop import make_step_fns
from ctc_pytorch_tpu.train.state import create_train_state


def _spec():
    return WaveFrontendSpec(
        feat_type="fbank",
        frontend=FrontendConfig(num_mel_bins=12, use_energy=True),
        left_ctx=0, right_ctx=1, n_skip_frame=2,
    )


def test_waveform_frontend_matches_offline_pipeline():
    fe = _spec()
    rng = np.random.RandomState(0)
    s_max = 4800
    wavs = np.zeros((2, s_max), np.float32)
    lens = np.array([4800, 3200])
    for i, l in enumerate(lens):
        wavs[i, :l] = rng.randn(l) * 500
    feats, frac, frame_len = waveform_frontend(
        fe, jnp.asarray(wavs), jnp.asarray(lens)
    )
    assert feats.shape[-1] == 13 * 2  # (12 mel + energy) x (1+right_ctx)
    # per-utterance offline path on the true-length waveform
    for i, l in enumerate(lens):
        ref = fbank(jnp.asarray(wavs[i, :l]), fe.frontend)
        ref = make_context(ref, 0, 1)
        ref = skip_frames(ref, 2)
        t_i = int(frame_len[i])
        assert t_i == ref.shape[0]
        got = np.asarray(feats[i, :t_i])
        # ALL valid frames match, boundary included: the batched splice
        # replicates each utterance's own edge (regression: it used to see
        # padded-buffer garbage as the last frames' right context)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_waveform_frontend_downsample_padding_matches_offline():
    """With n_downsample > 1 the fused frontend must mirror the offline
    path: T zero-padded to a multiple of n_downsample and each utterance's
    valid frame count rounded UP to a multiple too (dataset.process_feature;
    ref data_loader.py:106-110).  Regression: the spec silently dropped
    cfg.n_downsample."""
    fe = WaveFrontendSpec(
        feat_type="fbank",
        frontend=FrontendConfig(num_mel_bins=12, use_energy=True),
        left_ctx=0, right_ctx=1, n_skip_frame=2, n_downsample=4,
    )
    rng = np.random.RandomState(1)
    s_max = 4800
    wavs = np.zeros((2, s_max), np.float32)
    lens = np.array([4800, 3000])
    for i, l in enumerate(lens):
        wavs[i, :l] = rng.randn(l) * 500
    feats, frac, frame_len = waveform_frontend(
        fe, jnp.asarray(wavs), jnp.asarray(lens)
    )
    assert feats.shape[-2] % 4 == 0
    fl = np.asarray(frame_len)
    assert (fl % 4 == 0).all()
    for i, l in enumerate(lens):
        # offline per-utterance count: frames -> skip -> pad to multiple
        n_frames = max(0, 1 + (l - fe.frontend.frame_length)
                       // fe.frontend.frame_shift)
        n_sk = -(-n_frames // 2)
        n_pad = n_sk + (-n_sk) % 4
        assert fl[i] == min(n_pad, feats.shape[-2])
    np.testing.assert_allclose(
        np.asarray(frac), fl.astype(np.float32) / feats.shape[-2]
    )


@pytest.mark.slow
def test_waveform_training_reduces_loss():
    fe = _spec()
    cfg = Config()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.rnn_input_size = fe.feature_dim()
    cfg.rnn_hidden_size = 16
    cfg.rnn_layers = 1
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    spec = ModelSpec.from_config(cfg, num_class=4)
    state, tx = create_train_state(jax.random.PRNGKey(0), spec, 5e-3)
    fns = make_step_fns(spec, tx, frontend_fn=build_frontend_fn(fe))
    train_jit, eval_jit = fns

    rng = np.random.RandomState(1)
    b, s = 4, 4800
    wavs = rng.randn(b, s).astype(np.float32) * 300
    # plant per-label tones
    labels = rng.randint(1, 4, size=(b, 2)).astype(np.int32)
    t_axis = np.arange(s) / 16000.0
    for i in range(b):
        for j, lab in enumerate(labels[i]):
            seg = slice(j * 2400, (j + 1) * 2400)
            wavs[i, seg] += 3000 * np.sin(
                2 * np.pi * (300 + 700 * lab) * t_axis[seg]
            )
    wav_lens = jnp.asarray(np.full(b, s, np.float32))
    args = (jnp.asarray(wavs), wav_lens, jnp.asarray(labels),
            jnp.asarray(np.full(b, 2, np.int32)), jnp.ones((b,), jnp.float32))
    key = jax.random.PRNGKey(2)
    state, loss0, _, _ = train_jit(state, *args, key)
    for _ in range(25):
        state, loss, _, _ = train_jit(state, *args, key)
    assert float(loss) < float(loss0) * 0.5, (float(loss0), float(loss))
