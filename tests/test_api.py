"""Recognizer API: package -> transcripts over raw audio."""

import numpy as np

import jax

from ctc_pytorch_tpu.api import Recognizer
from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.frontend.e2e import WaveFrontendSpec
from ctc_pytorch_tpu.frontend.features import FrontendConfig
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train.checkpoint import save_package
from ctc_pytorch_tpu.train.state import TrainState
from ctc_pytorch_tpu.vocab import Vocab
from ctc_pytorch_tpu.data.prep.sphere import write_wav


def _mini_package(tmp_path, fe):
    cfg = Config()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.rnn_input_size = fe.feature_dim()
    cfg.rnn_hidden_size = 8
    cfg.rnn_layers = 1
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    spec = ModelSpec.from_config(cfg, num_class=4)
    params, mstate = CTCModel.init(jax.random.PRNGKey(0), spec)
    import jax.numpy as jnp

    state = TrainState(jnp.zeros((), jnp.int32), params, mstate, ())
    path = tmp_path / "model.npz"
    save_package(path, spec, state)
    return path


def test_recognizer_end_to_end(tmp_path):
    fe = WaveFrontendSpec(
        frontend=FrontendConfig(num_mel_bins=12), left_ctx=0, right_ctx=0,
        n_skip_frame=1,
    )
    pkg = _mini_package(tmp_path, fe)
    vocab = Vocab.from_units(["aa", "bb"])
    rec = Recognizer(pkg, vocab, frontend=fe)
    rng = np.random.RandomState(0)
    wav = (rng.randn(8000) * 500).astype(np.float32)
    out = rec.recognize(wav)
    assert isinstance(out, list) and len(out) == 1
    # batch of mixed lengths + file input
    p = tmp_path / "x.wav"
    write_wav(p, (rng.randn(4000) * 500).astype(np.int16))
    out2 = rec.recognize([wav, p])
    assert len(out2) == 2
    for s in out2:
        for tok in s.split():
            assert tok in ("aa", "bb", "UNK")


def test_recognizer_mesh_matches_single_device(tmp_path):
    """Recognizer(mesh=...) shards the batch over the 8-device data axis
    (shard_map'd frontend+model, replicated params) and must transcribe
    identically to the single-device path, uneven batch included."""
    from ctc_pytorch_tpu.parallel import make_mesh

    fe = WaveFrontendSpec(
        frontend=FrontendConfig(num_mel_bins=12), left_ctx=0, right_ctx=0,
        n_skip_frame=1,
    )
    pkg = _mini_package(tmp_path, fe)
    vocab = Vocab.from_units(["aa", "bb"])
    rng = np.random.RandomState(3)
    wavs = [(rng.randn(n) * 500).astype(np.float32)
            for n in (8000, 5000, 6500)]  # 3 % 8 != 0: exercises padding
    ref = Recognizer(pkg, vocab, frontend=fe).recognize(wavs)
    mesh = make_mesh(jax.devices()[:8])
    got = Recognizer(pkg, vocab, frontend=fe, mesh=mesh).recognize(wavs)
    assert got == ref


def test_streaming_recognizer_over_mesh(tmp_path):
    """Streaming over a mesh Recognizer: the 1-utt window is replicated to
    one row per device (regression: B=1 used to violate the shard_map
    in_specs) and must transcribe identically to single-device streaming."""
    from ctc_pytorch_tpu.api import StreamingRecognizer
    from ctc_pytorch_tpu.parallel import make_mesh

    fe = WaveFrontendSpec(
        frontend=FrontendConfig(num_mel_bins=12), left_ctx=0, right_ctx=0,
        n_skip_frame=1,
    )
    pkg = _mini_package(tmp_path, fe)
    vocab = Vocab.from_units(["aa", "bb"])
    rng = np.random.RandomState(7)
    wav = (rng.randn(9000) * 500).astype(np.float32)

    outs = []
    for mesh in (None, make_mesh(jax.devices()[:8])):
        rec = Recognizer(pkg, vocab, frontend=fe, mesh=mesh)
        sr = StreamingRecognizer(rec, window_seconds=4.0, hop_seconds=0.2,
                                 lookahead_seconds=0.2)
        for start in range(0, len(wav), 1600):
            sr.feed(wav[start:start + 1600])
        outs.append(sr.finish())
    assert outs[0] == outs[1]


def test_streaming_recognizer_matches_batch(tmp_path):
    """feed() in chunks + finish() == one-shot recognize on short audio."""
    from ctc_pytorch_tpu.api import StreamingRecognizer

    fe = WaveFrontendSpec(
        frontend=FrontendConfig(num_mel_bins=12), left_ctx=0, right_ctx=0,
        n_skip_frame=1,
    )
    pkg = _mini_package(tmp_path, fe)
    vocab = Vocab.from_units(["aa", "bb"])
    rec = Recognizer(pkg, vocab, frontend=fe)
    rng = np.random.RandomState(3)
    wav = (rng.randn(12000) * 500).astype(np.float32)

    sr = StreamingRecognizer(rec, window_seconds=4.0, hop_seconds=0.2,
                             lookahead_seconds=0.2)
    partials = []
    for start in range(0, len(wav), 1600):
        partials.append(sr.feed(wav[start:start + 1600]))
    final = sr.finish()
    # audio never exceeded the window -> final must equal batch recognize
    # on the same (bucket-padded) signal
    n = 1 << int(np.ceil(np.log2(len(wav))))
    batch = rec.recognize(wav, pad_multiple=n)[0]
    assert final == batch
    # committed prefixes never retract
    sr2 = StreamingRecognizer(rec, window_seconds=4.0, hop_seconds=0.2,
                              lookahead_seconds=0.2)
    prev_committed = []
    for start in range(0, len(wav), 3200):
        sr2.feed(wav[start:start + 3200])
        cur = list(sr2._committed)
        assert cur[: len(prev_committed)] == prev_committed
        prev_committed = cur


def test_streaming_recognizer_long_stream(tmp_path):
    """Stream longer than the window: finish() returns without error,
    keeps the committed prefix, and the host buffer stays bounded."""
    from ctc_pytorch_tpu.api import StreamingRecognizer

    fe = WaveFrontendSpec(
        frontend=FrontendConfig(num_mel_bins=12), left_ctx=0, right_ctx=0,
        n_skip_frame=1,
    )
    pkg = _mini_package(tmp_path, fe)
    vocab = Vocab.from_units(["aa", "bb"])
    rec = Recognizer(pkg, vocab, frontend=fe)
    rng = np.random.RandomState(5)
    sr = StreamingRecognizer(rec, window_seconds=1.0, hop_seconds=0.25,
                             lookahead_seconds=0.1)
    for _ in range(10):
        sr.feed((rng.randn(4000) * 500).astype(np.float32))
    # the ring buffer is trimmed to the window; _buf_start tracks the cut
    assert len(sr._buf) <= sr.window
    assert sr._buf_start + len(sr._buf) == 40000
    committed_before = list(sr._committed)
    out = sr.finish()
    assert isinstance(out, str)
    assert out.split()[: len(committed_before)] == committed_before


def test_streaming_commit_no_drop_no_dup(tmp_path):
    """Long-stream commit correctness, exact: a fake forward emits one
    token per 10 ms frame whose label depends only on the token's ABSOLUTE
    stream position (encoded in a sample ramp), so any windowed-commit
    drop or duplication changes the output string.  Guards the regression
    where tokens sliding out of the window were sliced against a
    whole-stream committed list (api.py commit logic)."""
    from ctc_pytorch_tpu.api import StreamingRecognizer

    fe = WaveFrontendSpec(
        frontend=FrontendConfig(num_mel_bins=12), left_ctx=0, right_ctx=0,
        n_skip_frame=1,
    )
    pkg = _mini_package(tmp_path, fe)
    vocab = Vocab.from_units(["aa", "bb"])
    rec = Recognizer(pkg, vocab, frontend=fe)

    hop_samples = 160  # one output frame per 10 ms

    def fake_forward(params, mstate, wavs, lengths):
        wav = np.asarray(wavs)[0]
        n_valid = int(np.asarray(lengths)[0])
        abs0 = int(round(float(wav[0])))  # ramp encodes absolute position
        t_out = max(n_valid // hop_samples, 1)
        lp = np.full((t_out, 1, 4), -10.0, np.float32)
        for i in range(t_out):
            abs_frame = abs0 // hop_samples + i
            lp[i, 0, 2 + (abs_frame % 2)] = 0.0  # alternate aa/bb
        import jax.numpy as jnp

        return jnp.asarray(lp), jnp.asarray([t_out], np.int32)

    rec._forward = fake_forward
    sr = StreamingRecognizer(rec, window_seconds=1.0, hop_seconds=0.25,
                             lookahead_seconds=0.05)
    total = 64000  # 4 s: 4x the window
    ramp = np.arange(total, dtype=np.float32)
    for start in range(0, total, 2000):
        sr.feed(ramp[start:start + 2000])
    out = sr.finish().split()
    n_frames = total // hop_samples
    expected = [("aa", "bb")[i % 2] for i in range(n_frames)]
    assert out == expected
