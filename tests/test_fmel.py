"""F_Mel warping vs a direct transcription of tools.py:43-64."""

import math

import numpy as np

from ctc_pytorch_tpu.frontend.fmel import _slaney_mel_frequencies, f_mel


def _ref_f_mel(fre_f, sample_rate=16000, window_size=0.025):
    n_mels = fre_f.shape[1]
    mel_bin = _slaney_mel_frequencies(n_mels, 0, sample_rate / 2) * window_size
    out = []
    for frame in fre_f.tolist():
        row = []
        for i in range(n_mels):
            left = int(math.floor(mel_bin[i]))
            right = left + 1
            tmp = (frame[right] - frame[left]) * (mel_bin[i] - left) + frame[left]
            row.append(tmp)
        out.append(row)
    return np.asarray(out, np.float32)


def test_f_mel_matches_reference_loop():
    rng = np.random.RandomState(0)
    spec = rng.randn(6, 201).astype(np.float32)
    ours = np.asarray(f_mel(spec))
    ref = _ref_f_mel(spec)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_slaney_frequencies_shape():
    f = _slaney_mel_frequencies(40, 0, 8000)
    assert f.shape == (40,)
    assert f[0] == 0 and abs(f[-1] - 8000) < 1e-6
    assert (np.diff(f) > 0).all()
