"""Frontend checks against independent numpy re-derivations of Kaldi DSP."""

import numpy as np
import pytest

from ctc_pytorch_tpu.frontend import (
    FrontendConfig,
    add_deltas,
    fbank,
    frame_signal,
    log_spectrum_librosa,
    mel_filterbank,
    mfcc,
    num_frames,
    spectrogram,
    dct_matrix,
)


def _wav(n=16000, seed=0, batch=None):
    rng = np.random.RandomState(seed)
    shape = (n,) if batch is None else (batch, n)
    return (rng.randn(*shape) * 1000).astype(np.float32)


def test_framing_snip_edges():
    cfg = FrontendConfig()
    w = _wav(16000)
    frames = np.asarray(frame_signal(w, cfg))
    # 16000 samples, 400-len frames, 160 shift -> 1 + (16000-400)//160 = 98
    assert frames.shape == (98, 400)
    np.testing.assert_array_equal(frames[0], w[:400])
    np.testing.assert_array_equal(frames[3], w[480:880])
    assert int(num_frames(16000, 400, 160)) == 98


def _np_frame_process(w, cfg):
    """Independent numpy re-derivation of Kaldi's ProcessWindow."""
    flen, shift = cfg.frame_length, cfg.frame_shift
    t = 1 + (len(w) - flen) // shift
    n = np.arange(flen)
    if cfg.window == "hamming":
        win = 0.54 - 0.46 * np.cos(2 * np.pi * n / (flen - 1))
    elif cfg.window == "povey":
        win = (0.5 - 0.5 * np.cos(2 * np.pi * n / (flen - 1))) ** 0.85
    else:
        raise NotImplementedError
    frames, energies = [], []
    for i in range(t):
        x = w[i * shift : i * shift + flen].astype(np.float64).copy()
        x -= x.mean()
        energies.append(np.log(max(np.dot(x, x), np.finfo(np.float32).eps)))
        x[1:] -= cfg.preemph * x[:-1]
        x[0] -= cfg.preemph * x[0]
        frames.append(x * win)
    return np.stack(frames), np.array(energies)


@pytest.mark.parametrize("window", ["hamming", "povey"])
def test_power_spectrum_matches_numpy(window):
    cfg = FrontendConfig(window=window)
    w = _wav(4000, seed=1)
    from ctc_pytorch_tpu.frontend.features import power_spectrum

    power, log_e = power_spectrum(w, cfg)
    frames_np, energies_np = _np_frame_process(w, cfg)
    spec_np = np.abs(np.fft.rfft(frames_np, n=cfg.fft_size, axis=-1)) ** 2
    np.testing.assert_allclose(np.asarray(power), spec_np, rtol=2e-3, atol=1e-1)
    np.testing.assert_allclose(np.asarray(log_e), energies_np, rtol=1e-4)


def test_fbank_shape_and_energy_column():
    # the recipe's 81-dim fbank: 80 mel + raw energy first (fbank.conf)
    cfg = FrontendConfig(num_mel_bins=80, use_energy=True)
    w = _wav(16000, batch=2)
    f = np.asarray(fbank(w, cfg))
    assert f.shape == (2, 98, 81)
    from ctc_pytorch_tpu.frontend.features import power_spectrum

    _, log_e = power_spectrum(w, cfg)
    np.testing.assert_allclose(f[..., 0], np.asarray(log_e), rtol=1e-5)
    # mel features are logs of positive energies -> finite
    assert np.isfinite(f).all()


def test_mel_filterbank_properties():
    cfg = FrontendConfig(num_mel_bins=40)
    banks = mel_filterbank(cfg)
    assert banks.shape == (257, 40)
    assert (banks >= 0).all()
    # every filter has support, peaks near 1 in the interior
    assert (banks.sum(axis=0) > 0).all()
    assert banks.max() <= 1.0 + 1e-6
    # triangles overlap: each interior FFT bin in-band is covered
    mid = banks[20:200].sum(axis=1)
    assert (mid > 0).all()


def test_mfcc_dct_orthonormal():
    d = dct_matrix(23, 23)
    np.testing.assert_allclose(d @ d.T, np.eye(23), atol=1e-5)
    cfg = FrontendConfig(num_ceps=13)
    w = _wav(8000)
    c = np.asarray(mfcc(w, cfg))
    assert c.shape == (1 + (8000 - 400) // 160, 13)
    assert np.isfinite(c).all()


def test_mfcc_39dim_with_deltas():
    cfg = FrontendConfig(num_ceps=13)
    w = _wav(8000)
    c = mfcc(w, cfg)
    full = np.asarray(add_deltas(c))
    assert full.shape[-1] == 39


def test_deltas_match_reference_filter():
    # order-1 deltas: sum_j j*(x[t+j]-x[t-j]) / (2*sum j^2), edge replicated
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    out = np.asarray(add_deltas(x, order=1, window=2))
    assert out.shape == (10, 4)
    # interior frames of a linear ramp have slope exactly 2 (per-frame step)
    np.testing.assert_allclose(out[2:-2, 2], 2.0, atol=1e-5)
    # delta of delta of constant is 0
    const = np.ones((8, 3), np.float32)
    out2 = np.asarray(add_deltas(const, order=2, window=2))
    np.testing.assert_allclose(out2[:, 3:], 0.0, atol=1e-6)


def test_spectrogram_energy_bin():
    cfg = FrontendConfig()
    w = _wav(4000)
    s = np.asarray(spectrogram(w, cfg))
    assert s.shape == (1 + (4000 - 400) // 160, 257)
    from ctc_pytorch_tpu.frontend.features import power_spectrum

    _, log_e = power_spectrum(w, cfg)
    np.testing.assert_allclose(s[:, 0], np.asarray(log_e), rtol=1e-5)


def test_librosa_spectrum_201dim():
    w = _wav(16000)
    s = np.asarray(log_spectrum_librosa(w))
    assert s.shape[-1] == 201
    # normalised: ~zero mean, ~unit std
    assert abs(s.mean()) < 1e-3
    assert abs(s.std() - 1.0) < 1e-3
