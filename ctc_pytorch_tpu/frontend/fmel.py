"""F_Mel: linear-interpolation mel warping of a log spectrum.

Reproduces ``tools.F_Mel`` (``timit/utils/tools.py:43-64``), used when the
config sets ``mel: True`` (``timit/utils/data_loader.py:111-112``): for each
of ``n_mels = F`` mel-spaced centre frequencies (librosa/Slaney spacing, fmin
0 to fmax = sample_rate/2, scaled by ``window_size`` seconds into fractional
FFT-bin coordinates), linearly interpolate the frame's spectrum.

The reference loops per frame/bin in python; here it is one batched gather +
lerp, jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _slaney_mel_frequencies(n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.mel_frequencies (Slaney scale: linear < 1 kHz, log above)."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep,
            mels,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)),
            freqs,
        )

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels)
    return mel_to_hz(mels)


@partial(jax.jit, static_argnames=("sample_rate", "window_size"))
def f_mel(
    log_spec: jnp.ndarray,  # (..., T, F) log spectrum
    sample_rate: int = 16000,
    window_size: float = 0.025,
) -> jnp.ndarray:
    """(..., T, F) -> (..., T, F) mel-warped via linear interpolation.

    ``mel_bin = mel_frequencies(n_mels=F, 0, sr/2) * window_size`` gives
    fractional bin positions; each output bin is
    ``spec[right]·frac + spec[left]·(1-frac)`` with ``left=floor``, matching
    ``tools.py:55-62`` exactly (including reading bin ``left+1``, which the
    reference assumes exists).
    """
    n_mels = log_spec.shape[-1]
    mel_bin = _slaney_mel_frequencies(n_mels, 0.0, sample_rate / 2.0)
    mel_bin = mel_bin * window_size
    left = np.floor(mel_bin).astype(np.int32)
    frac = (mel_bin - left).astype(np.float32)
    right = np.minimum(left + 1, n_mels - 1)
    l = jnp.take(log_spec, jnp.asarray(left), axis=-1)
    r = jnp.take(log_spec, jnp.asarray(right), axis=-1)
    return (r - l) * jnp.asarray(frac) + l
