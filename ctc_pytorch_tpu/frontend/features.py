"""On-device audio frontend: Kaldi-compatible feature extraction in pure JAX.

TPU-native replacement for the Kaldi C++ binaries the reference shells out to
(``compute-fbank-feats`` / ``compute-mfcc-feats`` / ``compute-spectrogram-feats``
at ``timit/steps/make_feat.sh:25,35``) plus the librosa log-spectrum variant
(``timit/local/make_spectrum.py:54-96``).

Everything here is jittable, batched ``(B, S) waveform -> (B, T, F) features``,
with static shapes (pad waveforms to a bucket length; valid frame counts are
returned separately).  The pipeline is pure matmul/FFT/elementwise work, so XLA
maps it straight onto the MXU/VPU — framing is a gather, the mel filterbank is
a single ``(T, nfft/2+1) x (nfft/2+1, n_mels)`` matmul, DCT is another matmul.

Kaldi conventions reproduced (all defaults per Kaldi's FrameExtractionOptions /
MelBanksOptions):
  * snip-edges framing, 25 ms window / 10 ms shift,
  * per-frame DC removal, raw log-energy before preemphasis/windowing,
  * preemphasis 0.97 with ``x[0] -= coeff * x[0]``,
  * povey / hamming / hanning / rectangular windows
    (the recipe's ``timit/conf/fbank.conf:1`` uses hamming),
  * FFT padded to the next power of two, power spectrum,
  * mel banks: mel(f) = 1127 ln(1 + f/700), low 20 Hz, high = Nyquist,
  * fbank: log(mel) with energy prepended as column 0 when ``use_energy``
    (80 mel + energy = the recipe's 81-dim, ``timit/conf/fbank.conf:2-3``),
  * mfcc: orthonormal DCT-II, 13 ceps, cepstral lifter 22, ``use_energy=false``
    per ``timit/conf/mfcc.conf:1``; deltas+ddeltas give the README's "39-dim".
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = float(np.finfo(np.float32).eps)


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    preemph: float = 0.97
    remove_dc: bool = True
    raw_energy: bool = True
    window: str = "hamming"  # povey | hamming | hanning | rectangular | blackman
    round_to_power_of_two: bool = True
    dither: float = 0.0  # deterministic by default; Kaldi defaults to 1.0
    dither_seed: int = 0
    # mel options
    num_mel_bins: int = 80
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 means offset from Nyquist
    # fbank options
    use_energy: bool = True
    use_log_fbank: bool = True
    use_power: bool = True
    # mfcc options
    num_ceps: int = 13
    cepstral_lifter: float = 22.0
    mfcc_use_energy: bool = False

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def fft_size(self) -> int:
        n = self.frame_length
        if self.round_to_power_of_two:
            return 1 << (n - 1).bit_length()
        return n


def num_frames(num_samples, frame_length: int, frame_shift: int):
    """Kaldi snip-edges frame count; works on ints or arrays."""
    return jnp.maximum(0, 1 + (num_samples - frame_length) // frame_shift)


def _window_coeffs(cfg: FrontendConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if cfg.window == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window == "rectangular":
        w = np.ones(n)
    elif cfg.window == "blackman":
        coeff = 0.42
        w = coeff - 0.5 * np.cos(a * i) + (0.5 - coeff) * np.cos(2 * a * i)
    else:
        raise ValueError(f"unknown window type {cfg.window!r}")
    return w.astype(np.float32)


def frame_signal(wav: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(..., S) waveform -> (..., T, frame_length) frames (snip-edges)."""
    flen, shift = cfg.frame_length, cfg.frame_shift
    s = wav.shape[-1]
    t = max(0, 1 + (s - flen) // shift)
    starts = np.arange(t) * shift
    idx = starts[:, None] + np.arange(flen)[None, :]  # (T, flen), static
    return wav[..., idx]


def _preprocess_frames(
    frames: jnp.ndarray, cfg: FrontendConfig, window: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DC removal, raw energy, preemphasis, windowing.

    Returns (windowed_frames, raw_log_energy). Order matches Kaldi's
    ProcessWindow: dither -> dc offset -> raw energy -> preemphasis -> window.
    """
    x = frames.astype(jnp.float32)
    if cfg.dither > 0.0:
        # deterministic dither keyed on the config seed AND the signal
        # content (Kaldi uses RandGauss; we default dither=0.0 for
        # reproducibility, Kaldi defaults 1.0).  The content fold-in keeps
        # the noise distinct per utterance — a seed-only key would add the
        # SAME pattern to every same-shaped input, a fixed bias rather
        # than dither.
        key = jax.random.PRNGKey(cfg.dither_seed)
        h = jax.lax.bitcast_convert_type(
            jnp.sum(jnp.abs(x)).astype(jnp.float32), jnp.uint32
        )
        key = jax.random.fold_in(key, h)
        x = x + cfg.dither * jax.random.normal(key, x.shape, jnp.float32)
    if cfg.remove_dc:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    log_energy = jnp.log(jnp.maximum(jnp.sum(x * x, axis=-1), EPS))
    if cfg.preemph != 0.0:
        shifted = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        x = x - cfg.preemph * shifted
    x = x * window
    if not cfg.raw_energy:
        log_energy = jnp.log(jnp.maximum(jnp.sum(x * x, axis=-1), EPS))
    return x, log_energy


def power_spectrum(wav: jnp.ndarray, cfg: FrontendConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., S) -> ((..., T, nfft/2+1) power spectrum, (..., T) raw log-energy)."""
    frames = frame_signal(wav, cfg)
    window = jnp.asarray(_window_coeffs(cfg))
    x, log_energy = _preprocess_frames(frames, cfg, window)
    nfft = cfg.fft_size
    spec = jnp.fft.rfft(x, n=nfft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return power, log_energy


# ---------------------------------------------------------------------------
# Mel filterbank (Kaldi MelBanks)
# ---------------------------------------------------------------------------

def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    """Dense (nfft/2+1, num_mel_bins) triangular mel matrix, Kaldi-style.

    Kaldi computes per-bin weights on FFT-bin centre frequencies in mel space
    (feat/mel-computations.cc); we materialise the same triangles as a dense
    matrix so the whole filterbank is one MXU matmul.
    """
    nfft = cfg.fft_size
    nyquist = cfg.sample_rate / 2.0
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    mel_low, mel_high = _mel(cfg.low_freq), _mel(high)
    n_bins = cfg.num_mel_bins
    mel_delta = (mel_high - mel_low) / (n_bins + 1)
    # FFT bin centre frequencies in mel
    fft_freqs = np.arange(nfft // 2 + 1) * (cfg.sample_rate / nfft)
    fft_mels = _mel(fft_freqs)
    centers = mel_low + np.arange(n_bins + 2) * mel_delta  # left, centre, right
    left = centers[:-2][None, :]
    center = centers[1:-1][None, :]
    right = centers[2:][None, :]
    m = fft_mels[:, None]
    up = (m - left) / (center - left)
    down = (right - m) / (right - center)
    # triangles clamp to zero outside [left, right], which also excludes
    # bins below low_freq / above high_freq
    weights = np.maximum(0.0, np.minimum(up, down))
    return weights.astype(np.float32)


def dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in), Kaldi's ComputeDctMatrix."""
    i = np.arange(n_out)[:, None]
    j = np.arange(n_in)[None, :]
    mat = np.sqrt(2.0 / n_in) * np.cos(math.pi * i * (2 * j + 1) / (2.0 * n_in))
    mat[0, :] = np.sqrt(1.0 / n_in)
    return mat.astype(np.float32)


def _lifter_coeffs(cfg: FrontendConfig) -> np.ndarray:
    q = cfg.cepstral_lifter
    i = np.arange(cfg.num_ceps, dtype=np.float64)
    return (1.0 + 0.5 * q * np.sin(math.pi * i / q)).astype(np.float32)


# ---------------------------------------------------------------------------
# Feature types
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def fbank(wav: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()) -> jnp.ndarray:
    """Log-mel filterbank features, (..., S) -> (..., T, n_mels [+1 energy]).

    Matches ``compute-fbank-feats`` with ``timit/conf/fbank.conf`` options:
    energy (raw) is column 0 when ``use_energy`` — 80 mel + energy = 81 dims.
    """
    power, log_energy = power_spectrum(wav, cfg)
    banks = jnp.asarray(mel_filterbank(cfg))
    mel = jnp.einsum(
        "...tf,fm->...tm", power, banks, preferred_element_type=jnp.float32
    )
    if not cfg.use_power:
        mel = jnp.sqrt(jnp.maximum(mel, 0.0))
    feats = jnp.log(jnp.maximum(mel, EPS)) if cfg.use_log_fbank else mel
    if cfg.use_energy:
        feats = jnp.concatenate([log_energy[..., None], feats], axis=-1)
    return feats


@partial(jax.jit, static_argnames=("cfg", "num_mel_bins"))
def mfcc(
    wav: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
    num_mel_bins: int = 23,
) -> jnp.ndarray:
    """MFCC features, (..., S) -> (..., T, num_ceps).

    Matches ``compute-mfcc-feats`` with ``timit/conf/mfcc.conf``
    (``--use-energy=false`` -> C0 kept, not replaced by log-energy).
    """
    mel_cfg = dataclasses.replace(cfg, num_mel_bins=num_mel_bins)
    power, log_energy = power_spectrum(wav, mel_cfg)
    banks = jnp.asarray(mel_filterbank(mel_cfg))
    mel = jnp.einsum(
        "...tf,fm->...tm", power, banks, preferred_element_type=jnp.float32
    )
    log_mel = jnp.log(jnp.maximum(mel, EPS))
    dct = jnp.asarray(dct_matrix(num_mel_bins, cfg.num_ceps))
    ceps = jnp.einsum(
        "...tm,cm->...tc", log_mel, dct, preferred_element_type=jnp.float32
    )
    if cfg.cepstral_lifter > 0:
        ceps = ceps * jnp.asarray(_lifter_coeffs(cfg))
    if cfg.mfcc_use_energy:
        ceps = ceps.at[..., 0].set(log_energy)
    return ceps


@partial(jax.jit, static_argnames=("cfg",))
def spectrogram(wav: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()) -> jnp.ndarray:
    """Log power spectrogram, (..., S) -> (..., T, nfft/2+1).

    Matches ``compute-spectrogram-feats``: log power spectrum with bin 0
    replaced by the raw log-energy.
    """
    power, log_energy = power_spectrum(wav, cfg)
    feats = jnp.log(jnp.maximum(power, EPS))
    return feats.at[..., 0].set(log_energy)


@partial(jax.jit, static_argnames=("n_fft", "hop", "normalize"))
def log_spectrum_librosa(
    wav: jnp.ndarray, n_fft: int = 400, hop: int = 160, normalize: bool = True
) -> jnp.ndarray:
    """The reference's librosa alternative (``timit/local/make_spectrum.py:54-80``):
    ``log1p(|STFT|)`` with a hamming window, 201 dims at n_fft=400, then
    per-utterance mean/std normalisation."""
    # librosa-style centred STFT: reflect-pad by n_fft//2
    pad = n_fft // 2
    x = jnp.pad(wav.astype(jnp.float32), [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    s = x.shape[-1]
    t = 1 + (s - n_fft) // hop
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[..., idx]
    window = jnp.asarray(np.hamming(n_fft).astype(np.float32))
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))
    feats = jnp.log1p(spec)
    if normalize:
        mean = jnp.mean(feats, axis=(-2, -1), keepdims=True)
        std = jnp.std(feats, axis=(-2, -1), keepdims=True)
        feats = (feats - mean) / jnp.maximum(std, EPS)
    return feats


# ---------------------------------------------------------------------------
# Deltas (Kaldi add-deltas, order 2, window 2)
# ---------------------------------------------------------------------------

def _delta_scales(order: int, window: int) -> list[np.ndarray]:
    """Kaldi DeltaFeatures scales: iterated regression filters."""
    scales = [np.array([1.0], dtype=np.float64)]
    for _ in range(order):
        prev = scales[-1]
        denom = 2.0 * sum(j * j for j in range(1, window + 1))
        cur = np.zeros(len(prev) + 2 * window)
        for j in range(-window, window + 1):
            cur[j + window : j + window + len(prev)] += (j / denom) * prev
        scales.append(cur)
    return [s.astype(np.float32) for s in scales]


@partial(jax.jit, static_argnames=("order", "window"))
def add_deltas(feats: jnp.ndarray, order: int = 2, window: int = 2) -> jnp.ndarray:
    """(..., T, F) -> (..., T, F*(order+1)) with delta/ddelta, edge replication.

    Provides the README's "39dim mfcc" (13 + delta + ddelta) that the
    reference's feature script never actually materialises (SURVEY.md §6).
    """
    outs = []
    for scale in _delta_scales(order, window):
        half = (len(scale) - 1) // 2
        if half == 0:
            outs.append(feats)
            continue
        padded = jnp.concatenate(
            [jnp.repeat(feats[..., :1, :], half, axis=-2), feats,
             jnp.repeat(feats[..., -1:, :], half, axis=-2)],
            axis=-2,
        )
        acc = sum(
            scale[k] * jax.lax.dynamic_slice_in_dim(padded, k, feats.shape[-2], axis=-2)
            for k in range(len(scale))
            if scale[k] != 0.0
        )
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
