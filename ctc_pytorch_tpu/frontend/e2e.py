"""Waveform-in end-to-end: the audio frontend fused into the training step.

The reference's waveform path is dead code (``timit/utils/data_loader.py:
62-68`` references undefined names); here it is a first-class configuration
(BASELINE.json configs[4]): batches carry padded raw waveforms and one jitted
graph runs frontend -> CMVN -> splice/skip -> CNN/RNN -> CTC.  XLA fuses the
frontend's framing/window/FFT/mel-matmul into the same program as the model,
so features never round-trip through HBM-host or disk.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.frontend.cmvn import apply_cmvn
from ctc_pytorch_tpu.frontend.features import (
    FrontendConfig,
    add_deltas,
    fbank,
    mfcc,
    spectrogram,
)
from ctc_pytorch_tpu.frontend.splice import make_context, skip_frames


@dataclasses.dataclass(frozen=True)
class WaveFrontendSpec:
    """Static description of the on-device frontend chain."""

    feat_type: str = "fbank"  # fbank | mfcc | mfcc39 | spectrogram
    frontend: FrontendConfig = FrontendConfig()
    left_ctx: int = 0
    right_ctx: int = 2
    n_skip_frame: int = 2
    # zero-pad T (and round valid frame counts up) to a multiple of this,
    # mirroring the offline path's pad-to-downsample
    # (data/dataset.py process_feature; ref data_loader.py:106-110)
    n_downsample: int = 1

    def feature_dim(self) -> int:
        base = {
            "fbank": self.frontend.num_mel_bins + int(self.frontend.use_energy),
            "mfcc": self.frontend.num_ceps,
            "mfcc39": self.frontend.num_ceps * 3,
            "spectrogram": self.frontend.fft_size // 2 + 1,
        }[self.feat_type]
        return base * (self.left_ctx + self.right_ctx + 1)


def waveform_frontend(
    spec: WaveFrontendSpec,
    wavs: jnp.ndarray,  # (B, S) padded samples
    wav_lengths: jnp.ndarray,  # (B,) valid sample counts
    cmvn: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, S) waveforms -> ((B, T', F'), frac, frame_lengths), all on device.

    Valid frame counts follow Kaldi snip-edges on the true sample counts;
    padded frames beyond them are garbage but excluded by ``frac``/lengths
    (the reference contract: zero-pad + fractional sizes).
    """
    cfg = spec.frontend
    if spec.feat_type == "fbank":
        feats = fbank(wavs, cfg)
    elif spec.feat_type == "mfcc":
        feats = mfcc(wavs, cfg)
    elif spec.feat_type == "mfcc39":
        feats = add_deltas(mfcc(wavs, cfg))
    elif spec.feat_type == "spectrogram":
        feats = spectrogram(wavs, cfg)
    else:
        raise ValueError(f"unknown feat_type {spec.feat_type!r}")
    if cmvn is not None:
        feats = apply_cmvn(feats, cmvn[0], cmvn[1])
    # valid frame counts BEFORE splicing: the context splice replicates
    # each utterance's own edge, not the padded-buffer edge
    n_frames = jnp.maximum(
        0, 1 + (wav_lengths - cfg.frame_length) // cfg.frame_shift
    )
    feats = make_context(feats, spec.left_ctx, spec.right_ctx,
                         lengths=n_frames)
    feats = skip_frames(feats, spec.n_skip_frame)
    ds = max(spec.n_downsample, 1)
    if ds > 1 and feats.shape[-2] % ds:
        pad = ds - feats.shape[-2] % ds
        widths = [(0, 0)] * feats.ndim
        widths[-2] = (0, pad)
        feats = jnp.pad(feats, widths)

    frame_len = n_frames
    if spec.n_skip_frame > 1:
        frame_len = -(-frame_len // spec.n_skip_frame)
    if ds > 1:
        # offline path: each item's rows are zero-padded to a multiple of
        # n_downsample and the padded count is the item's length
        frame_len = (-(-frame_len // ds)) * ds
    t_out = feats.shape[-2]
    frame_len = jnp.minimum(frame_len, t_out)
    frac = frame_len.astype(jnp.float32) / t_out
    return feats, frac, frame_len


def build_frontend_fn(
    spec: WaveFrontendSpec,
    cmvn: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Callable:
    """Closure suitable for make_step_fns(frontend_fn=...)."""

    def fn(wavs, wav_lengths):
        if wavs.ndim == 3:  # collate shape (B, S, 1)
            wavs = wavs[..., 0]
        return waveform_frontend(
            spec, wavs, wav_lengths.astype(jnp.int32), cmvn
        )

    return fn


def frontend_fn_from_config(cfg) -> Optional[Callable]:
    """Step-fused frontend for ``feature_type: waveform`` configs, loading
    the training-time CMVN stats when stage 1 wrote them.  Returns None for
    offline-feature configs.  Shared by cli.train (stage 2) and cli.test
    (stage 4) so a waveform-trained package decodes with the exact frontend
    it was trained with."""
    if cfg.feature_type != "waveform":
        return None
    from pathlib import Path

    import numpy as np

    n_mels = max(cfg.feature_dim - 1, 1)
    fe = WaveFrontendSpec(
        feat_type="fbank",
        frontend=FrontendConfig(num_mel_bins=n_mels),
        left_ctx=cfg.left_ctx, right_ctx=cfg.right_ctx,
        n_skip_frame=cfg.n_skip_frame, n_downsample=cfg.n_downsample,
    )
    cmvn = None
    cmvn_file = Path(cfg.data_dir) / "global_fbank_cmvn.npz"
    if cmvn_file.exists():
        z = np.load(cmvn_file)
        cmvn = (z["mean"], z["inv_std"])
    return build_frontend_fn(fe, cmvn)
