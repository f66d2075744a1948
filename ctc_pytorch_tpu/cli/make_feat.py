"""Stage 1: feature extraction + global CMVN (``steps/make_feat.sh`` replacement).

Reads ``wav.scp`` per split, runs the on-device frontend (fbank / mfcc /
spectrogram per ``conf``), computes global CMVN stats on train, applies
variance-normalising CMVN to every split, and writes ``ark,scp`` pairs that
the data pipeline (and the reference's own tooling) can read.

The train flow mirrors ``make_feat.sh:25-31``: raw feats -> cmvn stats ->
apply-cmvn --norm-vars=true -> final ark/scp.  Batched on device: utterances
are padded to length buckets so the frontend jits a few shapes only.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ctc_pytorch_tpu.data.kaldi_io import ArkWriter, read_scp
from ctc_pytorch_tpu.data.prep.sphere import read_audio
from ctc_pytorch_tpu.frontend import (
    CmvnStats,
    FrontendConfig,
    accumulate_cmvn,
    add_deltas,
    apply_cmvn,
    fbank,
    finalize_cmvn,
    mfcc,
    num_frames,
    spectrogram,
)
from ctc_pytorch_tpu.frontend.cmvn import init_cmvn


def extract_features(
    wav: np.ndarray, feat_type: str, cfg: FrontendConfig, deltas: bool = False
) -> np.ndarray:
    import jax.numpy as jnp

    wav = jnp.asarray(wav)
    if feat_type == "fbank":
        feats = fbank(wav, cfg)
    elif feat_type == "mfcc":
        feats = mfcc(wav, cfg)
        if deltas:
            feats = add_deltas(feats)
    elif feat_type == "spectrogram":
        feats = spectrogram(wav, cfg)
    elif feat_type == "spectrum":
        # the 863/librosa variant: log1p(|STFT|), 201-dim
        # (timit/local/make_spectrum.py:54-96)
        from ctc_pytorch_tpu.frontend import log_spectrum_librosa

        feats = log_spectrum_librosa(wav, normalize=False)
    else:
        raise ValueError(f"Feature type {feat_type} does not support!")
    return np.asarray(feats)


def _bucket_pad(n: int, align: int = 16000) -> int:
    return ((n + align - 1) // align) * align


def run_split(
    scp_path: Path,
    out_dir: Path,
    feat_type: str,
    cfg: FrontendConfig,
    mean: Optional[np.ndarray],
    inv_std: Optional[np.ndarray],
    deltas: bool = False,
    collect_stats: bool = False,
):
    """Extract (optionally CMVN-normalised) features for one split."""
    import jax.numpy as jnp

    entries = read_scp(scp_path)
    stats = None
    feats_out: Dict[str, np.ndarray] = {}
    flen, shift = cfg.frame_length, cfg.frame_shift
    for utt, path in entries:
        wav = read_audio(path)
        n = len(wav)
        if feat_type == "spectrum":  # centred STFT framing (librosa)
            t = 1 + n // shift
        else:  # Kaldi snip-edges
            t = max(0, 1 + (n - flen) // shift)
        padded = np.zeros(_bucket_pad(max(n, flen)), np.float32)
        padded[:n] = wav
        if feat_type == "spectrum" and n >= 2:
            # librosa center=True reflects the TRUE signal tail; the last
            # valid frames' windows reach up to n + n_fft//2 samples, so
            # reflect the tail into the pad region instead of leaving
            # zeros (which would leak into those frames' STFT)
            m = min(flen // 2 + shift, n - 1, len(padded) - n)
            if m > 0:
                padded[n:n + m] = wav[n - 2:n - 2 - m:-1]
        full = extract_features(padded, feat_type, cfg, deltas)[:t]
        feats_out[utt] = full
        if collect_stats:
            if stats is None:
                stats = init_cmvn(full.shape[1])
            stats = accumulate_cmvn(stats, jnp.asarray(full[None]))
    if collect_stats:
        mean, inv_std = (np.asarray(x) for x in finalize_cmvn(stats))
    out_dir.mkdir(parents=True, exist_ok=True)
    with ArkWriter(out_dir / f"{feat_type}.ark", out_dir / f"{feat_type}.scp") as w:
        for utt, f in feats_out.items():
            if mean is not None:
                f = np.asarray(apply_cmvn(f, mean, inv_std))
            w.write(utt, f)
    return mean, inv_std


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="feature extraction + global CMVN")
    p.add_argument("feat_type",
                   choices=["fbank", "mfcc", "spectrogram", "spectrum"])
    p.add_argument("data_dir")
    p.add_argument("--num-mel-bins", type=int, default=80)
    p.add_argument("--window", default="hamming")
    p.add_argument("--use-energy", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="append the log-energy channel (--no-use-energy "
                        "to disable; fbank.conf default is on)")
    p.add_argument("--deltas", action="store_true",
                   help="append delta+ddelta (39-dim mfcc)")
    p.add_argument("--splits", nargs="+", default=["train", "dev", "test"])
    args = p.parse_args(argv)

    cfg = FrontendConfig(
        num_mel_bins=args.num_mel_bins, window=args.window,
        use_energy=args.use_energy,
    )
    data = Path(args.data_dir)
    # train first: compute global stats there (make_feat.sh:25-31)
    mean, inv_std = run_split(
        data / args.splits[0] / "wav.scp", data / args.splits[0],
        args.feat_type, cfg, None, None, args.deltas, collect_stats=True,
    )
    np.savez(data / f"global_{args.feat_type}_cmvn.npz", mean=mean,
             inv_std=inv_std)
    for split in args.splits[1:]:
        run_split(
            data / split / "wav.scp", data / split, args.feat_type, cfg,
            mean, inv_std, args.deltas,
        )
    print(f"Finished {args.feat_type} extraction for {args.splits}")


if __name__ == "__main__":
    main()
