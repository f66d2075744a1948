"""Generate the committed frozen frontend fixture (VERDICT r2 item 8).

``torchaudio.compliance.kaldi`` and the Kaldi binaries are absent from this
image, so true-Kaldi outputs cannot be captured here; the strongest
available permanence is to FREEZE the current frontend's outputs — which
tests/test_frontend_golden.py independently validates piecewise against
scipy / torch.stft / brute-force Kaldi-spec loops — into a committed npz.
tests/test_frontend_fixture.py then pins the production code to this file,
so any future numerics drift is caught even in hermetic images without
scipy/torch, and the validation chain no longer re-derives at test time.

Run from the repo root (CPU):  python tools/gen_frontend_fixture.py
Regenerate ONLY with a frontend change whose correctness is re-established
by the independent checks in test_frontend_golden.py first.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

OUT = REPO / "tests" / "fixtures" / "frontend_golden.npz"


def configs() -> dict:
    """The frozen configurations — SHARED with tests/test_frontend_fixture
    (a test-local copy would let an edited-but-unregenerated config pass
    silently against the stale npz)."""
    from ctc_pytorch_tpu.frontend.features import FrontendConfig

    return {
        # the flagship recipe: fbank 80 mel + energy, hamming
        # (timit/conf/fbank.conf:1-3)
        "fbank81_hamming": ("fbank", FrontendConfig(
            num_mel_bins=80, use_energy=True, window="hamming")),
        # Kaldi defaults: povey window, snip-edges
        "fbank40_povey": ("fbank", FrontendConfig(
            num_mel_bins=40, use_energy=False, window="povey")),
        # 13-dim mfcc per timit/conf/mfcc.conf (--use-energy=false; the
        # MFCC energy knob is mfcc_use_energy — plain use_energy is a
        # fbank-only option the mfcc path ignores)
        "mfcc13": ("mfcc", FrontendConfig(
            num_ceps=13, mfcc_use_energy=False, window="povey")),
        # the README's "39dim mfcc": 13 + delta + ddelta
        "mfcc39_deltas": ("mfcc_deltas", FrontendConfig(
            num_ceps=13, mfcc_use_energy=False, window="povey")),
        # librosa spectrum path (timit/local/make_spectrum.py)
        "spectrum201": ("spectrum", None),
    }


def waves() -> dict:
    """Deterministic short test signals covering distinct spectral shapes."""
    sr = 16000
    t = np.arange(4000) / sr
    rng = np.random.RandomState(1234)
    return {
        "tone": (0.5 * np.sin(2 * np.pi * 440 * t) * 16384).astype(np.float32),
        "chirp": (0.4 * np.sin(2 * np.pi * (200 + 1800 * t) * t) * 16384
                  ).astype(np.float32),
        "noise": (rng.randn(4000) * 4000).astype(np.float32),
        "speechy": ((0.3 * np.sin(2 * np.pi * 120 * t)
                     * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
                     + 0.1 * rng.randn(4000)) * 12000).astype(np.float32),
        "dc_step": np.concatenate(
            [np.full(2000, 500.0), np.full(2000, -500.0)]
        ).astype(np.float32),
    }


def main() -> None:
    import os

    # belt and braces for a hermetic CPU run: the env var works through the
    # package __init__'s re-assert shim (jax._src may be preloaded with the
    # launch-time value), and the direct config.update covers bare-import
    # flows — either alone can be too late depending on how the image
    # preloads jax, so apply both BEFORE any backend init, else the fixture
    # silently bakes TPU numerics and the CPU pinning test fails by ~1e-1
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    assert jax.devices()[0].platform == "cpu", jax.devices()

    from ctc_pytorch_tpu.frontend.features import (
        add_deltas,
        fbank,
        log_spectrum_librosa,
        mfcc,
    )

    out = {}
    for wname, wav in waves().items():
        for cname, (kind, cfg) in configs().items():
            if kind == "fbank":
                feat = fbank(wav, cfg)
            elif kind == "mfcc":
                feat = mfcc(wav, cfg)
            elif kind == "mfcc_deltas":
                feat = add_deltas(mfcc(wav, cfg))
            else:
                feat = log_spectrum_librosa(wav)
            out[f"{wname}/{cname}"] = np.asarray(feat, np.float32)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    total = sum(v.size for v in out.values())
    print(f"wrote {OUT} ({len(out)} arrays, {total} values)")


if __name__ == "__main__":
    main()
