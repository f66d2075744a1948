"""Compare our jittable frontend against features computed by REAL Kaldi
binaries (environment-blocked here: no Kaldi build in this image — see
ROADMAP.md "Environment-blocked items").

Usage, once a Kaldi build exists (ref `timit/steps/make_feat.sh:25`):

    compute-fbank-feats --num-mel-bins=80 --use-energy=true \
        --window-type=hamming --dither=0 scp:wav.scp ark:- \
      | copy-feats ark:- ark,t:kaldi.txt
    python tools/parity/frontend_vs_kaldi.py kaldi.txt --scp wav.scp

Reads the text-ark, recomputes each utterance with `frontend.fbank` from
the SPHERE/RIFF file named in the scp, and reports per-utterance max-abs
and relative error (pass threshold 1e-3 relative on log features; Kaldi
computes in float32 with a different FFT, so bit-equality is not the bar).
Works for mfcc/spectrogram via --feat-type.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def read_text_ark(path: str) -> dict:
    """Minimal Kaldi text-ark reader: 'utt  [\\n row...\\n row ]'."""
    utts, cur, rows = {}, None, []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line.endswith("["):
            cur = line.split()[0]
            rows = []
        elif line.endswith("]"):
            rows.append([float(v) for v in line[:-1].split()])
            utts[cur] = np.array(rows, np.float32)
        elif cur is not None and line:
            rows.append([float(v) for v in line.split()])
    return utts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("kaldi_ark", help="text-ark from copy-feats ark,t:")
    ap.add_argument("--scp", required=True, help="wav.scp (utt -> path)")
    ap.add_argument("--feat-type", default="fbank",
                    choices=["fbank", "mfcc", "spectrogram"])
    ap.add_argument("--num-mel-bins", type=int, default=80)
    ap.add_argument("--window", default="hamming")
    ap.add_argument("--rtol", type=float, default=1e-3)
    args = ap.parse_args(argv)

    from ctc_pytorch_tpu.data.prep.sphere import read_audio
    from ctc_pytorch_tpu.frontend import features as F

    cfg = F.FrontendConfig(window=args.window,
                           num_mel_bins=args.num_mel_bins, dither=0.0)
    fn = {"fbank": F.fbank, "mfcc": F.mfcc,
          "spectrogram": F.spectrogram}[args.feat_type]
    scp = dict(line.split(None, 1)
               for line in Path(args.scp).read_text().splitlines() if line)
    kaldi = read_text_ark(args.kaldi_ark)
    worst = 0.0
    n_fail = 0
    for utt, ref in kaldi.items():
        wav = read_audio(scp[utt].strip())
        ours = np.asarray(fn(wav, cfg))[: ref.shape[0]]
        if ours.shape != ref.shape:
            print(f"{utt}: SHAPE {ours.shape} vs kaldi {ref.shape}")
            n_fail += 1
            continue
        scale = np.maximum(np.abs(ref), 1.0)
        rel = float(np.max(np.abs(ours - ref) / scale))
        worst = max(worst, rel)
        status = "ok" if rel <= args.rtol else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(f"{utt}: max rel err {rel:.2e} {status}")
    print(f"\n{len(kaldi)} utts, worst rel err {worst:.2e}, "
          f"{n_fail} failures (rtol {args.rtol})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
