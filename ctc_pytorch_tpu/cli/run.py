"""Pipeline orchestrator — the ``timit/run.sh`` replacement.

Stages (``run.sh:22-46``):
  0  corpus prep (TIMIT walk + phone folding + units)
  1  feature extraction + global CMVN
  2  acoustic model training
  3  LM training
  4  decode + score

``python -m ctc_pytorch_tpu.cli.run --timit /path/to/TIMIT --stage 0``
runs from the given stage to the end, like ``bash run.sh [stage]``.
Stages communicate through the same on-disk artifacts as the reference
(data/<split>/{wav.scp,phn_text,<feat>.scp,...}, data/units, ARPA LM,
checkpoint package).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ctc_pytorch_tpu.cli import make_feat, test as test_cli, train as train_cli
from ctc_pytorch_tpu.cli import train_lm
from ctc_pytorch_tpu.config import load_config
from ctc_pytorch_tpu.data.prep import prepare_timit


def main(argv=None):
    p = argparse.ArgumentParser(description="CTC pipeline (tpu)")
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--stop-stage", type=int, default=4,
                   help="last stage to run (inclusive)")
    p.add_argument("--timit", default=None, help="TIMIT corpus root (stage 0)")
    p.add_argument("--data", default="data")
    p.add_argument("--conf", default="conf/ctc_config.yaml")
    p.add_argument("--feat", default="fbank",
                   choices=["fbank", "mfcc", "spectrogram", "spectrum"])
    p.add_argument("--phoneme-map", default="60-39")
    args = p.parse_args(argv)

    def active(n):
        return args.stage <= n <= args.stop_stage

    if active(0):
        assert args.timit, "--timit is required for stage 0"
        counts = prepare_timit(args.timit, args.data, args.phoneme_map)
        print(f"Data preparation succeeded: {counts}")
    if active(1):
        make_feat.main([args.feat, args.data])
    if active(2):
        train_cli.main(["--conf", args.conf])
    if active(3):
        train_lm.main([args.data])
    if active(4):
        test_cli.main(["--conf", args.conf])


if __name__ == "__main__":
    main()
