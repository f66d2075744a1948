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
    conf = args.conf
    if active(2) or active(4):
        # stages 2/4 read corpus paths from the YAML; when --data points
        # somewhere else, remap the conf's data-relative paths onto it
        # (otherwise training would miss the artifacts stages 0-1 just
        # wrote, or silently pick up a stale default data/ tree)
        conf = _conf_for_data(args.conf, args.data)
    if active(2):
        train_cli.main(["--conf", conf])
    if active(3):
        train_lm.main([args.data])
    if active(4):
        test_cli.main(["--conf", conf])


def _conf_for_data(conf_path: str, data_dir: str) -> str:
    """Rewrite the conf's data-relative path fields onto ``data_dir``;
    returns the original path when it already matches."""
    cfg = load_config(conf_path)
    old = Path(cfg.data_dir)
    new = Path(data_dir)
    if old.resolve() == new.resolve():
        return conf_path
    for field in ("vocab_file", "train_scp_path", "train_lab_path",
                  "valid_scp_path", "valid_lab_path", "test_scp_path",
                  "test_lab_path", "lm_path"):
        v = getattr(cfg, field, None)
        if not v:
            continue
        try:
            rel = Path(v).relative_to(old)
        except ValueError:
            continue  # not under the conf's data_dir: leave it alone
        setattr(cfg, field, str(new / rel))
    cfg.data_dir = str(new)
    out = new / "conf_resolved.yaml"
    out.parent.mkdir(parents=True, exist_ok=True)
    cfg.to_yaml(out)
    return str(out)


if __name__ == "__main__":
    main()
