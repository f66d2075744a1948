"""Stage 2: acoustic model training (``steps/train_ctc.py`` CLI replacement).

``python -m ctc_pytorch_tpu.cli.train --conf conf/ctc_config.yaml`` — same
flag, same YAML.  Builds vocab/datasets/loaders from the config, trains with
the plateau scheduler, writes the best package to
``<checkpoint_dir>/<exp_name>/ctc_best_model.npz``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ctc_pytorch_tpu.config import load_config
from ctc_pytorch_tpu.data import SpeechDataLoader, SpeechDataset
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train import Trainer
from ctc_pytorch_tpu.vocab import Vocab


def main(argv=None):
    p = argparse.ArgumentParser(description="cnn_lstm_ctc (tpu)")
    p.add_argument("--conf", default="conf/ctc_config.yaml")
    p.add_argument("--resume", default=None,
                   help="path to a resume checkpoint (.npz)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all local devices")
    args = p.parse_args(argv)

    cfg = load_config(args.conf)
    vocab = Vocab(cfg.vocab_file)
    train_ds = SpeechDataset(vocab, cfg.train_scp_path, cfg.train_lab_path, cfg)
    dev_ds = SpeechDataset(vocab, cfg.valid_scp_path, cfg.valid_lab_path, cfg)
    train_loader = SpeechDataLoader(
        train_ds, cfg.batch_size, shuffle=cfg.shuffle_train,
        num_buckets=cfg.num_buckets, seed=cfg.seed,
    )
    dev_loader = SpeechDataLoader(
        dev_ds, cfg.batch_size, shuffle=False, num_buckets=cfg.num_buckets,
        seed=cfg.seed,
    )

    spec = ModelSpec.from_config(cfg, num_class=vocab.n_words)
    mesh = None
    if args.data_parallel:
        import jax

        from ctc_pytorch_tpu.parallel import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh()
    trainer = Trainer(cfg, spec, mesh=mesh)
    if args.resume:
        trainer.resume(args.resume)
    best = trainer.fit(train_loader, dev_loader)
    print(f"End training, best model saved to {best}")
    return best


if __name__ == "__main__":
    main()
