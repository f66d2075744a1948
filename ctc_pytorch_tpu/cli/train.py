"""Stage 2: acoustic model training (``steps/train_ctc.py`` CLI replacement).

``python -m ctc_pytorch_tpu.cli.train --conf conf/ctc_config.yaml`` — same
flag, same YAML.  Builds vocab/datasets/loaders from the config, trains with
the plateau scheduler, writes the best package to
``<checkpoint_dir>/<exp_name>/ctc_best_model.npz``.
"""

from __future__ import annotations

import argparse

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
    log = print
    if cfg.log_dir:
        from ctc_pytorch_tpu.utils import init_file_logger

        log = init_file_logger(cfg.log_dir, cfg.exp_name).info
    vocab = Vocab(cfg.vocab_file)
    train_ds = SpeechDataset(vocab, cfg.train_scp_path, cfg.train_lab_path, cfg)
    dev_ds = SpeechDataset(vocab, cfg.valid_scp_path, cfg.valid_lab_path, cfg)
    # parallel cache fill (reference: DataLoader num_workers); the native
    # ark loader (ark_native.cpp) releases the GIL per utterance
    train_ds.preload(cfg.num_workers)
    dev_ds.preload(cfg.num_workers)
    train_loader = SpeechDataLoader(
        train_ds, cfg.batch_size, shuffle=cfg.shuffle_train,
        num_buckets=cfg.num_buckets, seed=cfg.seed, mode=cfg.batch_mode,
    )
    dev_loader = SpeechDataLoader(
        dev_ds, cfg.batch_size, shuffle=False, num_buckets=cfg.num_buckets,
        seed=cfg.seed, mode=cfg.batch_mode,
    )
    # device cache is wired after the (optional) mesh exists below

    # 863 configs declare num_class explicitly (blank added on top, matching
    # the reference's Linear(..., num_class+1)); otherwise the vocab decides
    n_class = cfg.num_class + 1 if cfg.num_class > 0 else vocab.n_words
    spec = ModelSpec.from_config(cfg, num_class=n_class)
    mesh = None
    if args.data_parallel:
        import jax

        from ctc_pytorch_tpu.parallel import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh()
            n_dev = mesh.devices.size
            if cfg.batch_size % n_dev != 0:
                raise SystemExit(
                    f"--data-parallel: batch_size={cfg.batch_size} must be "
                    f"a multiple of the {n_dev}-device mesh (batches are "
                    f"padded to exactly batch_size rows)"
                )
    use_device_cache = False
    if cfg.device_cache:
        from ctc_pytorch_tpu.data.batching import DeviceCachedLoader

        # budget-check from host-side bucket shapes BEFORE uploading —
        # constructing DeviceCachedLoader device_puts the whole dataset
        budget = cfg.device_cache_max_gb * (1 << 30)
        est = (DeviceCachedLoader.estimate_bytes(train_loader)
               + DeviceCachedLoader.estimate_bytes(dev_loader))
        if est <= budget:
            train_loader = DeviceCachedLoader(train_loader, mesh=mesh)
            dev_loader = DeviceCachedLoader(dev_loader, mesh=mesh)
            use_device_cache = True
        elif est >= (1 << 62):  # num_buckets=0 sentinel: not cacheable
            log(
                "WARNING: device cache disabled — num_buckets=0 "
                "(reference-exact per-batch shapes) is not cacheable; "
                "falling back to host streaming"
            )
        else:
            log(
                f"WARNING: device cache disabled — estimated "
                f"{est / (1 << 30):.2f} GB exceeds device_cache_max_gb="
                f"{cfg.device_cache_max_gb}; falling back to host streaming "
                f"(expect lower epoch rate; raise the budget if HBM allows)"
            )
    if cfg.host_prefetch and not use_device_cache:
        # async H2D overlap whenever batches stream from the host — whether
        # the cache is off by config or auto-disabled by the budget
        from ctc_pytorch_tpu.data.batching import PrefetchLoader

        train_loader = PrefetchLoader(train_loader, mesh=mesh)
        dev_loader = PrefetchLoader(dev_loader, mesh=mesh)
    # waveform-in end-to-end: the frontend runs inside the train step
    from ctc_pytorch_tpu.frontend.e2e import frontend_fn_from_config

    frontend_fn = frontend_fn_from_config(cfg)

    trainer = Trainer(cfg, spec, mesh=mesh, frontend_fn=frontend_fn)
    if args.resume:
        trainer.resume(args.resume)
    best = trainer.fit(train_loader, dev_loader, log=log)
    # write the best-checkpoint path back into a config snapshot, like the
    # 863 recipe rewrites its conf (cnn_lstm_ctc.py:257-258) — into the
    # experiment dir, not the user's file
    cfg.model_file = str(best)
    cfg.to_yaml(trainer.out_dir / "config_used.yaml")
    log(f"End training, best model saved to {best}")
    return best


if __name__ == "__main__":
    main()
