"""Activation visualization (``timit/steps/visualize.py`` replacement).

Loads a checkpoint package, runs one batch with ``visualize=True`` (input
spectrum, post-CNN activations, pre-RNN features, per-frame class
log-probs — the same four tensors the reference pushes to visdom,
``visualize.py:107-132``), and writes them as an ``.npz`` plus optional PNG
heatmaps when matplotlib is available.  Class probabilities can be folded
48->39 for display (``visualize.py`` phone-map path).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ctc_pytorch_tpu.config import load_config
from ctc_pytorch_tpu.data import SpeechDataLoader, SpeechDataset
from ctc_pytorch_tpu.data.prep.phones import phone_map
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.train.checkpoint import model_from_package
from ctc_pytorch_tpu.vocab import Vocab


def visualize(cfg, package_path: str, out_path: str, fold_48_39: bool = False,
              log=print) -> Path:
    vocab = Vocab(cfg.vocab_file)
    spec, params, mstate, _ = model_from_package(package_path)
    ds = SpeechDataset(vocab, cfg.test_scp_path, cfg.test_lab_path, cfg)
    # num_buckets=0: reference-exact per-utterance padding — bucket padding
    # would append a long garbage tail (up to the corpus max length) to
    # every visualized tensor
    loader = SpeechDataLoader(ds, 1, shuffle=False, num_buckets=0)
    batch = next(iter(loader))
    feats = jnp.asarray(batch.feats)
    # waveform-trained packages visualize through the same step-fused
    # frontend they were trained with (cli.train/cli.test contract)
    from ctc_pytorch_tpu.frontend.e2e import frontend_fn_from_config

    frontend_fn = frontend_fn_from_config(cfg)
    if frontend_fn is not None:
        feats, _, _ = frontend_fn(
            feats, jnp.asarray(batch.input_lengths.astype(np.float32))
        )
    log_probs, _, visual = CTCModel.apply(
        spec, params, mstate, feats, visualize=True
    )
    arrays = {
        "utt": np.array(batch.utts[0]),
        "input": np.asarray(visual[0])[0],  # (T, F)
        "log_probs": np.asarray(visual[-1])[:, 0, :],  # (T', C)
    }
    if spec.add_cnn:
        arrays["post_cnn"] = np.asarray(visual[1])[0]  # (C, T', F')
        arrays["pre_rnn"] = np.asarray(visual[2])[:, 0, :]  # (T', C*F')
    probs = np.exp(arrays["log_probs"])
    if fold_48_39:
        m = phone_map("48-39")
        folded: dict = {}
        for idx in range(probs.shape[1]):
            name = vocab.index2word.get(idx, "UNK")
            tgt = m.get(name, name)
            folded.setdefault(tgt, np.zeros(probs.shape[0]))
            folded[tgt] += probs[:, idx]
        arrays["folded_names"] = np.array(sorted(folded))
        arrays["folded_probs"] = np.stack(
            [folded[k] for k in sorted(folded)], axis=1
        )
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **arrays)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(10, 6))
        axes[0].imshow(arrays["input"].T, aspect="auto", origin="lower")
        axes[0].set_title(f"input spectrum: {batch.utts[0]}")
        axes[1].imshow(probs.T, aspect="auto", origin="lower")
        axes[1].set_title("per-frame class probabilities")
        fig.tight_layout()
        fig.savefig(out.with_suffix(".png"))
        log(f"wrote {out} and {out.with_suffix('.png')}")
    except ImportError:
        log(f"wrote {out} (matplotlib unavailable; npz only)")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="activation visualization")
    p.add_argument("--conf", default="conf/ctc_config.yaml")
    p.add_argument("--package", required=True)
    p.add_argument("--out", default="visualize/activations.npz")
    p.add_argument("--fold-48-39", action="store_true")
    args = p.parse_args(argv)
    cfg = load_config(args.conf)
    return visualize(cfg, args.package, args.out, args.fold_48_39)


if __name__ == "__main__":
    main()
