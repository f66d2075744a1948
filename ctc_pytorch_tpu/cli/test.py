"""Stage 4: decoding + scoring (``steps/test_ctc.py`` replacement).

Loads a package checkpoint, rebuilds the model purely from it
(``test_ctc.py:38-58`` contract), decodes the test set with the Greedy or
Beam decoder, prints per-utterance origin/decoded pairs, and reports CER/WER
percentages and decode wall time (``test_ctc.py:69-112``).
"""

from __future__ import annotations

import argparse
import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ctc_pytorch_tpu.config import Config, load_config
from ctc_pytorch_tpu.data import SpeechDataLoader, SpeechDataset
from ctc_pytorch_tpu.decode import BeamDecoder, GreedyDecoder
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.train.checkpoint import model_from_package
from ctc_pytorch_tpu.vocab import Vocab


def evaluate(
    cfg: Config,
    package_path: str,
    *,
    verbose: bool = True,
    max_batches: Optional[int] = None,
    log=print,
) -> dict:
    vocab = Vocab(cfg.vocab_file)
    spec, params, mstate, manifest = model_from_package(package_path)
    # use the fused Pallas kernels for inference when the hardware tiling
    # allows (models/rnn.py guards and falls back to the scan otherwise)
    import dataclasses

    if spec.rnn_cell in ("lstm", "gru") and spec.bidirectional:
        spec = dataclasses.replace(spec, use_pallas_rnn=True)
    test_ds = SpeechDataset(vocab, cfg.test_scp_path, cfg.test_lab_path, cfg)
    test_ds.preload(cfg.num_workers)
    loader = SpeechDataLoader(
        test_ds, cfg.batch_size, shuffle=False, num_buckets=cfg.num_buckets,
        mode=cfg.batch_mode,
    )

    on_device_beam = cfg.decode_type == "BeamDevice"
    if cfg.decode_type == "Greedy":
        decoder = GreedyDecoder(vocab.index2word)
    else:
        decoder = BeamDecoder(
            vocab.index2word, beam_width=cfg.beam_width,
            lm_path=cfg.lm_path, lm_alpha=cfg.lm_alpha,
        )

    import jax

    # multi-chip decode: shard the BeamDevice batch over a data mesh so
    # each chip searches its shard (decode/beam_device.py sharded path)
    mesh = None
    if on_device_beam and jax.device_count() > 1:
        from ctc_pytorch_tpu.parallel import make_mesh

        mesh = make_mesh()

    # waveform-trained packages decode through the same step-fused frontend
    # they were trained with (frac then carries valid SAMPLE counts)
    from ctc_pytorch_tpu.frontend.e2e import frontend_fn_from_config

    frontend_fn = frontend_fn_from_config(cfg)

    @jax.jit
    def forward(feats, frac):
        if frontend_fn is not None:
            feats, frac, _ = frontend_fn(feats, frac)
        # frac feeds the padding-masked BN planes (pad_dynamics 'valid' /
        # 'batchmax' packages; a no-op for 'padded')
        log_probs, _ = CTCModel.apply(spec, params, mstate, feats, frac=frac)
        t_out = log_probs.shape[0]
        return log_probs, CTCModel.input_sizes(
            spec, frac, feats.shape[1], t_out
        )

    # fused stage-4 (decode/fused.py): one jitted scan per bucket group
    # over a device-resident cache — same strings, one dispatch per group
    # instead of one per batch (the streaming loop below is the
    # reference-shaped fallback and the parity/debug path)
    if (
        cfg.fused_decode
        and cfg.decode_type in ("Greedy", "BeamDevice")
        and frontend_fn is None
        and mesh is None
        and max_batches is None
        and loader.batcher._assignment is not None
    ):
        from ctc_pytorch_tpu.data.batching import DeviceCachedLoader

        est = DeviceCachedLoader.estimate_bytes(loader)
        if est <= cfg.device_cache_max_gb * (1 << 30):
            return _evaluate_fused(
                cfg, spec, params, mstate, decoder, loader,
                verbose=verbose, log=log,
            )

    total_cer = total_wer = 0
    num_sentences = 0
    start = time.time()
    n = 0
    for batch in loader:
        frac_in = (
            batch.input_lengths.astype(np.float32) if frontend_fn is not None
            else batch.input_frac
        )
        log_probs, input_sizes = forward(
            jnp.asarray(batch.feats), jnp.asarray(frac_in)
        )
        input_sizes = np.asarray(input_sizes)
        if on_device_beam:
            decoded = decoder.decode_on_device(
                log_probs, input_sizes, max_len=cfg.beam_max_len, mesh=mesh
            )
        else:
            decoded = decoder.decode(
                np.asarray(log_probs), input_sizes,
                **({} if cfg.decode_type == "Greedy"
                   else {"use_native": cfg.beam_use_native}),
            )
        targets = [
            decoder.scorer.to_string(
                batch.labels[i], int(batch.label_lengths[i])
            )
            for i in range(batch.batch_size)
        ]
        for i in range(batch.batch_size):
            if not batch.example_mask[i]:
                continue
            if verbose:
                log(f"{batch.utts[i]}")
                log(f"origin : {targets[i]}")
                log(f"decoded: {decoded[i]}")
            total_cer += decoder.scorer.cer(decoded[i], targets[i])
            total_wer += decoder.scorer.wer(decoded[i], targets[i])
            decoder.scorer.num_word += len(targets[i].split())
            decoder.scorer.num_char += len(targets[i])
            num_sentences += 1
        n += 1
        if max_batches and n >= max_batches:
            break
    minutes = (time.time() - start) / 60.0
    cer = 100.0 * total_cer / max(decoder.scorer.num_char, 1)
    wer = 100.0 * total_wer / max(decoder.scorer.num_word, 1)
    log(f"character error rate on test set: {cer:.4f}")
    log(f"word error rate on test set: {wer:.4f}")
    # sentence count, matching the reference's ``len(test_dataset)`` print
    # (test_ctc.py:112)
    log(f"time used for decode {num_sentences} sentences: "
        f"{minutes:.4f} minutes")
    return {"cer": cer, "wer": wer, "decode_minutes": minutes}


def _evaluate_fused(
    cfg: Config, spec, params, mstate, decoder, loader,
    *, verbose: bool = True, log=print,
) -> dict:
    """Stage-4 decode with one jitted scan per bucket group
    (decode/fused.py) over a ``DeviceCachedLoader``.  Strings, CER/WER,
    and prints match the streaming loop in ``evaluate`` exactly; only
    dispatch granularity differs (``test_ctc.py:69-112`` contract)."""
    from ctc_pytorch_tpu.data.batching import DeviceCachedLoader
    from ctc_pytorch_tpu.decode.fused import make_fused_decode_fn

    start = time.time()
    cached = DeviceCachedLoader(loader)
    if cfg.decode_type == "Greedy":
        fused = make_fused_decode_fn(spec, params, mstate, mode="greedy")
        hyp_str = decoder.scorer.to_string
    else:
        fused = make_fused_decode_fn(
            spec, params, mstate, mode="beam",
            beam_width=decoder.beam_width, beam_max_len=cfg.beam_max_len,
            lm_table=decoder.lm_table, lm_alpha=decoder.lm_alpha,
        )

        # the streaming BeamDevice path joins tokens WITHOUT to_string's
        # leading space (reference quirk, ctcDecoder.py:86-92) — match it
        def hyp_str(toks, n):
            return " ".join(decoder.int2char[int(t)] for t in toks[:n])

    total_cer = total_wer = 0
    num_sentences = 0
    label_host: dict = {}  # bucket plane id -> host labels/lab_len
    hit_capacity = 0
    for arrs, pos, mask, t_pad, idx in cached.epoch_groups(
        0, with_indices=True
    ):
        tokens, lens = fused(arrs, pos, t_pad)
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        if cfg.decode_type == "BeamDevice":
            hit_capacity += int((lens >= cfg.beam_max_len).sum())
        key = id(arrs)
        if key not in label_host:
            label_host[key] = (np.asarray(arrs["labels"]),
                               np.asarray(arrs["lab_len"]))
        labels, lab_lens = label_host[key]
        for bi in range(pos.shape[0]):
            for i in range(pos.shape[1]):
                if not mask[bi, i]:
                    continue
                row = pos[bi, i]
                target = decoder.scorer.to_string(
                    labels[row], int(lab_lens[row])
                )
                hyp = hyp_str(tokens[bi, i], int(lens[bi, i]))
                if verbose:
                    log(f"{cached._utts[int(idx[bi, i])]}")
                    log(f"origin : {target}")
                    log(f"decoded: {hyp}")
                total_cer += decoder.scorer.cer(hyp, target)
                total_wer += decoder.scorer.wer(hyp, target)
                decoder.scorer.num_word += len(target.split())
                decoder.scorer.num_char += len(target)
                num_sentences += 1
    if hit_capacity:
        import logging

        logging.getLogger(__name__).warning(
            "BeamDevice: %d hypothesis(es) hit the max_len=%d capacity; "
            "longer extensions were dropped — raise beam_max_len",
            hit_capacity, cfg.beam_max_len,
        )
    minutes = (time.time() - start) / 60.0
    cer = 100.0 * total_cer / max(decoder.scorer.num_char, 1)
    wer = 100.0 * total_wer / max(decoder.scorer.num_word, 1)
    log(f"character error rate on test set: {cer:.4f}")
    log(f"word error rate on test set: {wer:.4f}")
    log(f"time used for decode {num_sentences} sentences: "
        f"{minutes:.4f} minutes")
    return {"cer": cer, "wer": wer, "decode_minutes": minutes}


def main(argv=None):
    p = argparse.ArgumentParser(description="ctc decode + score (tpu)")
    p.add_argument("--conf", default="conf/ctc_config.yaml")
    p.add_argument("--package", default=None,
                   help="checkpoint package; defaults to "
                        "<checkpoint_dir>/<exp_name>/ctc_best_model.npz")
    args = p.parse_args(argv)
    cfg = load_config(args.conf)
    package = args.package or (
        f"{cfg.checkpoint_dir}/{cfg.exp_name}/ctc_best_model.npz"
    )
    return evaluate(cfg, package)


if __name__ == "__main__":
    main()
