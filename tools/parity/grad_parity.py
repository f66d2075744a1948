"""Full-model gradient parity: torch reference vs this framework, one batch.

The PER-parity harness proved eval bit-equality on imported weights and
exact beam/greedy agreement, but independent training still lands ~2 PER
points apart at hard regimes.  This tool localizes (or rules out) forward/
backward math as the cause:

  1. builds the torch reference model EXACTLY as ``timit/steps/train_ctc.py``
     does (same seed/init), saves the INITIAL package;
  2. pulls batches from the reference's own ``SpeechDataLoader``
     (shuffle=False) so both sides see byte-identical (B, T, F) tensors;
  3. torch: ``model.train()`` forward -> ``nn.CTCLoss(sum)/B`` -> backward,
     collecting per-parameter grads (``train_ctc.py:26-66``);
  4. ours: imports the init package (cli/import_torch), runs
     ``jax.value_and_grad`` of the same loss on CPU fp32 highest precision;
  5. compares loss, per-tensor grads (max|d|, rel-Frobenius, cosine), and
     the BN running-stat updates produced by the train-mode forward.

Usage: python tools/parity/grad_parity.py WORKDIR [--conf CONF] [--batches N]
(WORKDIR must contain the gen_corpus.py data/ tree; default conf is the
harness's ``conf_ref_train.yaml`` inside WORKDIR.)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
REF = Path("/root/reference/timit")
SHIMS = REPO / "tools" / "parity" / "shims"
for p in (str(REPO), str(REF), str(SHIMS)):
    if p not in sys.path:
        sys.path.insert(0, p)


class Opts:
    batch_size = 4


def torch_side(conf: dict, n_batches: int, init_pkl: Path,
               lockstep: bool = False):
    """Reference model + loader; returns (batches, per-batch grads, stats)."""
    import torch
    import torch.nn as nn

    from models.model_ctc import CTC_Model  # noqa: E501  reference code, unmodified
    from utils.data_loader import SpeechDataLoader, SpeechDataset, Vocab

    opts = Opts()
    for k, v in conf.items():
        setattr(opts, k, v)

    torch.manual_seed(opts.seed)
    np.random.seed(opts.seed)
    vocab = Vocab(opts.vocab_file)
    dataset = SpeechDataset(vocab, opts.train_scp_path, opts.train_lab_path,
                            opts)
    loader = SpeechDataLoader(dataset, batch_size=opts.batch_size,
                              shuffle=False, num_workers=0)

    rnn_param = {
        "rnn_input_size": opts.rnn_input_size,
        "rnn_hidden_size": opts.rnn_hidden_size,
        "rnn_layers": opts.rnn_layers,
        "rnn_type": {"nn.LSTM": nn.LSTM, "nn.GRU": nn.GRU,
                     "nn.RNN": nn.RNN}[opts.rnn_type],
        "bidirectional": opts.bidirectional,
        "batch_norm": opts.batch_norm,
    }
    cnn_param = {"batch_norm": opts.batch_norm,
                 "activate_function": nn.ReLU, "layer": []}
    if opts.add_cnn:
        channel = eval(opts.channel)  # noqa: S307 — reference conf contract
        kernel_size = eval(opts.kernel_size)
        stride = eval(opts.stride)
        padding = eval(opts.padding)
        for i in range(opts.layers):
            cnn_param["layer"].append(
                [channel[i], kernel_size[i], stride[i], padding[i], None])
    model = CTC_Model(add_cnn=opts.add_cnn, cnn_param=cnn_param,
                      rnn_param=rnn_param, num_class=vocab.n_words,
                      drop_out=opts.drop_out)
    torch.save(CTC_Model.save_package(model), init_pkl)

    loss_fn = nn.CTCLoss(reduction="sum")
    optimizer = None
    if lockstep:
        # exactly train_ctc.py:145: coupled-L2 Adam, no clipping
        optimizer = torch.optim.Adam(model.parameters(), lr=opts.init_lr,
                                     weight_decay=opts.weight_decay)
    model.train()
    out_batches, out_grads, out_stats = [], [], []
    it = iter(loader)
    for _ in range(n_batches):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        inputs, input_sizes, targets, target_sizes, utts = batch
        out = model(inputs)
        out_len, batch_size, _ = out.size()
        sizes = (input_sizes * out_len).long()
        loss = loss_fn(out, targets, sizes, target_sizes) / batch_size
        model.zero_grad()
        loss.backward()
        if lockstep:
            optimizer.step()
            grads = {n: p.detach().numpy().copy()
                     for n, p in model.named_parameters()}  # post-step params
        else:
            grads = {n: p.grad.detach().numpy().copy()
                     for n, p in model.named_parameters()}
        out_batches.append(dict(
            inputs=inputs.numpy(), frac=input_sizes.numpy(),
            targets=targets.numpy(), target_sizes=target_sizes.numpy(),
        ))
        out_grads.append(dict(grads, __loss__=float(loss.detach())))
        out_stats.append({n: b.detach().numpy().copy()
                          for n, b in model.named_buffers()})
    return out_batches, out_grads, out_stats


def jax_side(init_npz: Path, batches, conf: dict, lockstep: bool = False):
    """Our framework: same loss, value_and_grad on CPU fp32/highest."""
    import jax
    import jax.numpy as jnp

    from ctc_pytorch_tpu.models import CTCModel
    from ctc_pytorch_tpu.ops import ctc_loss
    from ctc_pytorch_tpu.train.checkpoint import model_from_package

    spec, params, mstate, _ = model_from_package(init_npz)

    def forward(params, mstate, feats, frac, labels, label_lens):
        log_probs, new_mstate = CTCModel.apply(
            spec, params, mstate, feats, train=True,
            rng=jax.random.PRNGKey(0))
        t_out = log_probs.shape[0]
        input_sizes = (frac * t_out).astype(jnp.int32)
        neg_ll = ctc_loss(log_probs, labels, input_sizes, label_lens,
                          reduction="none")
        return jnp.sum(neg_ll) / feats.shape[0], new_mstate

    vg = jax.jit(jax.value_and_grad(forward, has_aux=True))
    tx = None
    opt_state = None
    if lockstep:
        from ctc_pytorch_tpu.train.state import make_optimizer

        tx = make_optimizer(float(conf["init_lr"]),
                            float(conf.get("weight_decay", 0.0)), 0.0)
        opt_state = tx.init(params)
    out = []
    for b in batches:
        (loss, new_mstate), grads = vg(
            params, mstate,
            jnp.asarray(b["inputs"], jnp.float32),
            jnp.asarray(b["frac"], jnp.float32),
            jnp.asarray(b["targets"], jnp.int32),
            jnp.asarray(b["target_sizes"], jnp.int32),
        )
        mstate = new_mstate  # thread BN running stats, as model.train() does
        if lockstep:
            import optax

            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            cmp = params
        else:
            cmp = grads
        out.append((float(loss), jax.tree.map(np.asarray, cmp),
                    jax.tree.map(np.asarray, new_mstate)))
    return spec, out


def grad_pairs(spec, tgrad: dict, jgrad: dict):
    """(torch-name, torch-grad, ours-grad) aligned pairs, layouts matched."""
    pairs = []
    if spec.add_cnn:
        for i in range(spec.cnn.layers):
            g = jgrad["cnn"][i]
            pairs += [(f"conv.{i}.conv.weight", tgrad[f"conv.{i}.conv.weight"],
                       g["w"]),
                      (f"conv.{i}.conv.bias", tgrad[f"conv.{i}.conv.bias"],
                       g["b"])]
            if "bn" in g:
                pairs += [
                    (f"conv.{i}.bn.weight",
                     tgrad[f"conv.{i}.batch_norm.weight"], g["bn"]["scale"]),
                    (f"conv.{i}.bn.bias",
                     tgrad[f"conv.{i}.batch_norm.bias"], g["bn"]["bias"]),
                ]
    for i in range(spec.rnn_layers):
        g = jgrad["rnns"][i]
        pairs += [(f"rnns.{i}.w_ih", tgrad[f"rnns.{i}.rnn.weight_ih_l0"],
                   g["fwd"]["w_ih"].T),
                  (f"rnns.{i}.w_hh", tgrad[f"rnns.{i}.rnn.weight_hh_l0"],
                   g["fwd"]["w_hh"].T)]
        if spec.bidirectional:
            pairs += [
                (f"rnns.{i}.w_ih_rev",
                 tgrad[f"rnns.{i}.rnn.weight_ih_l0_reverse"],
                 g["bwd"]["w_ih"].T),
                (f"rnns.{i}.w_hh_rev",
                 tgrad[f"rnns.{i}.rnn.weight_hh_l0_reverse"],
                 g["bwd"]["w_hh"].T),
            ]
        if "bn" in g:
            pairs += [(f"rnns.{i}.bn.weight",
                       tgrad[f"rnns.{i}.batch_norm.weight"],
                       g["bn"]["scale"]),
                      (f"rnns.{i}.bn.bias",
                       tgrad[f"rnns.{i}.batch_norm.bias"], g["bn"]["bias"])]
    if spec.batch_norm:
        pairs += [("fc.bn.weight", tgrad["fc.0.weight"],
                   jgrad["fc_bn"]["scale"]),
                  ("fc.bn.bias", tgrad["fc.0.bias"], jgrad["fc_bn"]["bias"]),
                  ("fc.weight", tgrad["fc.1.weight"], jgrad["fc"]["w"].T)]
    else:
        pairs += [("fc.weight", tgrad["fc.weight"], jgrad["fc"]["w"].T)]
    return pairs


def stat_pairs(spec, tbuf: dict, jstate: dict):
    pairs = []
    for i in range(spec.rnn_layers):
        st = jstate["rnns"][i]
        if "bn" in st:
            pairs += [(f"rnns.{i}.bn.mean",
                       tbuf[f"rnns.{i}.batch_norm.running_mean"],
                       st["bn"]["mean"]),
                      (f"rnns.{i}.bn.var",
                       tbuf[f"rnns.{i}.batch_norm.running_var"],
                       st["bn"]["var"])]
    if spec.add_cnn:
        for i in range(spec.cnn.layers):
            st = jstate["cnn"][i]
            if "bn" in st:
                pairs += [(f"conv.{i}.bn.mean",
                           tbuf[f"conv.{i}.batch_norm.running_mean"],
                           st["bn"]["mean"]),
                          (f"conv.{i}.bn.var",
                           tbuf[f"conv.{i}.batch_norm.running_var"],
                           st["bn"]["var"])]
    if spec.batch_norm:
        pairs += [("fc.bn.mean", tbuf["fc.0.running_mean"],
                   jstate["fc_bn"]["mean"]),
                  ("fc.bn.var", tbuf["fc.0.running_var"],
                   jstate["fc_bn"]["var"])]
    return pairs


def compare(name, a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
    d = a - b
    na = float(np.linalg.norm(a))
    rel = float(np.linalg.norm(d)) / max(na, 1e-30)
    cos = float(np.dot(a.ravel(), b.ravel())
                / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30))
    return dict(name=name, max_abs=float(np.abs(d).max()), rel=rel, cos=cos,
                norm_ref=na)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--conf", default=None)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--lockstep", action="store_true",
                    help="run real Adam steps on BOTH sides over the same "
                         "batch sequence and compare PARAMETER drift "
                         "(covers optimizer + BN threading end-to-end)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    wd = Path(args.workdir).resolve()
    # pin jax to CPU/fp32-highest BEFORE any transitive jax backend init
    # (the kaldiio shim imports our kaldi_io, which imports jax)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import yaml

    conf_path = Path(args.conf) if args.conf else wd / "conf_ref_train.yaml"
    conf = yaml.safe_load(conf_path.read_text())

    init_pkl = wd / "grad_init.pkl"
    batches, tgrads, tstats = torch_side(conf, args.batches, init_pkl,
                                         lockstep=args.lockstep)
    print(f"torch side done: {len(batches)} batches"
          f"{' (lockstep)' if args.lockstep else ''}", flush=True)

    init_npz = wd / "grad_init.npz"
    from ctc_pytorch_tpu.cli.import_torch import import_torch_package

    import_torch_package(str(init_pkl), str(init_npz))
    spec, jouts = jax_side(init_npz, batches, conf, lockstep=args.lockstep)

    report = []
    for bi, (tg, (jloss, jg, jms)) in enumerate(zip(tgrads, jouts)):
        tloss = tg.pop("__loss__")
        rows = [compare(n, a, b) for n, a, b in grad_pairs(spec, tg, jg)]
        srows = [compare(n, a, b)
                 for n, a, b in stat_pairs(spec, tstats[bi], jms)]
        worst = max(rows, key=lambda r: r["rel"])
        print(f"\n== batch {bi}: loss torch={tloss:.6f} ours={jloss:.6f} "
              f"d={abs(tloss - jloss):.2e}")
        for r in sorted(rows, key=lambda r: -r["rel"]):
            print(f"  {r['name']:28s} rel={r['rel']:.3e} "
                  f"max|d|={r['max_abs']:.3e} cos={r['cos']:.8f}")
        for r in srows:
            print(f"  [bn-stat] {r['name']:22s} rel={r['rel']:.3e} "
                  f"max|d|={r['max_abs']:.3e}")
        report.append(dict(batch=bi, loss_torch=tloss, loss_ours=jloss,
                           grads=rows, bn_stats=srows,
                           worst_rel=worst["rel"]))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
