"""Import a reference PyTorch checkpoint "package" into this framework.

A user of the reference saves ``ctc_best_model.pkl`` via
``CTC_Model.save_package`` (``timit/models/model_ctc.py:209-229``):
hyperparams (``rnn_param``, ``cnn_param``, ``add_cnn``, ``num_class``,
``_drop_out``) + ``state_dict``.  This tool rebuilds a ``ModelSpec`` from
those hyperparams and transposes the state_dict tensors into our parameter
pytree (weights are layout-compatible: torch ``weight_ih_l0`` is (4H, F)
gate-major i,f,g,o — ours is its transpose), producing a package our
``cli/test.py`` / ``cli/visualize.py`` consume directly.

Usage: ``python -m ctc_pytorch_tpu.cli.import_torch ref.pkl out.npz``.
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np

from ctc_pytorch_tpu.config import CNNConfig
from ctc_pytorch_tpu.models.ctc_model import ModelSpec


def spec_from_torch_package(pkg: Dict) -> ModelSpec:
    rnn = pkg["rnn_param"]
    add_cnn = bool(pkg.get("add_cnn", False))
    cnn_cfg = CNNConfig(add_cnn=add_cnn)
    if add_cnn and pkg.get("cnn_param"):
        layers = pkg["cnn_param"]["layer"]
        cnn_cfg = CNNConfig(
            add_cnn=True,
            layers=len(layers),
            channel=[tuple(l[0]) for l in layers],
            kernel_size=[tuple(l[1]) for l in layers],
            stride=[tuple(l[2]) for l in layers],
            padding=[tuple(l[3]) for l in layers],
            # pooling is PER LAYER in the reference tuples (l[4] may be
            # None for some layers and a window for others)
            pooling=(
                [tuple(l[4]) if l[4] is not None else None for l in layers]
                if any(l[4] is not None for l in layers) else None
            ),
            batch_norm=bool(pkg["cnn_param"].get("batch_norm", True)),
        )
    rnn_type = rnn.get("rnn_type", "lstm")
    cell = getattr(rnn_type, "__name__", str(rnn_type)).lower()
    for name in ("lstm", "gru", "rnn"):
        if name in cell:
            cell = name
            break
    return ModelSpec(
        add_cnn=add_cnn,
        cnn=cnn_cfg,
        rnn_input_size=int(rnn["rnn_input_size"]),
        rnn_hidden_size=int(rnn["rnn_hidden_size"]),
        rnn_layers=int(rnn["rnn_layers"]),
        rnn_cell=cell,
        bidirectional=bool(rnn.get("bidirectional", True)),
        batch_norm=bool(rnn.get("batch_norm", True)),
        num_class=int(pkg["num_class"]),
        drop_out=float(pkg.get("_drop_out", 0.0)),
        compute_dtype="float32",
    )


def params_from_state_dict(spec: ModelSpec, sd: Dict) -> tuple:
    """torch state_dict -> (params, model_state) pytrees."""
    import jax

    from ctc_pytorch_tpu.models import CTCModel

    def arr(key):
        v = sd[key]
        return np.asarray(v.detach().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    params, state = CTCModel.init(jax.random.PRNGKey(0), spec)

    if spec.add_cnn:
        for i in range(spec.cnn.layers):
            p = params["cnn"][i]
            p["w"] = arr(f"conv.{i}.conv.weight")
            p["b"] = arr(f"conv.{i}.conv.bias")
            if "bn" in p:
                p["bn"]["scale"] = arr(f"conv.{i}.batch_norm.weight")
                p["bn"]["bias"] = arr(f"conv.{i}.batch_norm.bias")
                st = state["cnn"][i]["bn"]
                st["mean"] = arr(f"conv.{i}.batch_norm.running_mean")
                st["var"] = arr(f"conv.{i}.batch_norm.running_var")

    for i in range(spec.rnn_layers):
        p = params["rnns"][i]
        p["fwd"]["w_ih"] = arr(f"rnns.{i}.rnn.weight_ih_l0").T
        p["fwd"]["w_hh"] = arr(f"rnns.{i}.rnn.weight_hh_l0").T
        if spec.bidirectional:
            p["bwd"]["w_ih"] = arr(f"rnns.{i}.rnn.weight_ih_l0_reverse").T
            p["bwd"]["w_hh"] = arr(f"rnns.{i}.rnn.weight_hh_l0_reverse").T
        if "bn" in p:
            p["bn"]["scale"] = arr(f"rnns.{i}.batch_norm.weight")
            p["bn"]["bias"] = arr(f"rnns.{i}.batch_norm.bias")
            st = state["rnns"][i]["bn"]
            st["mean"] = arr(f"rnns.{i}.batch_norm.running_mean")
            st["var"] = arr(f"rnns.{i}.batch_norm.running_var")

    if spec.batch_norm:
        params["fc_bn"]["scale"] = arr("fc.0.weight")
        params["fc_bn"]["bias"] = arr("fc.0.bias")
        state["fc_bn"]["mean"] = arr("fc.0.running_mean")
        state["fc_bn"]["var"] = arr("fc.0.running_var")
        params["fc"]["w"] = arr("fc.1.weight").T
    else:
        params["fc"]["w"] = arr("fc.weight").T
    return params, state


def import_torch_package(pkl_path: str, out_path: str) -> str:
    import torch

    from ctc_pytorch_tpu.train.checkpoint import save_package
    from ctc_pytorch_tpu.train.state import TrainState

    import jax.numpy as jnp

    pkg = torch.load(pkl_path, map_location="cpu", weights_only=False)
    spec = spec_from_torch_package(pkg)
    params, mstate = params_from_state_dict(spec, pkg["state_dict"])
    state = TrainState(jnp.zeros((), jnp.int32), params, mstate, ())
    save_package(
        out_path, spec, state,
        epoch=(pkg.get("epoch") or {}).get("epoch")
        if isinstance(pkg.get("epoch"), dict) else pkg.get("epoch"),
        loss_results=list(np.ravel(pkg.get("loss_results", []) or [])),
        dev_loss_results=list(np.ravel(pkg.get("dev_loss_results", []) or [])),
        dev_cer_results=list(np.ravel(pkg.get("dev_cer_results", []) or [])),
    )
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description="import reference torch checkpoint")
    p.add_argument("pkl")
    p.add_argument("out")
    args = p.parse_args(argv)
    out = import_torch_package(args.pkl, args.out)
    print(f"imported {args.pkl} -> {out}")


if __name__ == "__main__":
    main()
