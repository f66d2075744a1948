"""The CTC acoustic model: optional CNN stack -> stacked (bi)RNNs -> BN+Linear
-> log-softmax, as pure functions over a params/state pytree.

Functional re-design of ``CTC_Model`` (``timit/models/model_ctc.py:70-185``):

- hyperparameters live in an immutable ``ModelSpec`` (stored whole inside
  checkpoints, reproducing the checkpoint-as-model-description contract of
  ``save_package``/``test_ctc.py:38-60``);
- ``init`` returns ``(params, state)`` pytrees; ``apply`` is pure and jittable,
  returning ``(log_probs[T,B,C], new_state)`` (+ intermediate activations when
  ``visualize=True``, mirroring ``forward(visualize=True)``);
- the CNN output reshape follows the reference exactly:
  ``(B, C, T', F') -> (T', B, C*F')`` (``model_ctc.py:153-158``);
- the final classifier is BN + bias-free Linear over flattened ``(T*B, H)``
  (``model_ctc.py:135-140``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.models.cnn import cnn_stack_apply, cnn_stack_init
from ctc_pytorch_tpu.models.layers import (
    batchnorm_apply,
    batchnorm_init,
    linear_apply,
    linear_init,
)
from ctc_pytorch_tpu.models.rnn import rnn_stack_apply, rnn_stack_init


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Everything needed to rebuild the model (checkpoint contract)."""

    add_cnn: bool
    cnn: CNNConfig
    rnn_input_size: int
    rnn_hidden_size: int
    rnn_layers: int
    rnn_cell: str  # lstm | gru | rnn
    bidirectional: bool
    batch_norm: bool
    num_class: int
    drop_out: float
    compute_dtype: str = "bfloat16"
    use_pallas_rnn: bool = False  # fused Pallas LSTM scan on the eval path
    remat: bool = False  # rematerialise RNN layers in the backward pass
    # train-time BN statistics over valid frames only, making training
    # dynamics independent of padded length (the reference normalises
    # padding too, model_ctc.py:29-32 — with bias-free RNNs that BN plane
    # is the ONLY padding leak in no-CNN configs, so this flag makes
    # bucketed/quantized static-shape batching cost zero accuracy)
    bn_mask_padding: bool = False

    @classmethod
    def from_config(cls, cfg: Config, num_class: int) -> "ModelSpec":
        return cls(
            add_cnn=cfg.cnn.add_cnn,
            cnn=cfg.cnn,
            rnn_input_size=cfg.rnn_input_size,
            rnn_hidden_size=cfg.rnn_hidden_size,
            rnn_layers=cfg.rnn_layers,
            rnn_cell=cfg.rnn_cell,
            bidirectional=cfg.bidirectional,
            batch_norm=cfg.batch_norm,
            num_class=num_class,
            drop_out=cfg.drop_out,
            compute_dtype=cfg.dtype,
            use_pallas_rnn=cfg.use_pallas_rnn,
            remat=cfg.remat,
            bn_mask_padding=cfg.bn_mask_padding,
        )

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["cnn"] = dataclasses.asdict(self.cnn)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "ModelSpec":
        d = dict(d)
        cnn = d.pop("cnn")
        for pk in ("channel", "kernel_size", "stride", "padding"):
            cnn[pk] = [tuple(p) for p in cnn[pk]]
        if cnn.get("pooling"):
            # entries are PER LAYER and may be None for unpooled layers
            cnn["pooling"] = [
                tuple(p) if p is not None else None for p in cnn["pooling"]
            ]
        return cls(cnn=CNNConfig(**cnn), **d)

    @property
    def rnn_in_after_cnn(self) -> int:
        """Post-CNN feature size: freq' * out_channels (``model_ctc.py:111,116``)."""
        if not self.add_cnn:
            return self.rnn_input_size
        f = self.cnn.output_freq_len(self.rnn_input_size)
        return f * self.cnn.channel[-1][1]

    @property
    def dirs(self) -> int:
        return 2 if self.bidirectional else 1

    def output_time_len(self, t: int) -> int:
        """Frames out of the model for ``t`` frames in — rescales the
        fractional ``input_sizes`` contract (``train_ctc.py:46``)."""
        return self.cnn.output_time_len(t) if self.add_cnn else t


class CTCModel:
    """Namespace of pure functions over (spec, params, state)."""

    @staticmethod
    def init(key: jax.Array, spec: ModelSpec) -> Tuple[Dict, Dict]:
        k_cnn, k_rnn, k_fc, k_bn = jax.random.split(key, 4)
        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}
        if spec.add_cnn:
            params["cnn"], state["cnn"] = cnn_stack_init(k_cnn, spec.cnn)
        params["rnns"], state["rnns"] = rnn_stack_init(
            k_rnn,
            cell=spec.rnn_cell,
            input_size=spec.rnn_in_after_cnn,
            hidden_size=spec.rnn_hidden_size,
            num_layers=spec.rnn_layers,
            bidirectional=spec.bidirectional,
            batch_norm=spec.batch_norm,
        )
        fc_in = spec.dirs * spec.rnn_hidden_size
        if spec.batch_norm:
            params["fc_bn"], state["fc_bn"] = batchnorm_init(fc_in)
        params["fc"] = linear_init(k_fc, fc_in, spec.num_class, bias=False)
        return params, state

    @staticmethod
    def apply(
        spec: ModelSpec,
        params: Dict,
        state: Dict,
        x: jnp.ndarray,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        lengths: Optional[jnp.ndarray] = None,
        visualize: bool = False,
        axis_name: Optional[str] = None,
        frac: Optional[jnp.ndarray] = None,
    ):
        """(B, T, F) -> log_probs (T', B, num_class), new_state[, visual].

        ``axis_name``: when the step runs per-shard inside ``shard_map``
        over a data mesh, BN batch statistics psum over this axis so the
        math stays identical to the single-device global batch.

        ``frac``: the fractional-length contract values (valid/padded
        frames, ``train_ctc.py:46``).  Only used when
        ``spec.bn_mask_padding`` — BN planes then take statistics over
        valid frames only and zero the padding (see ``batchnorm_apply``),
        which with bias-free RNNs makes the no-CNN forward/backward exactly
        independent of the padded length.  CNN configs mask the RNN-level
        BNs the same way but the conv stack's own BN still sees padding,
        so invariance there is approximate."""
        compute_dtype = jnp.dtype(spec.compute_dtype)
        new_state: Dict[str, Any] = {}
        visual = [x] if visualize else None
        r_cnn = r_rnn = None
        if rng is not None and train:
            r_cnn, r_rnn = jax.random.split(rng)

        if spec.add_cnn:
            out, new_state["cnn"] = cnn_stack_apply(
                params["cnn"], state["cnn"], x[:, None, :, :], spec.cnn,
                train=train, drop_rate=spec.drop_out, rng=r_cnn,
                compute_dtype=compute_dtype, axis_name=axis_name,
            )
            if visualize:
                # visual contract stays (B, C, T', F') — the stack itself
                # now runs/returns channels-last (see cnn_stack_apply)
                visual.append(out.transpose(0, 3, 1, 2).astype(jnp.float32))
            b, t, f, c = out.shape
            # NHWC (B, T', F', C) -> (T', B, C, F') -> (T', B, C*F'):
            # C-major features, same ordering as the reference's
            # (B, C, T, F) -> (T, B, C*F) reshape (model_ctc.py:153-158)
            out = out.transpose(1, 0, 3, 2).reshape(t, b, c * f)
            if visualize:
                visual.append(out)
        else:
            out = x.transpose(1, 0, 2)

        bn_mask = None
        if spec.bn_mask_padding and frac is not None:
            # valid frames at the RNN input, via the same truncating
            # contract the loss uses (train_ctc.py:46)
            t_rnn = out.shape[0]
            valid = (frac * t_rnn).astype(jnp.int32)
            bn_mask = (
                jnp.arange(t_rnn)[:, None] < valid[None, :]
            ).astype(jnp.float32)  # (T', B)

        out, new_state["rnns"] = rnn_stack_apply(
            params["rnns"], state["rnns"], out,
            cell=spec.rnn_cell, hidden_size=spec.rnn_hidden_size,
            drop_rate=spec.drop_out, train=train, rng=r_rnn, lengths=lengths,
            compute_dtype=compute_dtype,
            pallas=spec.use_pallas_rnn,
            remat=spec.remat,
            axis_name=axis_name,
            bn_mask=bn_mask,
        )

        t, b, h = out.shape
        flat = out.reshape(t * b, h)
        if spec.batch_norm:
            flat, new_state["fc_bn"] = batchnorm_apply(
                params["fc_bn"], state["fc_bn"], flat, train,
                axis_name=axis_name, mask=bn_mask,
            )
        logits = linear_apply(params["fc"], flat, compute_dtype)
        logits = logits.reshape(t, b, -1).astype(jnp.float32)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        if visualize:
            visual.append(log_probs)
            return log_probs, new_state, visual
        return log_probs, new_state

    @staticmethod
    def add_weights_noise(key: jax.Array, params: Dict, stddev: float = 0.075):
        """Gaussian weight noise (``model_ctc.py:204-207``)."""
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        noisy = [
            leaf + stddev * jax.random.normal(k, leaf.shape, leaf.dtype)
            for leaf, k in zip(leaves, keys)
        ]
        return jax.tree_util.tree_unflatten(treedef, noisy)
