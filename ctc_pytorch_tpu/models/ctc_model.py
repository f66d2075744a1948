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
    # Train-time dynamics of the padding region (config.py Config for the
    # full story):
    #   'batchmax' — reference-exact per-batch-max emulation at static
    #     shapes: BN statistics stop at the batch's true max length (a
    #     traced scalar) and everything beyond is zeroed, which bias-free
    #     RNNs (model_ctc.py:24-25) carry as exact zero state.  The loss's
    #     fractional-length rescale also uses the batch max, reproducing
    #     create_input's frac = len/batch_max (data_loader.py:137) +
    #     train_ctc.py:46 to the same float32 ops.
    #   'padded'   — BN over the full padded plane (reference quirk applied
    #     to the bucket boundary).
    #   'valid'    — per-utterance masked BN (cleaner-than-reference
    #     estimator; measured worse at hard regimes).
    pad_dynamics: str = "batchmax"

    def __post_init__(self):
        if self.pad_dynamics not in ("batchmax", "padded", "valid"):
            raise ValueError(
                f"pad_dynamics must be 'batchmax', 'padded' or 'valid', "
                f"got {self.pad_dynamics!r}"
            )

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
            pad_dynamics=(
                "valid" if (cfg.bn_mask_padding
                            and cfg.pad_dynamics == "batchmax")
                else cfg.pad_dynamics
            ),
        )

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["cnn"] = dataclasses.asdict(self.cnn)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "ModelSpec":
        d = dict(d)
        # pre-round-5 checkpoints carry bn_mask_padding instead of
        # pad_dynamics; rebuild them with their original training dynamics
        if "pad_dynamics" not in d:
            d["pad_dynamics"] = (
                "valid" if d.pop("bn_mask_padding", False) else "padded"
            )
        else:
            d.pop("bn_mask_padding", None)
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
    def batch_max_frames(
        frac: jnp.ndarray,
        t_in: int,
        example_mask: Optional[jnp.ndarray] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """True per-utterance input frames + the batch max (traced scalars).

        ``frac`` is the collate's float32 ``len / T_pad`` (data_loader.py:137
        contract applied to the bucket boundary); T_pad stays far below 2^23
        so ``round(frac * T_pad)`` recovers the integer length exactly.
        Repeat-padded rows are excluded from the max; inside ``shard_map``
        the max reduces over the data axis so it equals the reference's
        whole-batch max."""
        true_in = jnp.round(frac * t_in).astype(jnp.int32)
        rows = (true_in if example_mask is None
                else jnp.where(example_mask > 0, true_in, 0))
        bmax = jnp.maximum(jnp.max(rows), 1)
        if axis_name is not None:
            bmax = jax.lax.pmax(bmax, axis_name)
        return true_in, bmax

    @staticmethod
    def input_sizes(
        spec: "ModelSpec",
        frac: jnp.ndarray,
        t_in: int,
        t_out: int,
        example_mask: Optional[jnp.ndarray] = None,
        axis_name: Optional[str] = None,
    ) -> jnp.ndarray:
        """Valid output frames for the loss/decode (``train_ctc.py:46``).

        'batchmax' reproduces the reference's arithmetic exactly: frac is
        recomputed against the batch max (``create_input``,
        data_loader.py:137) and rescaled by the model's output length FOR
        the batch max, in the same float32 ops torch runs — including its
        truncation quirks.  Other modes rescale the stored boundary-relative
        frac by the padded output length."""
        if spec.pad_dynamics != "batchmax":
            return (frac * t_out).astype(jnp.int32)
        true_in, bmax = CTCModel.batch_max_frames(
            frac, t_in, example_mask, axis_name
        )
        t_out_b = spec.output_time_len(bmax)
        q = true_in.astype(jnp.float32) / bmax.astype(jnp.float32)
        return (q * jnp.asarray(t_out_b, jnp.float32)).astype(jnp.int32)

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
        example_mask: Optional[jnp.ndarray] = None,
    ):
        """(B, T, F) -> log_probs (T', B, num_class), new_state[, visual].

        ``axis_name``: when the step runs per-shard inside ``shard_map``
        over a data mesh, BN batch statistics psum over this axis so the
        math stays identical to the single-device global batch.

        ``frac``: the fractional-length contract values (valid/padded
        frames, ``train_ctc.py:46``).  Drives the padding-masked BN planes:

        - ``pad_dynamics='batchmax'``: every BN (conv-stack 2D BNs
          included) takes statistics over frames below the batch's true
          max length — a traced scalar, so the compiled shape still the
          bucket boundary — and the region beyond is zeroed, which
          bias-free RNNs carry as exact zero state.  Forward, loss and
          gradients become exactly those of a per-batch-max-padded batch
          (the reference's ``create_input``), for any bucket count
          (tests/test_pad_dynamics.py).
        - ``'valid'``: per-utterance masking (see ``batchnorm_apply``) —
          with bias-free RNNs the no-CNN forward/backward is then exactly
          padding-independent; CNN configs mask the RNN-level BNs but the
          conv stack's own BN still sees padding.
        - ``'padded'``: no masking (BN normalises the whole plane).

        ``example_mask``: (B,) 0/1 validity of batch rows; repeat-padded
        rows of ragged final batches are excluded from batchmax BN
        statistics the way the reference's genuinely-smaller final batch
        never contributes them."""
        compute_dtype = jnp.dtype(spec.compute_dtype)
        new_state: Dict[str, Any] = {}
        visual = [x] if visualize else None
        r_cnn = r_rnn = None
        if rng is not None and train:
            r_cnn, r_rnn = jax.random.split(rng)

        t_in = x.shape[1]
        bmax = None
        if frac is not None and spec.pad_dynamics == "batchmax":
            _, bmax = CTCModel.batch_max_frames(
                frac, t_in, example_mask, axis_name
            )

        if spec.add_cnn:
            out, new_state["cnn"] = cnn_stack_apply(
                params["cnn"], state["cnn"], x[:, None, :, :], spec.cnn,
                train=train, drop_rate=spec.drop_out, rng=r_cnn,
                compute_dtype=compute_dtype, axis_name=axis_name,
                t_valid=bmax, example_mask=example_mask,
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
        t_rnn = out.shape[0]
        if spec.pad_dynamics == "valid" and frac is not None:
            # valid frames at the RNN input, via the same truncating
            # contract the loss uses (train_ctc.py:46)
            valid = (frac * t_rnn).astype(jnp.int32)
            bn_mask = (
                jnp.arange(t_rnn)[:, None] < valid[None, :]
            ).astype(jnp.float32)  # (T', B)
        elif bmax is not None:
            # batchmax: one cutoff for the whole batch — the conv output
            # length the reference would have produced for a batch padded
            # to its true max (same floor arithmetic, traced operand)
            t_cut = spec.output_time_len(bmax)
            bn_mask = jnp.arange(t_rnn)[:, None] < t_cut  # (T', 1)->(T', B)
            bn_mask = jnp.broadcast_to(bn_mask, (t_rnn, out.shape[1]))
            if example_mask is not None:
                bn_mask = jnp.logical_and(
                    bn_mask, (example_mask > 0)[None, :]
                )
            bn_mask = bn_mask.astype(jnp.float32)

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
