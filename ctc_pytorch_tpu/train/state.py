"""Train state: params + mutable model state + optimizer, as one pytree.

Optimizer matches the reference recipe: torch ``Adam(lr, weight_decay)``
(``timit/steps/train_ctc.py:145``) — i.e. **coupled** L2 (decay added to the
gradient before the Adam moments, not AdamW) — plus the 863 recipe's optional
global-norm gradient clipping at 400 (``cnn_lstm_ctc.py:52``).  The learning
rate lives in the optimizer state via ``inject_hyperparams`` so the plateau
scheduler can rescale it without rebuilding the optimizer (and so it rides
along in checkpoints and rollback snapshots, like torch's
``optimizer.state_dict()``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    model_state: Any  # batch-norm running stats
    opt_state: Any


def make_optimizer(
    init_lr: float, weight_decay: float = 0.0, grad_clip: float = 0.0
) -> optax.GradientTransformation:
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and weight_decay > 0:
        # torch-Adam-style coupled L2: decay enters the gradient pre-moments
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(
        optax.inject_hyperparams(optax.adam)(learning_rate=init_lr)
    )
    return optax.chain(*chain)


def get_lr(opt_state) -> float:
    return float(_find_hyperparams(opt_state)["learning_rate"])


def scale_lr(opt_state, factor: float):
    """Return opt_state with learning_rate multiplied by ``factor``."""

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            hp = dict(node.hyperparams)
            hp["learning_rate"] = hp["learning_rate"] * factor
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple):
            children = (visit(x) for x in node)
            return type(node)(*children) if hasattr(node, "_fields") else tuple(children)
        return node

    return visit(opt_state)


def _find_hyperparams(node) -> Dict:
    if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
        return node.hyperparams
    if isinstance(node, tuple):
        for child in node:
            try:
                return _find_hyperparams(child)
            except ValueError:
                continue
    raise ValueError("no injected learning_rate found in opt_state")


def create_train_state(
    key: jax.Array,
    spec: ModelSpec,
    init_lr: float,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
):
    params, model_state = CTCModel.init(key, spec)
    tx = make_optimizer(init_lr, weight_decay, grad_clip)
    opt_state = tx.init(params)
    state = TrainState(jnp.zeros((), jnp.int32), params, model_state, opt_state)
    return state, tx


def snapshot(state: TrainState) -> TrainState:
    """Device-side deep copy (the reference's ``copy.deepcopy`` of the model
    and optimizer state dicts, ``train_ctc.py:198-199``)."""
    return jax.tree_util.tree_map(jnp.copy, state)
