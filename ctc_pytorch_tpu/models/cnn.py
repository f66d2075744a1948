"""Convolutional front-end: XLA convs (already TPU-native, mapped to the MXU).

Equivalent of ``LayerCNN`` (``timit/models/model_ctc.py:38-68``): per layer
Conv2d -> BatchNorm2d -> activation -> optional MaxPool -> dropout, over
``(B, C, T, F)``.  Also covers the 863 fixed conv (1->16ch, kernel (11,5),
stride (2,2), Hardtanh(0,20), ``my_863_corpus/steps/model.py:168-234``) via
the ``hardtanh`` activation option.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig
from ctc_pytorch_tpu.models.layers import kaiming_uniform, uniform_init

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "hardtanh": lambda x: jnp.clip(x, 0.0, 20.0),  # 863's Hardtanh(0, 20)
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def conv_layer_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int],
                    batch_norm: bool) -> Tuple[Dict, Dict]:
    kw, kb, _ = jax.random.split(key, 3)
    fan_in = in_ch * kernel[0] * kernel[1]
    params = {
        # OIHW layout, torch Conv2d default init (kaiming uniform + bias)
        "w": kaiming_uniform(kw, (out_ch, in_ch, kernel[0], kernel[1]), fan_in),
        "b": uniform_init(kb, (out_ch,), 1.0 / math.sqrt(fan_in)),
    }
    state = {}
    if batch_norm:
        params["bn"] = {"scale": jnp.ones((out_ch,)), "bias": jnp.zeros((out_ch,))}
        state["bn"] = {"mean": jnp.zeros((out_ch,)), "var": jnp.ones((out_ch,))}
    return params, state


def _bn2d(params, state, x, train: bool, momentum=0.1, eps=1e-5):
    """BatchNorm2d over channel axis of (B, C, T, F)."""
    if train:
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    shape = (1, -1, 1, 1)
    out = (x - mean.reshape(shape)) * (inv * params["scale"]).reshape(shape)
    return out + params["bias"].reshape(shape), new_state


def cnn_stack_init(key, cnn: CNNConfig) -> Tuple[List[Dict], List[Dict]]:
    params, states = [], []
    keys = jax.random.split(key, max(cnn.layers, 1))
    for i in range(cnn.layers):
        p, s = conv_layer_init(
            keys[i], cnn.channel[i][0], cnn.channel[i][1], cnn.kernel_size[i],
            cnn.batch_norm,
        )
        params.append(p)
        states.append(s)
    return params, states


def cnn_stack_apply(
    params: List[Dict],
    states: List[Dict],
    x: jnp.ndarray,
    cnn: CNNConfig,
    *,
    train: bool = False,
    drop_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, List[Dict]]:
    """(B, 1, T, F) -> (B, C_out, T', F'), plus new BN states."""
    from ctc_pytorch_tpu.models.layers import dropout

    act = ACTIVATIONS[cnn.activation_function.lower()]
    new_states = []
    rngs = (
        jax.random.split(rng, len(params)) if (rng is not None and train) else
        [None] * len(params)
    )
    for i, (p, s, r) in enumerate(zip(params, states, rngs)):
        stride = cnn.stride[i]
        pad = cnn.padding[i]
        # no preferred_element_type here: its VJP mixes bf16/fp32 operand
        # dtypes and fails; the TPU MXU accumulates bf16 convs in fp32 anyway
        out = jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            window_strides=stride,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ).astype(jnp.float32)
        out = out + p["b"].reshape(1, -1, 1, 1)
        ns = dict(s)
        if "bn" in p:
            out, ns["bn"] = _bn2d(p["bn"], s["bn"], out, train)
        out = act(out)
        if cnn.pooling:
            pk = cnn.pooling[i]
            out = jax.lax.reduce_window(
                out, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, pk[0], pk[1]),
                window_strides=(1, 1, pk[0], pk[1]),
                padding="VALID",
            )
        out = dropout(out, drop_rate, r, train)
        x = out
        new_states.append(ns)
    return x, new_states
