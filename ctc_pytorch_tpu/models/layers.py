"""Shared functional layers: batch-norm, dropout, linear, initialisers.

Params and mutable state are plain pytrees (dicts), so the whole model jits,
shards, and checkpoints without a module framework — and Pallas kernels can be
swapped under the same interfaces.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def uniform_init(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_rnn_init(key, shape, hidden_size: int, dtype=jnp.float32):
    """torch nn.LSTM/GRU/RNN default: U(-1/sqrt(H), 1/sqrt(H))."""
    return uniform_init(key, shape, 1.0 / math.sqrt(hidden_size), dtype)


def kaiming_uniform(key, shape, fan_in: int, dtype=jnp.float32):
    """torch Conv/Linear default (kaiming uniform, a=sqrt(5))."""
    return uniform_init(key, shape, 1.0 / math.sqrt(fan_in), dtype)


# ---------------------------------------------------------------------------
# BatchNorm over the feature axis (reference BatchRNN/fc BN semantics:
# statistics over every (time, batch) position per feature, padding included —
# model_ctc.py:29-32,135-140)
# ---------------------------------------------------------------------------

def batchnorm_init(dim: int) -> Tuple[Dict, Dict]:
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)),
             "count": jnp.zeros((), jnp.int32)}
    return params, state


def batchnorm_apply(
    params: Dict,
    state: Dict,
    x: jnp.ndarray,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Normalise the last axis of ``x`` (any leading shape).

    ``axis_name``: inside ``shard_map`` over a data mesh, batch statistics
    are psum-reduced over the named axis so training numerics match the
    single-device global-batch computation (the TPU-native equivalent of
    SyncBatchNorm — the reference's BN sees the whole batch on one GPU).

    ``mask``: optional 0/1 validity over the leading (flattened) positions.
    When given, train-time batch statistics are computed over valid
    positions only — this removes the reference's padding-in-BN quirk
    (``model_ctc.py:29-32`` normalises every (time, batch) slot including
    zero padding), making training dynamics independent of the padded
    length.  Invalid positions are zeroed after normalisation (train AND
    eval), so bias-free recurrences downstream stay exactly zero through
    padding — without this, BN's ``bias - mean*scale/std`` offset leaks
    batch statistics into the padded frames that seed the backward-RNN
    scan, and padding-invariance would not hold.
    """
    feat = x.shape[-1]
    flat = x.reshape(-1, feat)
    if train:
        if mask is not None:
            m = mask.reshape(-1, 1).astype(flat.dtype)
            n = jnp.sum(m)
            s1 = jnp.sum(flat * m, axis=0)
            s2 = jnp.sum(flat * flat * m, axis=0)
            if axis_name is not None:
                n = jax.lax.psum(n, axis_name)
                s1 = jax.lax.psum(s1, axis_name)
                s2 = jax.lax.psum(s2, axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = s2 / n - mean * mean
        elif axis_name is not None:
            n = flat.shape[0] * jax.lax.psum(1, axis_name)
            mean = jax.lax.psum(jnp.sum(flat, axis=0), axis_name) / n
            sq = jax.lax.psum(jnp.sum(flat * flat, axis=0), axis_name) / n
            var = sq - mean * mean
        else:
            mean = jnp.mean(flat, axis=0)
            var = jnp.var(flat, axis=0)
            n = flat.shape[0]
        # torch running_var uses the unbiased estimator
        unbiased = var * (n / jnp.maximum(n - 1, 1)
                          if mask is not None else n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * (inv * params["scale"]) + params["bias"]
    if mask is not None:
        out = out * mask.reshape(x.shape[:-1] + (1,)).astype(out.dtype)
    return out.astype(x.dtype), new_state


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    # Mask generation via the hardware RngBitGenerator (unsafe_rbg): the
    # default threefry is ALU-heavy on TPU and dropout masks on the CNN
    # planes (~100M elements/step at flagship shapes) made it a top-3 step
    # cost.  Deterministic per key, which is all dropout needs.
    data = rng if rng.dtype == jnp.uint32 else jax.random.key_data(rng)
    rbg = jax.random.wrap_key_data(
        jnp.concatenate([data, data]), impl="unsafe_rbg"
    )
    # uint8 threshold compare instead of bernoulli's f32 uniforms: 1/4 the
    # RBG word traffic for the same mask plane.  The keep probability is
    # quantized to n/256; the inverse-keep scale uses the quantized value so
    # E[dropout(x)] == x exactly (rate=0.2 -> keep 205/256 = 0.8008).
    # clamp to [1, 255]: 256 would wrap the uint8 compare to "drop all"
    thresh = min(max(int(round((1.0 - rate) * 256.0)), 1), 255)
    bits = jax.random.bits(rbg, x.shape, jnp.uint8)
    keep_q = thresh / 256.0
    return jnp.where(bits < jnp.uint8(thresh), x / keep_q, 0.0).astype(x.dtype)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = False) -> Dict:
    kw, kb = jax.random.split(key)
    params = {"w": kaiming_uniform(kw, (in_dim, out_dim), in_dim)}
    if bias:
        params["b"] = uniform_init(kb, (out_dim,), 1.0 / math.sqrt(in_dim))
    return params


def linear_apply(params: Dict, x: jnp.ndarray, compute_dtype=jnp.float32):
    out = jnp.dot(
        x.astype(compute_dtype),
        params["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if "b" in params:
        out = out + params["b"]
    return out
