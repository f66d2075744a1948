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


def _bn2d(params, state, x, train: bool, momentum=0.1, eps=1e-5,
          axis_name=None, mask=None):
    """BatchNorm2d over the channel axis of NHWC ``(B, T, F, C)``.

    Stats accumulate in fp32 regardless of the plane dtype; the normalized
    output stays in the input dtype (bf16 planes at flagship shapes halve
    the HBM traffic of these full-plane passes).  ``axis_name`` psum-reduces
    the moments over a shard_map data axis (sync-BN; see layers.py).

    ``mask``: optional (B, T, 1, 1) 0/1 validity — train-time statistics
    then cover valid (row, frame) slots only (the batchmax pad-dynamics
    mode; the caller zeroes the planes separately).
    """
    if train:
        xf = x.astype(jnp.float32)
        if mask is not None:
            m = mask.astype(jnp.float32)
            n = jnp.sum(m) * x.shape[2]
            s1 = jnp.sum(xf * m, axis=(0, 1, 2))
            s2 = jnp.sum(xf * xf * m, axis=(0, 1, 2))
            if axis_name is not None:
                n = jax.lax.psum(n, axis_name)
                s1 = jax.lax.psum(s1, axis_name)
                s2 = jax.lax.psum(s2, axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = s2 / n - mean * mean
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        else:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if axis_name is not None:
                n = n * jax.lax.psum(1, axis_name)
                mean = jax.lax.psum(
                    jnp.sum(xf, axis=(0, 1, 2)), axis_name) / n
                sq = jax.lax.psum(
                    jnp.sum(xf * xf, axis=(0, 1, 2)), axis_name) / n
                var = sq - mean * mean
            else:
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.var(xf, axis=(0, 1, 2))
            unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * (inv * params["scale"]) + params["bias"]
    return out.astype(x.dtype), new_state


def _s2d_conv(x: jnp.ndarray, w_hwio: jnp.ndarray,
              stride: Tuple[int, int], pad: Tuple[int, int]) -> jnp.ndarray:
    """Strided conv as space-to-depth + stride-1 conv (same math).

    A near-empty conv (C_in=1, few output channels) leaves the MXU idle:
    the 863 front (1->16ch, k(11,5), s(2,2)) measured 2.79 ms fwd+bwd as a
    plain NHWC conv vs 1.32 ms in this formulation (tools/probe_conv863.py,
    v5e).  Regrouping input taps by stride parity turns the stride-(st,sf)
    conv over C channels into a stride-1 conv over st*sf*C channels with a
    kernel of ceil(kt/st) x ceil(kf/sf) taps: identical output (tap weights
    are permuted, not changed), but the contraction dimension grows by the
    stride product, filling MXU lanes the original layout wastes.

    y[to,fo,o] = sum_{dt,df,c} x[st*to+dt, sf*fo+df, c] w[dt,df,c,o]; with
    dt = st*qt + i the tap (dt,df) lands in parity plane (i,j) at kernel
    position (qt,qf) — each plane is the strided view x[i::st, j::sf].
    Zero-padding beyond the input only ever meets zero kernel positions or
    cropped outputs, so no output element changes.
    """
    kt, kf, ci, co = w_hwio.shape
    st, sf = stride
    if pad != (0, 0):
        x = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]), (0, 0)))
    bsz, t, f, _ = x.shape
    to = (t - kt) // st + 1
    fo = (f - kf) // sf + 1
    kt2 = -(-kt // st)
    kf2 = -(-kf // sf)
    plt_, plf = to + kt2 - 1, fo + kf2 - 1
    need_t = max(0, st * plt_ - t)
    need_f = max(0, sf * plf - f)
    if need_t or need_f:
        x = jnp.pad(x, ((0, 0), (0, need_t), (0, need_f), (0, 0)))
    planes = [
        x[:, i::st, j::sf, :][:, :plt_, :plf, :]
        for i in range(st) for j in range(sf)
    ]
    xs = jnp.concatenate(planes, axis=-1)  # (B, plt, plf, st*sf*ci)
    kern = jnp.zeros((kt2, kf2, st * sf * ci, co), w_hwio.dtype)
    for i in range(st):
        for j in range(sf):
            sub = w_hwio[i::st, j::sf]  # (taps_t, taps_f, ci, co)
            g = (i * sf + j) * ci
            kern = kern.at[: sub.shape[0], : sub.shape[1],
                           g:g + ci, :].set(sub)
    return jax.lax.conv_general_dilated(
        xs, kern, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _use_s2d(stride: Tuple[int, int], kernel: Tuple[int, int],
             ci: int) -> bool:
    # pays off when the direct conv's contraction is tiny AND the stride
    # product buys real lane occupancy.  Measured on v5e
    # (tools/probe_conv863.py + full-step A/B): the 863 front (ci=1,
    # k(11,5), s(2,2)) is 2.1x faster standalone and takes the full 863
    # step 6.90 -> 6.35 ms; the flagship layer 1 (ci=1, k(3,3), s(1,2))
    # is 3.2x faster STANDALONE but ~1.5% slower in the full flagship
    # step (XLA fuses the tiny direct conv into its neighbours; the s2d
    # pad/concat breaks that), so the gate requires a stride product of
    # at least 4.  Flagship layer 2 (ci=32) is already MXU-busy either way.
    return stride[0] * stride[1] >= 4 and ci * kernel[0] * kernel[1] <= 64


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
    axis_name: Optional[str] = None,
    t_valid=None,
    example_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, List[Dict]]:
    """(B, 1, T, F) -> NHWC ``(B, T', F', C_out)``, plus new BN states.

    ``t_valid``: optional traced scalar — the batch's true max input frames
    (batchmax pad dynamics).  Each layer transforms it through its own conv
    (+pool) floor arithmetic, takes BN statistics over frames below it
    (repeat-padded rows dropped via ``example_mask``), and zeroes the tail
    so the next conv sees exactly the implicit zero padding the reference
    sees at a per-batch-max-padded plane's edge.

    The stack runs channels-last (NHWC/HWIO) with the planes held in
    ``compute_dtype`` throughout: TPU convs want channels on the lane axis,
    and the BN/act/dropout full-plane passes over the first conv's output
    (~80M elements at flagship shapes) were fp32-traffic-bound in NCHW
    (measured 5.2 ms -> ~1.5 ms for the whole stack fwd+bwd on v5e).
    Parameters keep the torch OIHW layout (checkpoint/import contract).
    """
    from ctc_pytorch_tpu.models.layers import dropout

    act = ACTIVATIONS[cnn.activation_function.lower()]
    new_states = []
    rngs = (
        jax.random.split(rng, len(params)) if (rng is not None and train) else
        [None] * len(params)
    )
    x = x.transpose(0, 2, 3, 1).astype(compute_dtype)  # (B,C,T,F)->(B,T,F,C)
    tv = t_valid
    rows = None
    if t_valid is not None and example_mask is not None:
        rows = (example_mask > 0)[:, None, None, None]  # (B,1,1,1)
    for i, (p, s, r) in enumerate(zip(params, states, rngs)):
        stride = cnn.stride[i]
        pad = cnn.padding[i]
        # no preferred_element_type here: its VJP mixes bf16/fp32 operand
        # dtypes and fails; the TPU MXU accumulates bf16 convs in fp32 anyway
        w_hwio = p["w"].astype(compute_dtype).transpose(2, 3, 1, 0)
        if _use_s2d(stride, cnn.kernel_size[i], w_hwio.shape[2]):
            out = _s2d_conv(x, w_hwio, stride, pad)
        else:
            out = jax.lax.conv_general_dilated(
                x,
                w_hwio,  # OIHW->HWIO
                window_strides=stride,
                padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        out = out + p["b"].astype(compute_dtype)
        mask = None
        if tv is not None:
            tv = jnp.maximum(cnn.conv_out(i, tv, 0)[0], 1)
            mask = (jnp.arange(out.shape[1]) < tv)[None, :, None, None]
            if rows is not None:
                mask = jnp.logical_and(mask, rows)
        ns = dict(s)
        if "bn" in p:
            out, ns["bn"] = _bn2d(p["bn"], s["bn"], out, train,
                                  axis_name=axis_name, mask=mask)
        out = act(out)
        pk = cnn.pool_at(i)
        if pk:
            out = jax.lax.reduce_window(
                out, -jnp.inf, jax.lax.max,
                window_dimensions=(1, pk[0], pk[1], 1),
                window_strides=(1, pk[0], pk[1], 1),
                padding="VALID",
            )
            if tv is not None:
                # valid pooled windows lie entirely below the conv-level
                # cutoff (floor arithmetic), so only the count changes
                tv = jnp.maximum((tv - pk[0]) // pk[0] + 1, 1)
        if tv is not None:
            # zero the tail so the next conv's receptive field sees the
            # implicit zero padding the reference sees at its plane edge
            # (time cutoff only — garbage rows are excluded from BN stats
            # and from the loss, and never mix across the batch axis)
            tail = (jnp.arange(out.shape[1]) < tv)[None, :, None, None]
            out = out * tail.astype(out.dtype)
        out = dropout(out, drop_rate, r, train)
        x = out
        new_states.append(ns)
    return x, new_states
