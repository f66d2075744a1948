"""Recurrent stack: bias-free LSTM/GRU/RNN cells under ``jax.lax.scan``.

TPU-first design, replacing the reference's cuDNN ``nn.LSTM/GRU/RNN``
(``timit/models/model_ctc.py:24-25``):

- **time-major** layout ``(T, B, F)`` so each scan step is one batched matmul;
- the input projection ``x @ W_ih^T`` for *all* timesteps is hoisted out of the
  scan into a single large MXU matmul; the scan carries only the ``h @ W_hh^T``
  recurrence;
- gate weights are fused into one ``(F, 4H)`` / ``(H, 4H)`` matrix per layer
  (torch gate order i,f,g,o for LSTM and r,z,n for GRU, so checkpoints are
  weight-compatible with the reference layout);
- bidirectional = a second scan over the time-reversed sequence.  By default
  the reversal covers the **full padded length**, matching the reference's
  unpacked ``nn.LSTM`` on padded batches (timit path); ``lengths`` triggers
  packed-sequence semantics matching the 863 path
  (``my_863_corpus/steps/lstm_ctc.py:40-42``): per-utterance reversal,
  zero-filled outputs beyond each length (``pad_packed_sequence``), and —
  because the cells are bias-free — the Pallas kernels serve this mode
  too, via a zeroed padded tail instead of a length-aware flip;
- params stay fp32; matmuls run in ``compute_dtype`` (bf16 on TPU) with fp32
  accumulation; the cell state stays fp32 for numerical stability.

A fused Pallas kernel (ops/lstm_pallas.py) plugs in under the same function
signature for the hot path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.models.layers import (
    batchnorm_apply,
    batchnorm_init,
    dropout,
    torch_rnn_init,
)

GATES = {"lstm": 4, "gru": 3, "rnn": 1}

# Test/dryrun hook: run the Pallas kernels off-TPU (the ops' _auto_interpret
# then selects interpreter mode) so SPMD/dryrun coverage includes the
# production kernel dispatch without hardware.  Never set in production —
# off-TPU the interpreter is orders of magnitude slower than the scan path.
FORCE_PALLAS_OFF_TPU = False


def cell_init(key, cell: str, input_size: int, hidden_size: int) -> Dict:
    """One direction of one layer. Bias-free per ``model_ctc.py:24-25``."""
    n = GATES[cell]
    k1, k2 = jax.random.split(key)
    return {
        # stored transposed relative to torch ((in, n*H) not (n*H, in)) so the
        # forward pass is a plain x @ w without per-step transposes
        "w_ih": torch_rnn_init(k1, (input_size, n * hidden_size), hidden_size),
        "w_hh": torch_rnn_init(k2, (hidden_size, n * hidden_size), hidden_size),
    }


def _matmul(a, b, compute_dtype):
    return jnp.dot(
        a.astype(compute_dtype), b.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def _lstm_step(w_hh, h, c, gx, compute_dtype):
    gates = gx + _matmul(h, w_hh, compute_dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _gru_step(w_hh, h, gx, compute_dtype):
    hh = _matmul(h, w_hh, compute_dtype)
    H = h.shape[-1]
    r = jax.nn.sigmoid(gx[..., :H] + hh[..., :H])
    z = jax.nn.sigmoid(gx[..., H : 2 * H] + hh[..., H : 2 * H])
    n = jnp.tanh(gx[..., 2 * H :] + r * hh[..., 2 * H :])
    return (1.0 - z) * n + z * h


def _scan_bidir_fused(
    params: Dict,
    x: jnp.ndarray,
    cell: str,
    hidden_size: int,
    compute_dtype,
    lengths: Optional[jnp.ndarray] = None,
    unroll: int = 4,
) -> jnp.ndarray:
    """Both directions in ONE scan via a direction-batched dot_general.

    The sequential recurrence is the TPU bottleneck (small matmuls, T steps);
    running forward and backward together doubles the per-step matmul to
    ``(2, B, H) @ (2, H, nH)`` — one MXU call with a batch dim — and halves
    the number of scans per layer.  The backward direction consumes the
    time-flipped input and its output is flipped back, which preserves the
    reference's full-padded-length semantics (or per-utterance lengths when
    given).  ``unroll`` amortises scan overhead across steps.
    """
    t, b, _ = x.shape
    h = hidden_size
    n = GATES[cell]
    xr = (_flip_within_lengths(x, lengths) if lengths is not None
          else jnp.flip(x, axis=0))
    # input projections: two large parallel matmuls (MXU-friendly)
    w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])  # (2,F,nH)
    x2 = jnp.stack([x, xr]).reshape(2, t * b, -1).astype(compute_dtype)
    gx = jax.lax.dot_general(
        x2, w_ih.astype(compute_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(2, t, b, n * h).transpose(1, 0, 2, 3)  # (T, 2, B, nH)
    w_hh = params["w_hh_stacked"] if "w_hh_stacked" in params else jnp.stack(
        [params["fwd"]["w_hh"], params["bwd"]["w_hh"]]
    )  # (2, H, nH)
    w_hh_c = w_hh.astype(compute_dtype)

    def hh_matmul(hid):  # (2, B, H) -> (2, B, nH)
        return jax.lax.dot_general(
            hid.astype(compute_dtype), w_hh_c,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    h0 = jnp.zeros((2, b, h), jnp.float32)
    if cell == "lstm":
        def step(carry, gx_t):
            hid, c = carry
            gates = gx_t + hh_matmul(hid)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            hid = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (hid, c), hid

        (_, _), ys = jax.lax.scan(step, (h0, h0), gx, unroll=unroll)
    elif cell == "gru":
        def step(hid, gx_t):
            hh = hh_matmul(hid)
            r = jax.nn.sigmoid(gx_t[..., :h] + hh[..., :h])
            z = jax.nn.sigmoid(gx_t[..., h:2*h] + hh[..., h:2*h])
            nn_ = jnp.tanh(gx_t[..., 2*h:] + r * hh[..., 2*h:])
            hid = (1.0 - z) * nn_ + z * hid
            return hid, hid

        _, ys = jax.lax.scan(step, h0, gx, unroll=unroll)
    else:
        def step(hid, gx_t):
            hid = jnp.tanh(gx_t + hh_matmul(hid))
            return hid, hid

        _, ys = jax.lax.scan(step, h0, gx, unroll=unroll)
    # ys: (T, 2, B, H) -> forward out + flipped backward out
    fwd = ys[:, 0]
    bwd = ys[:, 1]
    bwd = (_flip_within_lengths(bwd, lengths) if lengths is not None
           else jnp.flip(bwd, axis=0))
    return jnp.concatenate([fwd, bwd], axis=-1)


def _scan_direction(
    params: Dict,
    x: jnp.ndarray,
    cell: str,
    hidden_size: int,
    reverse: bool,
    compute_dtype,
) -> jnp.ndarray:
    """Run one direction over (T, B, F); returns (T, B, H)."""
    t, b, _ = x.shape
    # hoist the input projection out of the scan: one big MXU matmul
    gx = _matmul(x.reshape(t * b, -1), params["w_ih"], compute_dtype)
    gx = gx.reshape(t, b, -1)
    h0 = jnp.zeros((b, hidden_size), jnp.float32)
    w_hh = params["w_hh"]

    if cell == "lstm":
        def step(carry, gx_t):
            h, c = carry
            h, c = _lstm_step(w_hh, h, c, gx_t, compute_dtype)
            return (h, c), h

        (_, _), ys = jax.lax.scan(step, (h0, h0), gx, reverse=reverse)
    elif cell == "gru":
        def step(h, gx_t):
            h = _gru_step(w_hh, h, gx_t, compute_dtype)
            return h, h

        _, ys = jax.lax.scan(step, h0, gx, reverse=reverse)
    else:  # vanilla tanh RNN
        def step(h, gx_t):
            h = jnp.tanh(gx_t + _matmul(h, w_hh, compute_dtype))
            return h, h

        _, ys = jax.lax.scan(step, h0, gx, reverse=reverse)
    return ys


def _flip_within_lengths(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each (T, B, F) sequence within its own valid length."""
    t = x.shape[0]
    idx = jnp.arange(t)[:, None]  # (T, 1)
    src = lengths[None, :] - 1 - idx  # (T, B)
    src = jnp.where(src >= 0, src, idx)  # padding frames stay in place
    return jnp.take_along_axis(x, jnp.broadcast_to(src[:, :, None], x.shape), axis=0)


def _split_batch_run(ok, run, x, t: int, h: int, compute_dtype,
                     max_slices: int = 8):
    """Run a batch-independent kernel over batch slices when the whole
    batch fails its VMEM/tiling gate but a divisor slice passes.

    The RNN layer is independent across batch rows, so slicing axis 1 and
    concatenating the per-slice outputs is exact (and differentiable
    through each slice's custom VJP).  Without this, a batch just past
    the v2 kernels' VMEM gate (e.g. B=256 at the flagship shape) falls
    to the v1/scan paths and loses ~2x step rate (tools/probe_batch.py).
    Returns the concatenated (T, B, 2H) output, or None when no split up
    to ``max_slices`` passes ``ok`` (caller falls through to the next
    kernel in its chain)."""
    b = x.shape[1]
    n = 2
    while n <= max_slices:
        if b % n == 0 and ok(t, b // n, h, compute_dtype):
            s = b // n
            return jnp.concatenate(
                [run(x[:, i * s:(i + 1) * s]) for i in range(n)], axis=1
            )
        n *= 2
    return None


def rnn_layer_init(
    key, cell: str, input_size: int, hidden_size: int, bidirectional: bool,
    batch_norm: bool,
) -> Tuple[Dict, Dict]:
    """BatchRNN equivalent: optional feature BN -> rnn (``model_ctc.py:13-36``)."""
    kf, kb2, kbn = jax.random.split(key, 3)
    params: Dict = {"fwd": cell_init(kf, cell, input_size, hidden_size)}
    state: Dict = {}
    if bidirectional:
        params["bwd"] = cell_init(kb2, cell, input_size, hidden_size)
    if batch_norm:
        params["bn"], state["bn"] = batchnorm_init(input_size)
    return params, state


def rnn_layer_apply(
    params: Dict,
    state: Dict,
    x: jnp.ndarray,
    *,
    cell: str,
    hidden_size: int,
    drop_rate: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    pallas: bool = False,
    axis_name: Optional[str] = None,
    bn_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """(T, B, F) -> (T, B, H * num_directions), plus new BN state.

    ``bn_mask``: optional (T, B) frame validity for padding-masked BN
    statistics (see ``batchnorm_apply``)."""
    new_state = dict(state)
    if "bn" in params:
        x, new_state["bn"] = batchnorm_apply(
            params["bn"], state["bn"], x, train, axis_name=axis_name,
            mask=bn_mask,
        )
    valid = None
    if lengths is not None:
        # (T, B, 1) frame-validity mask.  The cells are bias-free
        # (``model_ctc.py:24-25`` / ``my_863_corpus/steps/model.py:83``:
        # ``bias=False``), so zeroed input rows with zero incoming state
        # keep the state EXACTLY zero: the Pallas kernels' in-kernel
        # reverse direction walks the padded tail first and arrives at
        # each utterance's true last frame with pristine zero state --
        # the packed-sequence semantics with no kernel change.  The
        # forward direction's state runs past the valid tail, matching
        # the scan path; pad-row OUTPUTS are zeroed below for every
        # path, which is exactly ``pad_packed_sequence``'s contract.
        valid = (
            jnp.arange(x.shape[0])[:, None] < lengths[None, :]
        ).astype(x.dtype)[..., None]
    use_pallas_here = (
        "bwd" in params and pallas and cell in ("lstm", "gru", "rnn")
    )
    if use_pallas_here:
        # compiled-kernel tiling constraints (Mosaic): the hidden size is the
        # lane dimension of the streamed buffers (must tile to 128) and the
        # stacked 2B batch is the sublane dimension (must tile to 8).
        # Off-TPU the kernels would run the (slow) interpreter, so the scan
        # path — same math, golden-tested — serves instead; interpret mode
        # stays a unit-test tool, not a production fallback.
        import jax as _jax

        on_tpu = (_jax.default_backend() in ("tpu", "axon")
                  or FORCE_PALLAS_OFF_TPU)
        if not on_tpu or hidden_size % 128 != 0 or (2 * x.shape[1]) % 8 != 0:
            use_pallas_here = False
    if use_pallas_here:
        # fused Pallas scan: trainable LSTM kernel (custom VJP) in training,
        # lighter forward-only kernels at eval (ops/{lstm,gru}_pallas*.py)
        if valid is not None:
            # zero the padded tail so the kernels' reverse direction sees
            # zero gx rows (packed semantics; see the `valid` comment)
            x = x * valid
        w_ih = jnp.stack([params["fwd"]["w_ih"], params["bwd"]["w_ih"]])
        w_hh = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
        if cell == "rnn":
            from ctc_pytorch_tpu.ops.rnn_pallas import rnn_bidir_pallas
            from ctc_pytorch_tpu.ops.rnn_pallas_v2 import (
                rnn_bidir_v2,
                rnn_v2_ok,
            )

            if rnn_v2_ok(x.shape[0], x.shape[1], hidden_size, compute_dtype):
                out = rnn_bidir_v2(x, w_ih, w_hh,
                                   compute_dtype=compute_dtype, train=train)
            else:
                out = _split_batch_run(
                    rnn_v2_ok,
                    lambda xs: rnn_bidir_v2(xs, w_ih, w_hh,
                                            compute_dtype=compute_dtype,
                                            train=train),
                    x, x.shape[0], hidden_size, compute_dtype)
                if out is None:
                    out = rnn_bidir_pallas(x, w_ih, w_hh,
                                           compute_dtype=compute_dtype,
                                           train=train)
        elif cell == "gru":
            from ctc_pytorch_tpu.ops.gru_pallas import gru_bidir_pallas
            from ctc_pytorch_tpu.ops.gru_pallas_train import gru_bidir_train
            from ctc_pytorch_tpu.ops.gru_pallas_v2 import (
                gru_bidir_v2,
                gru_v2_ok,
            )

            if gru_v2_ok(x.shape[0], x.shape[1], hidden_size, compute_dtype):
                out = gru_bidir_v2(x, w_ih, w_hh,
                                   compute_dtype=compute_dtype, train=train)
            elif (out := _split_batch_run(
                    gru_v2_ok,
                    lambda xs: gru_bidir_v2(xs, w_ih, w_hh,
                                            compute_dtype=compute_dtype,
                                            train=train),
                    x, x.shape[0], hidden_size, compute_dtype)) is not None:
                pass
            elif train:
                from ctc_pytorch_tpu.ops.gru_pallas_train import gru_train_ok

                if gru_train_ok(x.shape[1], hidden_size, compute_dtype):
                    out = gru_bidir_train(x, w_ih, w_hh,
                                          compute_dtype=compute_dtype)
                else:  # backward doesn't fit VMEM: same math via scan
                    out = _scan_bidir_fused(
                        params, x, cell, hidden_size, compute_dtype,
                        lengths=lengths,
                    )
            else:
                out = gru_bidir_pallas(x, w_ih, w_hh,
                                       compute_dtype=compute_dtype)
        elif train:
            from ctc_pytorch_tpu.ops.lstm_pallas_train import (
                lstm_bidir_train,
                train_v1_ok,
            )
            from ctc_pytorch_tpu.ops.lstm_pallas_train_v2 import (
                lstm_bidir_train_v2,
                train_v2_ok,
            )

            if train_v2_ok(x.shape[0], x.shape[1], hidden_size,
                           compute_dtype):
                # v2 layout: in-kernel time reversal + un-hoisted backward
                # gates — no wrapper plane copies (2.11 -> 1.56 ms/layer)
                out = lstm_bidir_train_v2(
                    x, w_ih, w_hh, compute_dtype=compute_dtype
                )
            elif (out := _split_batch_run(
                    train_v2_ok,
                    lambda xs: lstm_bidir_train_v2(
                        xs, w_ih, w_hh, compute_dtype=compute_dtype),
                    x, x.shape[0], hidden_size, compute_dtype)) is not None:
                # batch past the v2 VMEM gate (e.g. B=256 at the flagship
                # shape): slice to the largest passing sub-batch instead of
                # losing ~2x to the scan path (tools/probe_batch_scale.py)
                pass
            elif train_v1_ok(x.shape[1], hidden_size, compute_dtype):
                out = lstm_bidir_train(
                    x, w_ih, w_hh, compute_dtype=compute_dtype
                )
            else:
                # neither kernel's backward fits VMEM (e.g. very large H):
                # same math via the scan path
                out = _scan_bidir_fused(
                    params, x, cell, hidden_size, compute_dtype,
                    lengths=lengths,
                )
        else:
            from ctc_pytorch_tpu.ops.lstm_pallas import lstm_bidir_pallas
            from ctc_pytorch_tpu.ops.lstm_pallas_v2 import (
                lstm_bidir_pallas_v2,
                v2_ok,
            )

            if v2_ok(x.shape[0], x.shape[1], hidden_size):
                # v2 layout: in-kernel time reversal, no flip/concat plane
                # copies — bit-exact vs v1 and ~3x faster layer forward
                out = lstm_bidir_pallas_v2(
                    x, w_ih, w_hh, compute_dtype=compute_dtype
                )
            else:
                out = _split_batch_run(
                    lambda t, b, h, cd: v2_ok(t, b, h),
                    lambda xs: lstm_bidir_pallas_v2(
                        xs, w_ih, w_hh, compute_dtype=compute_dtype),
                    x, x.shape[0], hidden_size, compute_dtype)
                if out is None:
                    out = lstm_bidir_pallas(
                        x, w_ih, w_hh, compute_dtype=compute_dtype
                    )
    elif "bwd" in params:
        out = _scan_bidir_fused(
            params, x, cell, hidden_size, compute_dtype, lengths=lengths
        )
    else:
        out = _scan_direction(
            params["fwd"], x, cell, hidden_size, False, compute_dtype
        )
    if valid is not None:
        # pad_packed_sequence zero-fills beyond each length
        # (``my_863_corpus/steps/model.py:138``); zeroing the padded rows
        # here makes scan and kernel paths bit-equal on EVERY row and
        # keeps downstream BN planes from reading stale recurrent state.
        out = out * valid.astype(out.dtype)
    out = dropout(out, drop_rate, rng, train)
    return out, new_state


def rnn_stack_init(
    key,
    *,
    cell: str,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool,
    batch_norm: bool,
) -> Tuple[list, list]:
    """Stacked BatchRNNs; first layer has no BN (``model_ctc.py:126-133``)."""
    dirs = 2 if bidirectional else 1
    params, states = [], []
    keys = jax.random.split(key, num_layers)
    for i in range(num_layers):
        in_dim = input_size if i == 0 else dirs * hidden_size
        p, s = rnn_layer_init(
            keys[i], cell, in_dim, hidden_size, bidirectional,
            batch_norm and i > 0,
        )
        params.append(p)
        states.append(s)
    return params, states


def rnn_stack_apply(
    params: list,
    states: list,
    x: jnp.ndarray,
    *,
    cell: str,
    hidden_size: int,
    drop_rate: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    pallas: bool = False,
    remat: bool = False,
    axis_name: Optional[str] = None,
    bn_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, list]:
    new_states = []
    rngs = (
        jax.random.split(rng, len(params)) if (rng is not None and train) else
        [None] * len(params)
    )
    layer = functools.partial(
        rnn_layer_apply,
        cell=cell, hidden_size=hidden_size, drop_rate=drop_rate,
        train=train, lengths=lengths, compute_dtype=compute_dtype,
        pallas=pallas, axis_name=axis_name, bn_mask=bn_mask,
    )
    if remat:
        # trade FLOPs for HBM: recompute each layer's activations in the
        # backward pass instead of storing the per-step scan residuals
        layer = jax.checkpoint(layer, static_argnums=())
    for p, s, r in zip(params, states, rngs):
        x, ns = layer(p, s, x, rng=r)
        new_states.append(ns)
    return x, new_states
