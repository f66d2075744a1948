"""Per-component fwd+bwd cost at flagship shapes (tunnel-safe timing).

Times each architectural piece in isolation: CNN stack, one bidir LSTM
layer (pallas vs scan), the gx input projection, BN, dropout, fc+softmax,
CTC.  Methodology as in tools/probe_step.py.

Run: python tools/probe_layers.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 128
T_CNN = 160   # frames into the CNN
T = 80        # frames into the RNN stack (post CNN stride)
H = 384
IN1 = 1952    # layer-1 input: 32 ch x 61 freq
IN = 768      # layers 2-4 input (2H)
N_INNER = 10


def timed(f, *args, reps=3):
    float(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(label, piece, params, x_shape, gen_only=False, grad=True):
    """piece(params, x, rng) -> scalar loss."""

    @jax.jit
    def run(params, key):
        def body(carry, k):
            acc = carry
            k = jax.random.fold_in(k, (acc * 1e3).astype(jnp.int32) % 97)
            x = jax.random.normal(k, x_shape, jnp.float32)
            if gen_only:
                return acc + jnp.sum(x.reshape(-1)[:8]), ()
            rng = jax.random.fold_in(k, 3)
            if grad:
                loss, grads = jax.value_and_grad(piece, argnums=(0, 1))(
                    params, x, rng)
                gsum = sum(jnp.sum(g.reshape(-1)[:4].astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return acc + loss + gsum, ()
            return acc + piece(params, x, rng), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jax.random.split(key, N_INNER))
        return acc

    return run, params


def bench(label, piece, params, x_shape, grad=True):
    key = jax.random.PRNGKey(9)
    rg, _ = measure(label, piece, params, x_shape, gen_only=True)
    rf, _ = measure(label, piece, params, x_shape, gen_only=False, grad=grad)
    tg = timed(rg, params, key)
    tf = timed(rf, params, key)
    ms = (tf - tg) / N_INNER * 1e3
    print(f"  {label:44s}: {ms:7.2f} ms")
    return ms


def main():
    from ctc_pytorch_tpu.ops.lstm_pallas_train import lstm_bidir_train
    from ctc_pytorch_tpu.models.rnn import _scan_bidir_fused
    from ctc_pytorch_tpu.models.layers import batchnorm_init, batchnorm_apply, dropout
    from ctc_pytorch_tpu.models.cnn import cnn_stack_init, cnn_stack_apply
    from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas
    from __graft_entry__ import _flagship_spec

    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}  B={B} T={T}")

    # --- one bidir LSTM layer, pallas train path, layers 2-4 shape
    w_ih = jax.random.normal(key, (2, IN, 4 * H), jnp.float32) * 0.02
    w_hh = jax.random.normal(key, (2, H, 4 * H), jnp.float32) * 0.02

    def lstm_pallas_piece(p, x, rng):
        ys = lstm_bidir_train(x, p["ih"], p["hh"])
        return jnp.sum(ys * 1e-3)

    bench("bidir LSTM layer fwd+bwd (pallas, in=768)", lstm_pallas_piece,
          {"ih": w_ih, "hh": w_hh}, (T, B, IN))

    def lstm_fwd_only_piece(p, x, rng):
        ys = lstm_bidir_train(x, p["ih"], p["hh"])
        return jnp.sum(ys * 1e-3)

    bench("bidir LSTM layer fwd ONLY (pallas, in=768)", lstm_fwd_only_piece,
          {"ih": w_ih, "hh": w_hh}, (T, B, IN), grad=False)

    def lstm_scan_piece(p, x, rng):
        prm = {"fwd": {"w_ih": p["ih"][0], "w_hh": p["hh"][0]},
               "bwd": {"w_ih": p["ih"][1], "w_hh": p["hh"][1]}}
        ys = _scan_bidir_fused(prm, x, "lstm", H, jnp.bfloat16)
        return jnp.sum(ys * 1e-3)

    bench("bidir LSTM layer fwd+bwd (lax.scan, in=768)", lstm_scan_piece,
          {"ih": w_ih, "hh": w_hh}, (T, B, IN))

    # layer-1 shape (in=1952)
    w_ih1 = jax.random.normal(key, (2, IN1, 4 * H), jnp.float32) * 0.01
    bench("bidir LSTM layer fwd+bwd (pallas, in=1952)", lstm_pallas_piece,
          {"ih": w_ih1, "hh": w_hh}, (T, B, IN1))

    # --- gx projection alone (the hoisted input matmul, both dirs)
    def gx_piece(p, x, rng):
        x2 = jnp.stack([x, jnp.flip(x, 0)]).reshape(2, T * B, IN)
        gx = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), p["ih"].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(gx * 1e-3)

    bench("gx projection fwd+bwd (in=768)", gx_piece, {"ih": w_ih},
          (T, B, IN))

    # --- BN over features
    bn_p, bn_s = batchnorm_init(IN)

    def bn_piece(p, x, rng):
        out, _ = batchnorm_apply(p, bn_s, x.reshape(T * B, IN), train=True)
        return jnp.sum(out * 1e-3)

    bench("BatchNorm (T*B, 768) fwd+bwd", bn_piece, bn_p, (T, B, IN))

    # --- dropout (rbg path)
    def drop_piece(p, x, rng):
        return jnp.sum(dropout(x, 0.2, rng, True) * 1e-3)

    bench("dropout (T,B,768) fwd+bwd", drop_piece, {}, (T, B, IN))

    def drop_cnn_piece(p, x, rng):
        return jnp.sum(dropout(x, 0.2, rng, True) * 1e-3)

    bench("dropout conv1 plane (128,32,160,122)", drop_cnn_piece, {},
          (B, 32, 160, 122))

    # --- CNN stack
    cfg, spec = _flagship_spec()
    cnn_p, cnn_s = cnn_stack_init(jax.random.PRNGKey(1), spec.cnn)

    def cnn_piece(p, x, rng):
        out, _ = cnn_stack_apply(p, cnn_s, x[:, None], spec.cnn, train=True,
                                 drop_rate=0.2, rng=rng,
                                 compute_dtype=jnp.bfloat16)
        return jnp.sum(out * 1e-3)

    bench("CNN stack fwd+bwd (incl dropout)", cnn_piece, cnn_p,
          (B, T_CNN, 243))

    # --- fc + log softmax + CTC
    fc_w = jax.random.normal(key, (IN, 41), jnp.float32) * 0.05
    labels = jnp.asarray(np.random.RandomState(0).randint(
        1, 41, size=(B, 48)).astype(np.int32))
    lab_lens = jnp.full((B,), 48, jnp.int32)
    sizes = jnp.full((B,), int(0.95 * T), jnp.int32)

    def head_piece(p, x, rng):
        logits = x.reshape(T * B, IN) @ p["w"]
        lp = jax.nn.log_softmax(logits.reshape(T, B, 41), axis=-1)
        neg = ctc_loss_pallas(lp, labels, sizes, lab_lens, reduction="none")
        return jnp.mean(neg)

    bench("fc + log_softmax + pallas CTC fwd+bwd", head_piece, {"w": fc_w},
          (T, B, IN))


if __name__ == "__main__":
    main()
