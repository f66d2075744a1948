"""Component breakdown of the 863 flagship step (CNN+BiGRU(256), 67 cls).

Why: BENCH_EXTRA r3 put the 863 configs at MFU 0.28 vs the TIMIT
flagship's 0.41 — a 1.5x per-FLOP gap on a north-star config with no
analysis (round-3 verdict, weak #4).  Same tunnel-safe methodology as
tools/probe_step.py: N_INNER steps chained under lax.scan in ONE jitted
call, fresh activations per iteration, synced by one host fetch; a
gen-only twin subtracts RNG + scan overhead.

Shapes: b=128, t=200 spectrum frames, f=201 -> conv 1->16ch (11,5) s(2,2)
no pad, Hardtanh(0,20) -> t'=95, feat=99*16=1584 -> 4x BiGRU(256) -> 67
(``my_863_corpus/steps/model.py:168-234``).

Run: python tools/probe_863.py
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import optax

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train.state import create_train_state

B, T, F, L, NUM_CLASS = 128, 200, 201, 40, 67
N_INNER = 10


def _863_spec(cell="gru", hidden=256, add_cnn=True):
    cfg = Config()
    cfg.rnn_input_size = F if add_cnn else 1584
    cfg.rnn_hidden_size = hidden
    cfg.rnn_layers = 4
    cfg.rnn_type = cell
    cfg.drop_out = 0.0
    cfg.dtype = "bfloat16"
    cfg.cnn = CNNConfig(
        add_cnn=add_cnn, layers=1, channel=[(1, 16)], kernel_size=[(11, 5)],
        stride=[(2, 2)], padding=[(0, 0)], pooling=None,
        activation_function="hardtanh",
    )
    return cfg, dataclasses.replace(
        ModelSpec.from_config(cfg, num_class=NUM_CLASS), use_pallas_rnn=True
    )


def timed(f, *args, reps=3):
    float(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_variant(loss_mode="ctc", do_grad=True, do_opt=True, gen_only=False,
                 cell="gru", hidden=256, add_cnn=True, t_in=T, **spec_mods):
    cfg, spec = _863_spec(cell, hidden, add_cnn)
    spec = dataclasses.replace(spec, **spec_mods)
    state, tx = create_train_state(
        jax.random.PRNGKey(0), spec, 1e-3, 0.0)
    from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas as _ctc

    f_in = F if add_cnn else 1584
    rng0 = np.random.RandomState(0)
    labels = jnp.asarray(
        rng0.randint(1, NUM_CLASS, size=(B, L)).astype(np.int32))
    label_lens = jnp.asarray(np.full(B, L, np.int32))
    mask = jnp.ones((B,), jnp.float32)
    frac = jnp.asarray(np.full(B, 0.95, np.float32))

    def forward(params, mstate, feats, rng):
        log_probs, new_mstate = CTCModel.apply(
            spec, params, mstate, feats, train=True, rng=rng)
        t_out = log_probs.shape[0]
        input_sizes = (frac * t_out).astype(jnp.int32)
        if loss_mode == "ctc":
            neg_ll = _ctc(log_probs, labels, input_sizes, label_lens,
                          reduction="none")
            loss = jnp.sum(neg_ll * mask) / jnp.sum(mask)
        else:
            loss = jnp.mean(log_probs) * 1000.0
        return loss, new_mstate

    @jax.jit
    def run(state, key):
        def body(carry, k):
            st, acc = carry
            k = jax.random.fold_in(k, (acc * 1e3).astype(jnp.int32) % 97)
            feats = jax.random.normal(k, (B, t_in, f_in), jnp.float32)
            if gen_only:
                return (st, acc + jnp.sum(feats[0, 0, :8])), ()
            rng = jax.random.fold_in(k, 7)
            if do_grad == "feats":
                def fwd_x(f):
                    return forward(st.params, st.model_state, f, rng)

                (loss, new_mstate), gfeats = jax.value_and_grad(
                    fwd_x, has_aux=True)(feats)
                st = type(st)(st.step + 1,
                              jax.tree_util.tree_map(lambda p: p, st.params),
                              new_mstate, st.opt_state)
                return (st, acc + loss + jnp.sum(gfeats[0, 0, :8])), ()
            if do_grad:
                (loss, new_mstate), grads = jax.value_and_grad(
                    forward, has_aux=True)(
                        st.params, st.model_state, feats, rng)
                if do_opt:
                    updates, new_opt = tx.update(grads, st.opt_state,
                                                 st.params)
                    new_params = optax.apply_updates(st.params, updates)
                else:
                    new_opt = st.opt_state
                    new_params = jax.tree_util.tree_map(
                        lambda p, g: p - 0.0 * g.astype(p.dtype), st.params,
                        grads)
                st = type(st)(st.step + 1, new_params, new_mstate, new_opt)
            else:
                loss, _ = forward(st.params, st.model_state, feats, rng)
            return (st, acc + loss), ()

        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, N_INNER))
        return acc

    return run, state


def measure(label, **kw):
    key = jax.random.PRNGKey(5)
    run_g, st_g = make_variant(gen_only=True, **kw)
    run_f, st_f = make_variant(gen_only=False, **kw)
    tg = timed(run_g, st_g, key)
    tf = timed(run_f, st_f, key)
    ms = (tf - tg) / N_INNER * 1e3
    print(f"  {label:46s}: {ms:8.2f} ms/step  ({B/(ms/1e3):7.0f} utts/s)",
          flush=True)
    return ms


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  B={B} T={T} N_INNER={N_INNER}")
    measure("FULL 863 step (conv+4xBiGRU256, grad+adam)")
    measure("fwd only (no grad)", do_grad=False)
    measure("no CTC (mean loss)", loss_mode="mean")
    measure("no conv (1584-d in at t'=95)", add_cnn=False, t_in=95)
    measure("grad wrt feats only (no dW matmuls)", do_grad="feats")
    measure("no adam (grads only)", do_opt=False)
    measure("lstm cell", cell="lstm")
    measure("H=384 (flagship width)", hidden=384)
    measure("H=512", hidden=512)
    measure("2 layers (vs 4)", rnn_layers=2)
