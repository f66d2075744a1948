"""Component breakdown of the flagship train step (tunnel-safe timing).

Same methodology as tools/probe_kernels.py: N_INNER steps chained under
lax.scan inside ONE jitted call (state carried through the scan, feats
drawn fresh per iteration from a fold_in of the running loss), synced by
fetching the accumulated loss to host.  A gen-only twin subtracts RNG +
scan overhead.

Run: python tools/probe_step.py
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

from __graft_entry__ import _flagship_spec
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.train.state import create_train_state

import optax

B, T, F, L, NUM_CLASS = 128, 160, 243, 48, 41
N_INNER = 10


def timed(f, *args, reps=3):
    float(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_variant(loss_mode="ctc", do_grad=True, do_opt=True,
                 ctc_impl="pallas", gen_only=False, train=True, **spec_mods):
    cfg, spec = _flagship_spec()
    spec = dataclasses.replace(spec, **{"use_pallas_rnn": True, **spec_mods})
    state, tx = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay)

    if ctc_impl == "pallas":
        from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas as _ctc
    else:
        from ctc_pytorch_tpu.ops import ctc_loss as _ctc

    rng0 = np.random.RandomState(0)
    labels = jnp.asarray(rng0.randint(1, NUM_CLASS, size=(B, L)).astype(np.int32))
    label_lens = jnp.asarray(np.full(B, L, np.int32))
    mask = jnp.ones((B,), jnp.float32)
    frac = jnp.asarray(np.full(B, 0.95, np.float32))

    def forward(params, mstate, feats, rng):
        log_probs, new_mstate = CTCModel.apply(
            spec, params, mstate, feats, train=train, rng=rng)
        t_out = log_probs.shape[0]
        input_sizes = (frac * t_out).astype(jnp.int32)
        if loss_mode == "ctc":
            neg_ll = _ctc(log_probs, labels, input_sizes, label_lens,
                          reduction="none")
            loss = jnp.sum(neg_ll * mask) / jnp.sum(mask)
        else:  # "mean" — no CTC, keeps the whole model live via mean
            loss = jnp.mean(log_probs) * 1000.0
        return loss, new_mstate

    @jax.jit
    def run(state, key):
        def body(carry, k):
            st, acc = carry
            k = jax.random.fold_in(k, (acc * 1e3).astype(jnp.int32) % 97)
            feats = jax.random.normal(k, (B, T, F), jnp.float32)
            if gen_only:
                return (st, acc + jnp.sum(feats[0, 0, :8])), ()
            rng = jax.random.fold_in(k, 7)
            if do_grad == "feats":
                # grad wrt INPUT only: runs the full dx backward chain but
                # skips every dW matmul — isolates weight-gradient cost
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
                    forward, has_aux=True)(st.params, st.model_state, feats, rng)
                if do_opt:
                    updates, new_opt = tx.update(grads, st.opt_state, st.params)
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
    print(f"  {label:42s}: {ms:8.2f} ms/step  ({B/(ms/1e3):7.0f} utts/s)")
    return ms


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  B={B} T={T} N_INNER={N_INNER}")
    full = measure("FULL step (pallas rnn+ctc, grad+adam)")
    measure("fwd only (train=True, no grad)", do_grad=False)
    measure("no CTC (mean loss), grad+adam", loss_mode="mean")
    measure("ctc scan impl", ctc_impl="scan")
    measure("rnn scan path (no pallas kernels)", use_pallas_rnn=False)
    measure("1 rnn layer (vs 4)", rnn_layers=1)
    measure("dropout off", drop_out=0.0)
    measure("no adam (grads only)", do_opt=False)
    measure("grad wrt feats only (no dW matmuls)", do_grad="feats")
    measure("no cnn (T stays 160!)", add_cnn=False)
    measure("fp32 compute dtype", compute_dtype="float32")
