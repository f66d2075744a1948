"""Batch-size scaling of the flagship train step (tunnel-safe timing).

Sweeps B at the bench shape (T=160, F=243, L=48, 41 classes) to find the
throughput-optimal per-step batch on one chip.  Methodology identical to
tools/probe_step.py: N_INNER steps chained under lax.scan inside ONE jitted
call, feats drawn fresh per iteration, synced by a host fetch of the
accumulated loss; a gen-only twin subtracts RNG + scan overhead.

Run: python tools/probe_batch_scale.py [B ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from __graft_entry__ import _flagship_spec
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.train.state import create_train_state

T, F, L, NUM_CLASS = 160, 243, 48, 41
N_INNER = 10


def timed(f, state, key, reps=3):
    # fresh key per call: the tunnel elides repeat calls with identical
    # input values (KERNELS.md methodology rule), which reads as ~0 ms
    keys = jax.random.split(key, reps + 1)
    float(f(state, keys[0]))
    best = 1e9
    for i in range(reps):
        t0 = time.perf_counter()
        float(f(state, keys[i + 1]))
        best = min(best, time.perf_counter() - t0)
    return best


def make_variant(b, gen_only=False):
    cfg, spec = _flagship_spec()
    spec = dataclasses.replace(spec, use_pallas_rnn=True)
    state, tx = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay)

    from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas as _ctc

    rng0 = np.random.RandomState(0)
    labels = jnp.asarray(rng0.randint(1, NUM_CLASS, size=(b, L)).astype(np.int32))
    label_lens = jnp.asarray(np.full(b, L, np.int32))
    mask = jnp.ones((b,), jnp.float32)
    frac = jnp.asarray(np.full(b, 0.95, np.float32))

    def forward(params, mstate, feats, rng):
        log_probs, new_mstate = CTCModel.apply(
            spec, params, mstate, feats, train=True, rng=rng)
        t_out = log_probs.shape[0]
        input_sizes = (frac * t_out).astype(jnp.int32)
        neg_ll = _ctc(log_probs, labels, input_sizes, label_lens,
                      reduction="none")
        loss = jnp.sum(neg_ll * mask) / jnp.sum(mask)
        return loss, new_mstate

    @jax.jit
    def run(state, key):
        def body(carry, k):
            st, acc = carry
            k = jax.random.fold_in(k, (acc * 1e3).astype(jnp.int32) % 97)
            feats = jax.random.normal(k, (b, T, F), jnp.float32)
            if gen_only:
                return (st, acc + jnp.sum(feats[0, 0, :8])), ()
            rng = jax.random.fold_in(k, 7)
            (loss, new_mstate), grads = jax.value_and_grad(
                forward, has_aux=True)(st.params, st.model_state, feats, rng)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            st = type(st)(st.step + 1, new_params, new_mstate, new_opt)
            return (st, acc + loss), ()

        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, N_INNER))
        return acc

    return run, state


def measure(b):
    key = jax.random.PRNGKey(5)
    run_g, st_g = make_variant(b, gen_only=True)
    run_f, st_f = make_variant(b, gen_only=False)
    tg = timed(run_g, st_g, key)
    tf = timed(run_f, st_f, key)
    ms = (tf - tg) / N_INNER * 1e3
    print(f"  B={b:4d}: {ms:8.2f} ms/step  ({b/(ms/1e3):8.0f} utts/s)")
    return ms


if __name__ == "__main__":
    bs = [int(x) for x in sys.argv[1:]] or [64, 128, 192, 256, 384, 512]
    print(f"backend={jax.default_backend()}  T={T} N_INNER={N_INNER}")
    for b in bs:
        measure(b)
