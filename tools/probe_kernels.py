"""Time the production LSTM Pallas kernels with tunnel-safe methodology.

The axon TPU tunnel has ~30 ms host round-trip, content-addressed result
caching (a repeated call with identical input VALUES can be elided), and
an unreliable block_until_ready (can return before device execution —
only a host VALUE FETCH is a hard sync).

Method: one jitted call runs the kernel N_INNER times under lax.scan.
The big gx plane is passed in once and reused; each iteration draws fresh
WEIGHTS (tiny) from a per-iteration key that folds in the running
accumulator, so iterations are value-chained (serialized + cache-proof).
A gen-only twin subtracts the scan/weight-gen overhead.  The final
accumulator is fetched to host (hard sync).

Run: python tools/probe_kernels.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ctc_pytorch_tpu.ops.lstm_pallas import lstm_scan_pallas, auto_chunk
from ctc_pytorch_tpu.ops import lstm_pallas_train as lt

B2, H = 256, 384
H4 = 4 * H
N_INNER = 64


def timed(f, *args, reps=5):
    float(f(*args))  # compile + sync
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_runner(kernel_fn, t, gen_only, n_extra_planes=0):
    """kernel_fn(gx, extras, w) -> small slice; extras are (t+1,B2,H) planes."""

    @jax.jit
    def f(gx, extras, key):
        def body(carry, k):
            acc, i = carry
            k = jax.random.fold_in(k, (acc * 1e6).astype(jnp.int32) % 97)
            w = jax.random.normal(k, (2, H, H4), jnp.float32) * 0.02
            if gen_only:
                out = w[0, 0, :8]
            else:
                out = kernel_fn(gx, extras, w)
            return (acc + jnp.sum(out), i + 1), ()

        (acc, _), _ = jax.lax.scan(
            body, (jnp.float32(0), jnp.int32(0)),
            jax.random.split(key, N_INNER))
        return acc

    return f


def measure(kernel_fn, label, t, n_extra=0):
    key = jax.random.PRNGKey(3)
    gx = jax.random.normal(jax.random.PRNGKey(1), (t, B2, H4), jnp.float32) * 0.1
    extras = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (t + 1, B2, H),
                          jnp.float32) * 0.1
        for i in range(n_extra)
    ]
    jax.block_until_ready([gx] + extras)
    t_gen = timed(make_runner(kernel_fn, t, True, n_extra), gx, extras, key)
    t_run = timed(make_runner(kernel_fn, t, False, n_extra), gx, extras, key)
    per_kernel = (t_run - t_gen) / N_INNER
    print(f"  {label:26s} T={t:4d}: {per_kernel*1e3:7.3f} ms/kernel "
          f"= {per_kernel/t*1e6:6.2f} us/step")
    return per_kernel


def eval_k(t):
    chunk = auto_chunk(B2, H, 5, weights_bytes=2 * H * H4 * 4)

    def run(gx, extras, w):
        return lstm_scan_pallas(gx, w, chunk=chunk)[0, 0, :8]

    return run


def fwd_k(t):
    chunk = auto_chunk(B2, H, 6, weights_bytes=2 * H * H4 * 4)

    def run(gx, extras, w):
        ys, cs = lt._fwd_pallas(gx, w, chunk, False)
        return ys[0, 0, :8] + cs[0, 0, :8]

    return run


def bwd_k(t):
    chunk = lt._bwd_auto_chunk(B2, H, 2 * H * H4 * 4)

    def run(gx, extras, w):
        cs, dy = extras
        dgx = lt._bwd_pallas(gx, w, cs, dy[:t], chunk, False)
        return dgx[0, 0, :8]

    return run


def scan_k(t):
    def run(gx, extras, w):
        def cell(carry, g_row):
            h, c = carry
            hh_f = h[:B2 // 2] @ w[0]
            hh_b = h[B2 // 2:] @ w[1]
            gates = g_row + jnp.concatenate([hh_f, hh_b], axis=0)
            i, fo, g_, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(fo) * c + jax.nn.sigmoid(i) * jnp.tanh(g_)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B2, H)), jnp.zeros((B2, H)))
        _, ys = jax.lax.scan(cell, init, gx)
        return ys[0, 0, :8]

    return run


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  shape: b2={B2} H={H} "
          f"N_INNER={N_INNER}")
    for t in (160,):
        measure(eval_k(t), "eval kernel (fwd only)", t)
        measure(fwd_k(t), "train fwd kernel", t)
        measure(bwd_k(t), "train bwd kernel", t, n_extra=2)
        measure(scan_k(t), "XLA lax.scan baseline", t)
