"""Measure the dropout-plane cost of the flagship train step on hardware.

Closes the last entry of docs/KERNELS.md "remaining known slack": the
inter-layer dropout passes (hardware-RNG mask generation + apply on the
(T, B, 2H) planes and their VJPs).  Times the identical flagship step at
``drop_out = 0.2`` (recipe value) vs ``0.0`` — the delta bounds what an
in-kernel (pltpu PRNG) mask fusion could ever recover.

Methodology per docs/KERNELS.md: same jitted step chained through the
state, synced by a host fetch of the final loss; median of 3 repeats.

Usage: python tools/probe_dropout.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def time_step(drop: float, steps: int = 30, warmup: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_spec
    from bench import B, F, L, NUM_CLASS, T
    from ctc_pytorch_tpu.train.loop import make_step_fns
    from ctc_pytorch_tpu.train.state import create_train_state

    cfg, spec = _flagship_spec()
    spec = dataclasses.replace(spec, use_pallas_rnn=True, drop_out=drop)
    state, tx = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay
    )
    train_jit, _ = make_step_fns(spec, tx, ctc_impl="pallas")
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    frac = jnp.asarray(np.full(B, 0.95, np.float32))
    labels = jnp.asarray(
        rng.randint(1, NUM_CLASS, size=(B, L)).astype(np.int32))
    label_lens = jnp.asarray(np.full(B, L, np.int32))
    mask = jnp.ones((B,), jnp.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, loss, _, _ = train_jit(
            state, feats, frac, labels, label_lens, mask, key)
    float(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss, _, _ = train_jit(
                state, feats, frac, labels, label_lens, mask, key)
        float(loss)
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[1]


def main():
    from bench import B

    t_drop = time_step(0.2)
    t_nodrop = time_step(0.0)
    print(f"step with drop_out=0.2 : {t_drop * 1e3:8.3f} ms "
          f"({B / t_drop:8.0f} utts/s)")
    print(f"step with drop_out=0.0 : {t_nodrop * 1e3:8.3f} ms "
          f"({B / t_nodrop:8.0f} utts/s)")
    print(f"dropout-plane cost     : {(t_drop - t_nodrop) * 1e3:8.3f} ms "
          f"({100 * (t_drop - t_nodrop) / t_drop:.1f}% of the step)")


if __name__ == "__main__":
    main()
