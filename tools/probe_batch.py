"""Batch-size scaling of the flagship train step on hardware.

The headline bench runs B=128 (bench.py). The serial recurrence cost per
step is batch-independent inside each kernel chunk, so a larger batch may
amortize it and lift utts/sec — or VMEM pressure may push the kernels to
smaller chunks and lose it. This probe measures the step rate at a ladder
of batch sizes with the identical flagship spec to find the knee.

Methodology per docs/KERNELS.md: chained steps under one state, synced by
a host fetch of the final loss; median of 3 repeats.

Usage: python tools/probe_batch.py [B ...]
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


def time_step(b: int, steps: int = 30, warmup: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_spec
    from bench import F, L, NUM_CLASS, T
    from ctc_pytorch_tpu.train.loop import make_step_fns
    from ctc_pytorch_tpu.train.state import create_train_state

    cfg, spec = _flagship_spec()
    spec = dataclasses.replace(spec, use_pallas_rnn=True)
    state, tx = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay
    )
    train_jit, _ = make_step_fns(spec, tx, ctc_impl="pallas")
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, T, F).astype(np.float32))
    frac = jnp.asarray(np.full(b, 0.95, np.float32))
    labels = jnp.asarray(
        rng.randint(1, NUM_CLASS, size=(b, L)).astype(np.int32))
    label_lens = jnp.asarray(np.full(b, L, np.int32))
    mask = jnp.ones((b,), jnp.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, loss, _, _ = train_jit(state, feats, frac, labels,
                                      label_lens, mask, key)
    float(loss)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss, _, _ = train_jit(state, feats, frac, labels,
                                          label_lens, mask, key)
        float(loss)
        rates.append(steps * b / (time.perf_counter() - t0))
    return sorted(rates)[len(rates) // 2]


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]
    for b in batches:
        try:
            rate = time_step(b)
        except Exception as e:  # VMEM blowups at large B are a finding too
            print(f"B={b:4d}  FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"B={b:4d}  {rate:8.1f} utts/sec  ({1e3 * b / rate:.2f} ms/step)")


if __name__ == "__main__":
    main()
