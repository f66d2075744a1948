"""Micro-probe: per-step latency of serial (dependent) MXU dots in Mosaic.

Characterizes the recurrence floor described in docs/KERNELS.md: the
flagship LSTM train step spends ~20 ms in chains of dependent
(2B, H) @ (H, 4H) dots.

Measurement method matters on this rig: the TPU is reached through a
tunnel ('axon') with ~25-30 ms host round-trip, and identical repeated
dispatches can be elided.  We therefore CHAIN calls (each call consumes
the previous call's output) and difference two chain lengths, so the
reported number is pure marginal device time.

Run: python tools/probe_dot.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit_chained(fn, h0, *rest, n_lo=4, n_hi=24, reps=3):
    """Marginal per-call device time via chained dispatch differencing."""

    def run_chain(n):
        h = h0
        t0 = time.perf_counter()
        for _ in range(n):
            h = fn(h, *rest)
        jax.tree_util.tree_leaves(h)[0].block_until_ready()
        return time.perf_counter() - t0

    run_chain(2)  # warm
    lo = min(run_chain(n_lo) for _ in range(reps))
    hi = min(run_chain(n_hi) for _ in range(reps))
    return (hi - lo) / (n_hi - n_lo)


def _rand(key, shape, scale):
    return (jax.random.normal(jax.random.PRNGKey(key), shape) * scale).astype(
        jnp.float32)


def probe_chain(r, k, n, mode="bare", unroll=1, steps=160, dtype=jnp.float32,
                vmem_io=False):
    """Serial chain of `steps` dependent dots (R,K)@(K,N) in one kernel.

    vmem_io=True additionally reads a per-step gx row from a VMEM scratch
    and writes the h row back — the real kernel's per-step VMEM traffic.
    """

    def kernel(h0_ref, w_ref, o_ref, gx_scr, out_scr):
        def one(h, c, i):
            g = jnp.dot(h.astype(w_ref.dtype), w_ref[:],
                        preferred_element_type=jnp.float32)
            if vmem_io:
                g = g + gx_scr[i % 8]
            if mode == "bare":
                h = jnp.tanh(g[:, :k])
            elif mode == "cell":  # LSTM gate math, N == 4K
                ii = jax.nn.sigmoid(g[:, :k])
                f = jax.nn.sigmoid(g[:, k:2 * k])
                gg = jnp.tanh(g[:, 2 * k:3 * k])
                o = jax.nn.sigmoid(g[:, 3 * k:])
                c = f * c + ii * gg
                h = o * jnp.tanh(c)
            if vmem_io:
                out_scr[i % 8] = h
            return h, c

        def body(i, carry):
            h, c = carry
            for u in range(unroll):
                h, c = one(h, c, i * unroll + u)
            return h, c

        if vmem_io:
            gx_scr[:] = jnp.zeros((8, r, n), jnp.float32)
        h, c = jax.lax.fori_loop(
            0, steps // unroll, body,
            (h0_ref[:], jnp.zeros((r, k), jnp.float32)))
        o_ref[:] = h + (c if mode == "cell" else 0.0)

    w = _rand(0, (k, n), 0.5 / np.sqrt(k)).astype(dtype)
    h0 = _rand(1, (r, k), 1.0)
    run = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, k), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, r, n) if vmem_io else (1, 8, 128), jnp.float32),
            pltpu.VMEM((8, r, k) if vmem_io else (1, 8, 128), jnp.float32),
        ],
    )
    f = jax.jit(lambda h, w: run(h, w))
    dt = timeit_chained(f, h0, w)
    return dt / steps


def probe_pair(r, k, n, fused, steps=160):
    """Two dots per step that both depend on h_{t-1} (f/b directions)."""

    def kernel(h0_ref, wf_ref, wb_ref, o_ref):
        def body(_, h):
            if fused == "batched":
                hh = h.reshape(2, r, k)
                g = jax.lax.dot_general(
                    hh, jnp.stack([wf_ref[:], wb_ref[:]]),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return jnp.tanh(g.reshape(2 * r, n)[:, :k])
            gf = jnp.dot(h[:r], wf_ref[:], preferred_element_type=jnp.float32)
            gb = jnp.dot(h[r:], wb_ref[:], preferred_element_type=jnp.float32)
            g = jnp.concatenate([gf, gb], axis=0)
            return jnp.tanh(g[:, :k])

        h = jax.lax.fori_loop(0, steps, body, h0_ref[:])
        o_ref[:] = h

    wf = _rand(0, (k, n), 0.5 / np.sqrt(k))
    wb = _rand(2, (k, n), 0.5 / np.sqrt(k))
    h0 = _rand(1, (2 * r, k), 1.0)
    run = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * r, k), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    f = jax.jit(lambda h, a, b: run(h, a, b))
    dt = timeit_chained(f, h0, wf, wb)
    return dt / steps


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} dev={jax.devices()}")
    K, N = 384, 1536

    print("\n-- 1. bare dependent dot (R,384)@(384,1536), us/step --")
    for r in (8, 64, 128, 256, 512, 1024):
        dt = probe_chain(r, K, N, "bare")
        fl = 2 * r * K * N
        print(f"  R={r:5d}: {dt*1e6:7.2f} us/step  {fl/dt/1e12:6.2f} TFLOP/s")

    print("\n-- 2. direction pair (both depend on h_prev), R=128 --")
    for tag in ("split", "batched"):
        dt = probe_pair(128, K, N, tag)
        fl = 2 * 2 * 128 * K * N
        print(f"  {tag:8s}: {dt*1e6:7.2f} us/step  {fl/dt/1e12:6.2f} TFLOP/s")
    dt = probe_chain(256, K, N, "bare")
    print(f"  one 2R dot: {dt*1e6:7.2f} us/step")

    print("\n-- 3. cell math + VMEM io, R=256 --")
    for mode, vio in (("bare", False), ("cell", False), ("bare", True),
                      ("cell", True)):
        dt = probe_chain(256, K, N, mode, vmem_io=vio)
        print(f"  {mode:5s} vmem_io={vio}: {dt*1e6:7.2f} us/step")

    print("\n-- 4. unroll, R=256 cell+io --")
    for u in (1, 2, 4):
        dt = probe_chain(256, K, N, "cell", unroll=u, vmem_io=True)
        print(f"  unroll={u}: {dt*1e6:7.2f} us/step")

    print("\n-- 5. dtype of W, R=256 bare --")
    for dtype in (jnp.float32, jnp.bfloat16):
        dt = probe_chain(256, K, N, "bare", dtype=dtype)
        print(f"  {jnp.dtype(dtype).name:9s}: {dt*1e6:7.2f} us/step")

    print("\n-- 6. shape scaling (R=256) --")
    for (k, n) in ((128, 512), (256, 1024), (384, 1536), (512, 2048)):
        dt = probe_chain(256, k, n, "bare")
        fl = 2 * 256 * k * n
        print(f"  K={k:4d} N={n:5d}: {dt*1e6:7.2f} us/step  {fl/dt/1e12:6.2f} TFLOP/s")
