"""Formulation ladder for the 863 conv front (1->16ch, k(11,5), s(2,2)).

Why: tools/probe_863.py put the conv front at ~1.9 ms of the 6.9 ms 863
step -- 27% of the time for ~1.3% of the FLOPs.  A C_in=1, C_out=16 conv
leaves the MXU almost empty (contraction 55, output lanes 16 of 128), so
the question is which reformulation XLA lowers best on v5e:

  a) conv_nhwc     -- the shipped lowering (models/cnn.py)
  b) s2d           -- space-to-depth by the stride: x(B,200,201,1) ->
                      (B,100,100,4), kernel (6,3), stride 1.  Same math
                      (taps regrouped by input parity), contraction 72.
  c) im2col        -- conv_general_dilated_patches -> (.., 55) einsum
                      with the (55,16) filter: one tall-skinny matmul.
  d) taps          -- 55 shifted strided slices accumulated with
                      broadcast multiplies (no MXU at all; pure VPU).

Each measured fwd-only and fwd+bwd (grad wrt x and w), gen-subtracted,
N_INNER chained under one scan (tunnel-safe timing per docs/KERNELS.md).

Run: python tools/probe_conv863.py
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B, T, F = 128, 200, 201
KT, KF, ST, SF, CO = 11, 5, 2, 2, 16
TO = (T - KT) // ST + 1  # 95
FO = (F - KF) // SF + 1  # 99
N_INNER = 20
CDT = jnp.bfloat16


def conv_nhwc(x, w):
    # x (B,T,F,1), w OIHW (16,1,11,5)
    return jax.lax.conv_general_dilated(
        x, w.astype(CDT).transpose(2, 3, 1, 0),
        window_strides=(ST, SF), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x, w):
    # Regroup taps by input parity: y[to,fo] = sum_dt,df x[2to+dt, 2fo+df].
    # Even/odd time taps: dt in {0,2,..,10} (6) on x_even, {1,..,9} (5) on
    # x_odd; same split in freq (3+2).  Pad x so every parity plane covers
    # the full tap range, stack parities as channels, conv k(6,3) s1.
    xp = jnp.pad(x[..., 0], ((0, 0), (0, ST), (0, SF)))  # (B,202,202)
    planes = [xp[:, i::ST, j::SF][:, : T // ST, : (F + 1) // SF]
              for i in range(ST) for j in range(SF)]
    xs = jnp.stack(planes, axis=-1)  # (B,100,101,4)
    # kernel for parity plane (i,j): taps w[dt,df] with dt%2==i, df%2==j
    # placed at (dt//2, df//2); shapes (6,3) each, zero-padded.
    w_oihw = w.astype(CDT)  # (16,1,11,5)
    kt2, kf2 = (KT + 1) // ST, (KF + 1) // SF  # 6, 3
    kern = jnp.zeros((kt2, kf2, ST * SF, CO), CDT)
    for i in range(ST):
        for j in range(SF):
            sub = w_oihw[:, 0, i::ST, j::SF]  # (16, taps_t, taps_f)
            kern = kern.at[: sub.shape[1], : sub.shape[2], i * SF + j, :].set(
                sub.transpose(1, 2, 0))
    out = jax.lax.conv_general_dilated(
        xs, kern, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[:, :TO, :FO, :]


def im2col(x, w):
    pat = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), (KT, KF), (ST, SF), [(0, 0), (0, 0)])
    # (B, 55, TO, FO) channels-first patches
    wm = w.astype(CDT).reshape(CO, KT * KF).T  # (55,16)
    return jnp.einsum("bkto,kc->btoc".replace("to", "xy"), pat, wm)


def taps(x, w):
    acc = jnp.zeros((B, TO, FO, CO), CDT)
    x2 = x[..., 0]
    for dt in range(KT):
        for df in range(KF):
            sl = jax.lax.slice(x2, (0, dt, df),
                               (B, dt + (TO - 1) * ST + 1,
                                df + (FO - 1) * SF + 1), (1, ST, SF))
            acc = acc + sl[..., None] * w.astype(CDT)[:, 0, dt, df]
    return acc


VARIANTS = {"conv_nhwc": conv_nhwc, "s2d": s2d, "im2col": im2col,
            "taps": taps}


def run_one(fn, bwd: bool, gen_only: bool):
    w0 = jnp.asarray(np.random.RandomState(0).randn(CO, 1, KT, KF)
                     .astype(np.float32))

    @jax.jit
    def run(key, w):
        def body(acc, k):
            x = jax.random.normal(k, (B, T, F, 1), CDT)
            # consume FULL tensors: partial slices let XLA DCE the op
            if gen_only:
                return acc + jnp.sum(x.astype(jnp.float32)), ()
            if bwd:
                def f(xx, ww):
                    o = fn(xx, ww)
                    return jnp.sum(o.astype(jnp.float32) ** 2)
                l, (gx, gw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
                return (acc + l + jnp.sum(gx.astype(jnp.float32))
                        + jnp.sum(gw.astype(jnp.float32))
                        + jnp.sum(x.astype(jnp.float32))), ()
            o = fn(x, w)
            return (acc + jnp.sum(o.astype(jnp.float32))
                    + jnp.sum(x.astype(jnp.float32))), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jax.random.split(key, N_INNER))
        return acc

    key = jax.random.PRNGKey(5)
    float(run(key, w0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key, w0))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, fn, bwd):
    tg = run_one(fn, bwd, True)
    tf = run_one(fn, bwd, False)
    ms = (tf - tg) / N_INNER * 1e3
    print(f"  {name:12s} {'fwd+bwd' if bwd else 'fwd    '}: {ms:8.3f} ms",
          flush=True)
    return ms


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  B={B} T={T} F={F} "
          f"-> ({TO},{FO},{CO})  N_INNER={N_INNER}")
    # correctness first, on small fp32 shapes
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, F, 1).astype(np.float32)).astype(CDT)
    w = jnp.asarray(rng.randn(CO, 1, KT, KF).astype(np.float32))
    ref = np.asarray(conv_nhwc(x, w), np.float32)
    for name, fn in VARIANTS.items():
        got = np.asarray(fn(x, w), np.float32)
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        print(f"  {name:12s} rel err vs conv_nhwc: {err:.2e}")
        # taps accumulates 55 adds in bf16 -> looser band
        assert err < (6e-2 if name == "taps" else 2e-2), name
    for name, fn in VARIANTS.items():
        measure(name, fn, bwd=False)
    for name, fn in VARIANTS.items():
        measure(name, fn, bwd=True)
