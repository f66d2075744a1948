"""Trainable v2-layout LSTM Pallas kernels: zero wrapper plane copies.

Training twin of ops/lstm_pallas_v2.py.  v1's train wrapper
(ops/lstm_pallas_train.py) spends ~1 ms/layer on plane copies around the
kernels (x flip/stack, gx direction concat, ys_prev/cs_shift concats, the
hoisted-gates materialization, output split+flip+concat).  v2 removes all
of them:

- ``gx (T, B, 8H)`` comes from ONE dot against lane-concatenated weights;
  the kernels walk the backward direction in reverse time internally.
- the forward kernel emits the layer output as ``ys_store (T+2, B, 2H)``
  with zero guard rows at 0 and T+1 and both directions aligned at row
  t+1 — so the backward kernel reads every shifted ``h_prev`` plane as a
  plain offset row range, no boundary conditionals, and the layer output
  is the free slice ``ys_store[1:T+1]``.
- cell residuals use the same trick: ``cs_resid (T+1, B, 2H)`` holds
  ``c_f[t]`` at row t+1 (lanes 0:H) and ``c_b[t]`` at row t (lanes H:2H),
  so both directions' (c_prev, c_t) pairs are adjacent-row reads.
- the backward kernel recomputes the gate pre-activations from
  gx + h_prev IN-KERNEL instead of materializing an (T, B, 8H) gates
  plane in HBM (the dominant v1 backward traffic) — and, where
  ``_use_hoist`` says it pays, hoists that recomputation out of the
  serial loop as ONE chunk-batched MXU dot plus a vectorized
  transcendental pre-pass, folding the gate jacobians into carry-free
  factor planes.  The serial chain is then just two multiplies and the
  ``dpre @ W_hh^T`` dot per step: measured 0.65 -> 0.12 ms/layer
  fwd+bwd at (95,128,256) bf16 on v5e.  At chunk=1 with large b*h the
  pre-pass VMEM pressure erases the win (docs/KERNELS.md "backward
  gate-hoist"), so the kernel keeps an un-hoisted serial step for that
  corner.
- ``dW_hh`` contracts shifted row slices of ys_store against dgx lanes
  outside the kernel (two XLA dots); dW_ih/dx fall out of the gx dot's
  autodiff as in v1.

Any T: the wrapper zero-pads gx to a chunk multiple (bias-free cells
keep the padded tail's state exactly zero in both directions, so rows
[0, T) are untouched).  Numerics match v1 at fp32 streams up to the
hoisted backward's multiply reassociation (cos 0.99999993 vs scan
ground truth at (95,128,256), same distance as v1's).  With bf16 streams, v2 INTENTIONALLY diverges
from v1's fp32-weights policy: ``W_hh`` is cast to the stream dtype so the
serial recurrent dot (the latency-critical op of the whole layer) runs as
a pure-bf16 MXU matmul with fp32 accumulation, rather than paying the
fp32 matmul rate.  Measured effect on gradients is a cosine of 0.999998
vs the all-fp32 path (docs/KERNELS.md), and the reduced-parity run passes
with these numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.lstm_pallas import _auto_interpret, stream_dtype_for
from ctc_pytorch_tpu.ops.lstm_pallas_v2 import _cell2


# ---------------------------------------------------------------------------
# forward kernel: eval-v2 streaming + ys_store/cs_resid residual emission
# ---------------------------------------------------------------------------

def _make_fwd_kernel(chunk: int, t_max: int, b: int, h: int, sd):
    n_chunks = t_max // chunk
    h4 = 4 * h

    def kernel(gx_hbm, w_ref, ys_hbm, cs_hbm, gf_buf, gb_buf, yf_buf, yb_buf,
               cf_buf, cb_buf, zero_buf, h_scr, c_scr, in_sems, out_sems,
               z_sems):
        def f_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(ci * chunk, chunk), :, pl.ds(0, h4)],
                gf_buf.at[slot], in_sems.at[0, slot])

        def b_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(t_max - (ci + 1) * chunk, chunk), :,
                          pl.ds(h4, h4)],
                gb_buf.at[slot], in_sems.at[1, slot])

        # ys_store row t+1 holds both directions' outputs at time t
        def yf_out(slot, ci):
            return pltpu.make_async_copy(
                yf_buf.at[slot],
                ys_hbm.at[pl.ds(ci * chunk + 1, chunk), :, pl.ds(0, h)],
                out_sems.at[0, slot])

        def yb_out(slot, ci):
            return pltpu.make_async_copy(
                yb_buf.at[slot],
                ys_hbm.at[pl.ds(t_max - (ci + 1) * chunk + 1, chunk), :,
                          pl.ds(h, h)],
                out_sems.at[1, slot])

        # cs_resid: c_f[t] -> row t+1 lanes 0:H; c_b[t] -> row t lanes H:2H
        def cf_out(slot, ci):
            return pltpu.make_async_copy(
                cf_buf.at[slot],
                cs_hbm.at[pl.ds(ci * chunk + 1, chunk), :, pl.ds(0, h)],
                out_sems.at[2, slot])

        def cb_out(slot, ci):
            return pltpu.make_async_copy(
                cb_buf.at[slot],
                cs_hbm.at[pl.ds(t_max - (ci + 1) * chunk, chunk), :,
                          pl.ds(h, h)],
                out_sems.at[3, slot])

        # zero the guard rows (ys rows 0 and T+1; cs rows 0 and T) BEFORE
        # any chunk writes land next to them
        zero_buf[:] = jnp.zeros((1, b, 2 * h), sd)
        z0 = pltpu.make_async_copy(zero_buf, ys_hbm.at[pl.ds(0, 1)],
                                   z_sems.at[0])
        z1 = pltpu.make_async_copy(zero_buf,
                                   ys_hbm.at[pl.ds(t_max + 1, 1)],
                                   z_sems.at[1])
        z2 = pltpu.make_async_copy(zero_buf, cs_hbm.at[pl.ds(0, 1)],
                                   z_sems.at[2])
        z3 = pltpu.make_async_copy(zero_buf, cs_hbm.at[pl.ds(t_max, 1)],
                                   z_sems.at[3])
        for z in (z0, z1, z2, z3):
            z.start()
        h_scr[:] = jnp.zeros((2, b, h), jnp.float32)
        c_scr[:] = jnp.zeros((2, b, h), jnp.float32)
        f_in(0, 0).start()
        b_in(0, 0).start()
        for z in (z0, z1, z2, z3):
            z.wait()

        def chunk_body(ci, _):
            slot = ci % 2
            nxt = (ci + 1) % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                f_in(nxt, ci + 1).start()
                b_in(nxt, ci + 1).start()

            f_in(slot, ci).wait()
            b_in(slot, ci).wait()

            @pl.when(ci >= 2)
            def _():
                yf_out(slot, ci - 2).wait()
                yb_out(slot, ci - 2).wait()
                cf_out(slot, ci - 2).wait()
                cb_out(slot, ci - 2).wait()

            def step(k, carry):
                hs, cs = carry
                gx2 = jnp.stack([gf_buf[slot, k],
                                 gb_buf[slot, chunk - 1 - k]])
                hs, cs = _cell2(gx2, hs, cs, w_ref)
                yf_buf[slot, k] = hs[0].astype(sd)
                yb_buf[slot, chunk - 1 - k] = hs[1].astype(sd)
                cf_buf[slot, k] = cs[0].astype(sd)
                cb_buf[slot, chunk - 1 - k] = cs[1].astype(sd)
                return hs, cs

            hs, cs = jax.lax.fori_loop(0, chunk, step, (h_scr[:], c_scr[:]))
            h_scr[:] = hs
            c_scr[:] = cs
            yf_out(slot, ci).start()
            yb_out(slot, ci).start()
            cf_out(slot, ci).start()
            cb_out(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            s = (n_chunks - 2) % 2
            yf_out(s, n_chunks - 2).wait()
            yb_out(s, n_chunks - 2).wait()
            cf_out(s, n_chunks - 2).wait()
            cb_out(s, n_chunks - 2).wait()

        s = (n_chunks - 1) % 2
        yf_out(s, n_chunks - 1).wait()
        yb_out(s, n_chunks - 1).wait()
        cf_out(s, n_chunks - 1).wait()
        cb_out(s, n_chunks - 1).wait()

    return kernel


# ---------------------------------------------------------------------------
# backward kernel: un-hoisted gates, dual-direction walk, emits dgx
# ---------------------------------------------------------------------------

def _use_hoist(chunk: int, b: int, h: int) -> bool:
    # measured crossover (same-process A/B, v5e): the hoisted pre-pass
    # wins everywhere except chunk=1 at large h, where its VMEM pressure
    # (pre_buf + transient gate planes at 7h/4h lanes) erases the win
    # ((80,128,384) bf16: old 0.80-1.14 vs new 1.15-1.26 ms/layer;
    # (95,128,256): old 0.52-0.64 vs new 0.43-0.55)
    return chunk >= 2 or b * h <= 128 * 256


def _lstm_prepass(chunk, b, h, h4, w_ref, gf_buf, gb_buf, hp0_buf, hp1_buf,
                  cs0_buf, cs1_buf, dy0_buf, dy1_buf, pre_buf, slot):
    dd = w_ref.dtype
    hp2a = jnp.stack([hp0_buf[:], hp1_buf[:]])  # (2, c, b, h)
    hh = jax.lax.dot_general(
        hp2a.reshape(2, chunk * b, h).astype(dd), w_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(2, chunk, b, h4)
    gates = jnp.stack(
        [gf_buf[slot], gb_buf[slot]]).astype(jnp.float32) + hh
    i = jax.nn.sigmoid(gates[..., :h])
    f = jax.nn.sigmoid(gates[..., h:2 * h])
    g = jnp.tanh(gates[..., 2 * h:3 * h])
    o = jax.nn.sigmoid(gates[..., 3 * h:])
    # per-direction (c_prev, c_t) pairs are adjacent row ranges
    ct = jnp.stack([cs0_buf[1:chunk + 1], cs1_buf[0:chunk]]
                   ).astype(jnp.float32)
    cpv = jnp.stack([cs0_buf[0:chunk], cs1_buf[1:chunk + 1]]
                    ).astype(jnp.float32)
    tc = jnp.tanh(ct)
    dy = jnp.stack([dy0_buf[:], dy1_buf[:]]).astype(jnp.float32)
    # lanes: [A | Gi | Gf | Gg | Go | f | dy], each h wide
    pre = jnp.concatenate([
        o * (1.0 - tc * tc),       # A: dct factor of dh_t
        g * (i * (1.0 - i)),       # Gi: dpre_i = dct * Gi
        cpv * (f * (1.0 - f)),     # Gf: dpre_f = dct * Gf
        i * (1.0 - g * g),         # Gg: dpre_g = dct * Gg
        tc * (o * (1.0 - o)),      # Go: dpre_o = dh_t * Go
        f,                         # dc_prev = dct * f
        dy,
    ], axis=-1)  # (2, c, b, 7h)
    # store in STEP order (dir0 walks its buffer rows in reverse);
    # static unroll (chunk <= 8) -- Mosaic has no rev/value-slice
    for j in range(chunk):
        pre_buf[j, 0] = pre[0, chunk - 1 - j]
        pre_buf[j, 1] = pre[1, j]


def _make_bwd_kernel(chunk: int, t_max: int, b: int, h: int, sd):
    n_chunks = t_max // chunk
    h4 = 4 * h
    use_hoist = _use_hoist(chunk, b, h)

    def kernel(gx_hbm, w_ref, ys_hbm, cs_hbm, dy_hbm, dgx_hbm,
               gf_buf, gb_buf, hp0_buf, hp1_buf, cs0_buf, cs1_buf,
               dy0_buf, dy1_buf, dg0_buf, dg1_buf, pre_buf, dh_scr, dc_scr,
               in_sems, out_sems):
        # dir0 walks time in REVERSE (chunk n-1-ci), dir1 FORWARD (chunk ci)
        def a0(ci):
            return (n_chunks - 1 - ci) * chunk

        def a1(ci):
            return ci * chunk

        def big_in(slot, ci):
            return [
                pltpu.make_async_copy(  # gx dir0 rows [a0, a0+c) lanes 0:4H
                    gx_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h4)],
                    gf_buf.at[slot], in_sems.at[0, slot]),
                pltpu.make_async_copy(  # gx dir1 lanes 4H:8H
                    gx_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h4, h4)],
                    gb_buf.at[slot], in_sems.at[1, slot]),
            ]

        def small_in(ci):
            # single-buffered (waited immediately): tiny next to gx/dgx
            return [
                pltpu.make_async_copy(  # h_prev0(t)=ys[t,0:H], rows [a0,a0+c)
                    ys_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h)],
                    hp0_buf, in_sems.at[2, 0]),
                pltpu.make_async_copy(  # h_prev1(t)=ys[t+2,H:2H]
                    ys_hbm.at[pl.ds(a1(ci) + 2, chunk), :, pl.ds(h, h)],
                    hp1_buf, in_sems.at[3, 0]),
                pltpu.make_async_copy(  # cs dir0 rows [a0, a0+c+1) lanes 0:H
                    cs_hbm.at[pl.ds(a0(ci), chunk + 1), :, pl.ds(0, h)],
                    cs0_buf, in_sems.at[4, 0]),
                pltpu.make_async_copy(  # cs dir1 rows [a1, a1+c+1) lanes H:2H
                    cs_hbm.at[pl.ds(a1(ci), chunk + 1), :, pl.ds(h, h)],
                    cs1_buf, in_sems.at[5, 0]),
                pltpu.make_async_copy(  # dy dir0
                    dy_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h)],
                    dy0_buf, in_sems.at[6, 0]),
                pltpu.make_async_copy(  # dy dir1
                    dy_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h, h)],
                    dy1_buf, in_sems.at[7, 0]),
            ]

        def dmas_out(slot, ci):
            return [
                pltpu.make_async_copy(
                    dg0_buf.at[slot],
                    dgx_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h4)],
                    out_sems.at[0, slot]),
                pltpu.make_async_copy(
                    dg1_buf.at[slot],
                    dgx_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h4, h4)],
                    out_sems.at[1, slot]),
            ]

        dh_scr[:] = jnp.zeros((2, b, h), jnp.float32)
        dc_scr[:] = jnp.zeros((2, b, h), jnp.float32)
        for d in big_in(0, 0):
            d.start()

        def chunk_body(ci, _):
            slot = ci % 2
            nxt = (ci + 1) % 2

            for d in small_in(ci):
                d.start()

            @pl.when(ci + 1 < n_chunks)
            def _():
                for d in big_in(nxt, ci + 1):
                    d.start()

            for d in big_in(slot, ci):
                d.wait()
            for d in small_in(ci):
                d.wait()

            @pl.when(ci >= 2)
            def _():
                for d in dmas_out(slot, ci - 2):
                    d.wait()

            # ---- parallel pre-pass over the whole chunk ----
            # The gate recomputation (hh dot + sigmoids/tanh) depends only
            # on PRE-LOADED planes (h_prev, gx, cs), never on the serial
            # carry: hoist it out of the step loop as ONE chunk-batched MXU
            # dot and one vectorized transcendental pass.  The serial chain
            # keeps only the carry-dependent multiplies and the dpre@W^T
            # dot — half the per-step dot latency of the un-hoisted form.
            # Folding the gate jacobians into carry-free factors reassociates
            # fp32 multiplies (e.g. (dct*g)*i*(1-i) -> dct*(g*i*(1-i))):
            # same math, ulp-level differences only.
            # Gated by _use_hoist: at chunk=1 with large h the pre-pass
            # VMEM pressure (measured at (80,128,384) bf16) erases the
            # win; the un-hoisted step below serves that corner.
            dd = w_ref.dtype
            if use_hoist:
                _lstm_prepass(chunk, b, h, h4, w_ref, gf_buf, gb_buf,
                              hp0_buf, hp1_buf, cs0_buf, cs1_buf,
                              dy0_buf, dy1_buf, pre_buf, slot)

            def step(k, carry):
                dh, dc = carry
                r = chunk - 1 - k  # dir0's in-buffer row (reverse walk)
                pk = pre_buf[k]  # (2, b, 7h)
                dh_t = pk[..., 6 * h:] + dh
                dct = dc + dh_t * pk[..., :h]
                dpre = jnp.concatenate([
                    dct * pk[..., h:2 * h],
                    dct * pk[..., 2 * h:3 * h],
                    dct * pk[..., 3 * h:4 * h],
                    dh_t * pk[..., 4 * h:5 * h],
                ], axis=-1)  # (2, B, 4H)
                dg0_buf[slot, r] = dpre[0].astype(sd)
                dg1_buf[slot, k] = dpre[1].astype(sd)
                dh_prev = jax.lax.dot_general(
                    dpre.astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                dc_prev = dct * pk[..., 5 * h:6 * h]
                return dh_prev, dc_prev

            def step_unhoisted(k, carry):
                dh, dc = carry
                r = chunk - 1 - k
                gx2 = jnp.stack([gf_buf[slot, r], gb_buf[slot, k]])
                hp2 = jnp.stack([hp0_buf[r], hp1_buf[k]])
                cprev2 = jnp.stack([cs0_buf[r], cs1_buf[k + 1]])
                ct2 = jnp.stack([cs0_buf[r + 1], cs1_buf[k]])
                dy2 = jnp.stack([dy0_buf[r], dy1_buf[k]])
                hh_s = jax.lax.dot_general(
                    hp2.astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                gates_s = gx2.astype(jnp.float32) + hh_s
                i_ = jax.nn.sigmoid(gates_s[..., :h])
                f_ = jax.nn.sigmoid(gates_s[..., h:2 * h])
                g_ = jnp.tanh(gates_s[..., 2 * h:3 * h])
                o_ = jax.nn.sigmoid(gates_s[..., 3 * h:])
                tc_ = jnp.tanh(ct2.astype(jnp.float32))
                dh_t = dy2.astype(jnp.float32) + dh
                do = dh_t * tc_
                dct = dc + dh_t * o_ * (1.0 - tc_ * tc_)
                dpre = jnp.concatenate([
                    dct * g_ * (i_ * (1.0 - i_)),
                    dct * cprev2.astype(jnp.float32) * (f_ * (1.0 - f_)),
                    dct * i_ * (1.0 - g_ * g_),
                    do * (o_ * (1.0 - o_)),
                ], axis=-1)
                dg0_buf[slot, r] = dpre[0].astype(sd)
                dg1_buf[slot, k] = dpre[1].astype(sd)
                dh_prev = jax.lax.dot_general(
                    dpre.astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                dc_prev = dct * f_
                return dh_prev, dc_prev

            body_fn = step if use_hoist else step_unhoisted
            dh, dc = jax.lax.fori_loop(0, chunk, body_fn,
                                       (dh_scr[:], dc_scr[:]))
            dh_scr[:] = dh
            dc_scr[:] = dc
            for d in dmas_out(slot, ci):
                d.start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            for d in dmas_out((n_chunks - 2) % 2, n_chunks - 2):
                d.wait()

        for d in dmas_out((n_chunks - 1) % 2, n_chunks - 1):
            d.wait()

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _fwd_pallas(gx, w_hh, chunk, interpret):
    t, b, h8 = gx.shape
    h = h8 // 8
    sd = gx.dtype
    kernel = _make_fwd_kernel(chunk, t, b, h, sd)
    w_hh = w_hh.astype(sd)
    ys_store, cs_resid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t + 2, b, 2 * h), sd),
            jax.ShapeDtypeStruct((t + 1, b, 2 * h), sd),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b, 4 * h), sd),  # gx fwd
            pltpu.VMEM((2, chunk, b, 4 * h), sd),  # gx bwd
            pltpu.VMEM((2, chunk, b, h), sd),  # y fwd
            pltpu.VMEM((2, chunk, b, h), sd),  # y bwd
            pltpu.VMEM((2, chunk, b, h), sd),  # c fwd
            pltpu.VMEM((2, chunk, b, h), sd),  # c bwd
            pltpu.VMEM((1, b, 2 * h), sd),  # zero guard row
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh)
    return ys_store, cs_resid


def _bwd_pallas(gx, w_hh, ys_store, cs_resid, dy, chunk, interpret):
    t, b, h8 = gx.shape
    h = h8 // 8
    sd = gx.dtype
    kernel = _make_bwd_kernel(chunk, t, b, h, sd)
    w_hh = w_hh.astype(sd)
    dgx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, b, h8), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec(memory_space=pl.ANY),  # ys_store
            pl.BlockSpec(memory_space=pl.ANY),  # cs_resid
            pl.BlockSpec(memory_space=pl.ANY),  # dy
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b, 4 * h), sd),  # gx dir0
            pltpu.VMEM((2, chunk, b, 4 * h), sd),  # gx dir1
            pltpu.VMEM((chunk, b, h), sd),  # h_prev dir0 (single buf)
            pltpu.VMEM((chunk, b, h), sd),  # h_prev dir1
            pltpu.VMEM((chunk + 1, b, h), sd),  # cs dir0
            pltpu.VMEM((chunk + 1, b, h), sd),  # cs dir1
            pltpu.VMEM((chunk, b, h), sd),  # dy dir0
            pltpu.VMEM((chunk, b, h), sd),  # dy dir1
            pltpu.VMEM((2, chunk, b, 4 * h), sd),  # dgx dir0
            pltpu.VMEM((2, chunk, b, 4 * h), sd),  # dgx dir1
            pltpu.VMEM(
                (chunk, 2, b, 7 * h) if _use_hoist(chunk, b, h)
                else (1, 1, 8, 128), jnp.float32),  # pre-pass (or dummy)
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.SemaphoreType.DMA((8, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh, ys_store, cs_resid, dy)
    return dgx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lstm_scan_train_v2(gx, w_hh, chunk: int, interpret: bool | None = None):
    """gx (T, B, 8H) -> ys_store (T+2, B, 2H); slice [1:T+1] is the layer
    output.  T % chunk == 0 required (caller gates via v2_ok)."""
    ys, _ = _fwd_impl(gx, w_hh, chunk, interpret)
    return ys


def _fwd_impl(gx, w_hh, chunk, interpret):
    interp = _auto_interpret(interpret)
    ys_store, cs_resid = _fwd_pallas(gx, w_hh.astype(jnp.float32), chunk,
                                     interp)
    return ys_store, (gx, w_hh, ys_store, cs_resid)


def _fwd_rule(gx, w_hh, chunk, interpret):
    return _fwd_impl(gx, w_hh, chunk, interpret)


def _bwd_rule(chunk, interpret, res, dys):
    gx, w_hh, ys_store, cs_resid, = res
    interp = _auto_interpret(interpret)
    t = gx.shape[0]
    h = w_hh.shape[1]
    sd = gx.dtype
    # cotangent arrives for the full ys_store; rows 1..T are the real
    # output rows (guard rows receive zeros from the wrapper's slice VJP)
    dy = dys[1:t + 1].astype(sd)
    dgx = _bwd_pallas(gx, w_hh.astype(jnp.float32), ys_store, cs_resid, dy,
                      chunk, interp)
    # dW_hh from shifted ys_store row slices against dgx lanes:
    # dir0: sum_t y_f[t-1]^T dpre_f[t]  = ys_store[0:T, 0:H] . dgx[:, 0:4H]
    # dir1: sum_t y_b[t+1]^T dpre_b[t]  = ys_store[2:T+2, H:2H] . dgx[:, 4H:]
    dw_f = jnp.einsum("tbh,tbg->hg", ys_store[0:t, :, :h],
                      dgx[..., : 4 * h], preferred_element_type=jnp.float32)
    dw_b = jnp.einsum("tbh,tbg->hg", ys_store[2:t + 2, :, h:],
                      dgx[..., 4 * h:], preferred_element_type=jnp.float32)
    return dgx, jnp.stack([dw_f, dw_b]).astype(w_hh.dtype)


lstm_scan_train_v2.defvjp(_fwd_rule, _bwd_rule)


def _pick_chunk(t: int, b: int, h: int, sd_bytes: int,
                budget: int = 13 * 1024 * 1024) -> int:
    """Largest chunk dividing T whose backward buffers fit VMEM."""
    w_bytes = 2 * h * 4 * h * sd_bytes
    carries = 4 * 2 * b * h * 4
    # divisibility is NOT required: the wrapper zero-pads gx to a chunk
    # multiple (see gru_pallas_v2._pick_chunk)
    for c in (8, 4, 2, 1):
        # bwd footprint: (gx + dgx) double-buffered + 6 single small streams
        bufs = (2 * 2 * c * b * 4 * h * 2 + 6 * (c + 1) * b * h) * sd_bytes
        # + the hoisted pre-pass values (gates fp32 + 7 step-ordered
        # carry-free factor planes, all (c, 2, b, h) fp32) — only when the
        # kernel actually hoists at this chunk (a dummy (1,1,8,128) scratch
        # is allocated otherwise, so charging the full footprint would
        # reject shapes that fit the un-hoisted kernel)
        hoist = 24 * c * b * h * 4 if _use_hoist(c, b, h) else 0
        if bufs + hoist + w_bytes + carries <= budget:
            return c
    return 0


def lstm_bidir_train_v2(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, 4H)
    w_hh: jnp.ndarray,  # (2, H, 4H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Trainable bidirectional layer, v2 layout; same semantics as
    ``lstm_bidir_train`` when T % chunk == 0."""
    t, b, _ = x.shape
    h = w_hh.shape[1]
    # v2 buffers are per-direction: the sublane dim is b (not the v1
    # stacked 2B), so the bf16 min-tile check must see b itself
    sd = stream_dtype_for(compute_dtype, b)
    if chunk is None:
        chunk = _pick_chunk(t, b, h, jnp.dtype(sd).itemsize)
        if chunk == 0:
            raise ValueError("no v2 chunk fits VMEM; use the v1 path")
    tp = -(-t // chunk) * chunk
    if tp != t:
        # pad BEFORE the gx dot: zero input rows give zero gx rows
        # (bias-free cells); rows [0, t) are unchanged (gru_pallas_v2)
        x = jnp.pad(x, ((0, tp - t), (0, 0), (0, 0)))
    w_cat = jnp.concatenate([w_ih[0], w_ih[1]], axis=1).astype(compute_dtype)
    gx = jax.lax.dot_general(
        x.reshape(tp * b, -1).astype(compute_dtype), w_cat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=sd,
    ).reshape(tp, b, 8 * h)
    ys_store = lstm_scan_train_v2(gx, w_hh.astype(jnp.float32), chunk,
                                  interpret)
    return ys_store[1:t + 1].astype(jnp.float32)


def train_v2_ok(t: int, b: int, h: int, compute_dtype) -> bool:
    # v2 buffers are per-direction: the sublane dim is b (not the v1
    # stacked 2B), so the bf16 min-tile check must see b itself
    sd = stream_dtype_for(compute_dtype, b)
    # any t: the wrapper zero-pads gx to a chunk multiple (the 863 conv
    # front's odd t'=95 costs one zero row; v1's wrapper plane copies
    # cost ~1 ms/layer)
    return (t >= 1 and h % 128 == 0 and (2 * b) % 8 == 0
            and _pick_chunk(t, b, h, jnp.dtype(sd).itemsize) > 0)
