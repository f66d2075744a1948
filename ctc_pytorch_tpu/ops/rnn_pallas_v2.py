"""v2-layout vanilla-RNN (tanh) Pallas kernels (eval + trainable).

Simplest member of the v2 kernel family (see ops/lstm_pallas_train_v2.py
for the layout story): ``gx (T, B, 2H)`` lanes split by direction,
in-kernel time reversal, guard-row ``ys_store (T+2, B, 2H)`` residual.
The tanh cell needs NO gate recompute in the backward — ``tanh'`` comes
from the stored output itself:

    dpre     = (dy_t + dh) * (1 - h_t^2)      (= d gx_t)
    dh_{t-1} = dpre @ W_hh^T
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.lstm_pallas import _auto_interpret, stream_dtype_for


def _rnn_cell2(gx2, h, w_ref):
    dd = w_ref.dtype
    hh = jax.lax.dot_general(
        h.astype(dd), w_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return jnp.tanh(gx2.astype(jnp.float32) + hh)


def _make_fwd_kernel(chunk: int, t_max: int, b: int, h: int, sd,
                     with_guard: bool):
    n_chunks = t_max // chunk
    off = 1 if with_guard else 0

    def kernel(gx_hbm, w_ref, ys_hbm, gf_buf, gb_buf, yf_buf, yb_buf,
               zero_buf, h_scr, in_sems, out_sems, z_sems):
        def f_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(ci * chunk, chunk), :, pl.ds(0, h)],
                gf_buf.at[slot], in_sems.at[0, slot])

        def b_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(t_max - (ci + 1) * chunk, chunk), :,
                          pl.ds(h, h)],
                gb_buf.at[slot], in_sems.at[1, slot])

        def yf_out(slot, ci):
            return pltpu.make_async_copy(
                yf_buf.at[slot],
                ys_hbm.at[pl.ds(ci * chunk + off, chunk), :, pl.ds(0, h)],
                out_sems.at[0, slot])

        def yb_out(slot, ci):
            return pltpu.make_async_copy(
                yb_buf.at[slot],
                ys_hbm.at[pl.ds(t_max - (ci + 1) * chunk + off, chunk), :,
                          pl.ds(h, h)],
                out_sems.at[1, slot])

        if with_guard:
            zero_buf[:] = jnp.zeros((1, b, 2 * h), sd)
            z0 = pltpu.make_async_copy(zero_buf, ys_hbm.at[pl.ds(0, 1)],
                                       z_sems.at[0])
            z1 = pltpu.make_async_copy(
                zero_buf, ys_hbm.at[pl.ds(t_max + 1, 1)], z_sems.at[1])
            z0.start()
            z1.start()
        h_scr[:] = jnp.zeros((2, b, h), jnp.float32)
        f_in(0, 0).start()
        b_in(0, 0).start()
        if with_guard:
            z0.wait()
            z1.wait()

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

            def step(k, hs):
                gx2 = jnp.stack([gf_buf[slot, k],
                                 gb_buf[slot, chunk - 1 - k]])
                hs = _rnn_cell2(gx2, hs, w_ref)
                yf_buf[slot, k] = hs[0].astype(sd)
                yb_buf[slot, chunk - 1 - k] = hs[1].astype(sd)
                return hs

            h_scr[:] = jax.lax.fori_loop(0, chunk, step, h_scr[:])
            yf_out(slot, ci).start()
            yb_out(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            s = (n_chunks - 2) % 2
            yf_out(s, n_chunks - 2).wait()
            yb_out(s, n_chunks - 2).wait()

        s = (n_chunks - 1) % 2
        yf_out(s, n_chunks - 1).wait()
        yb_out(s, n_chunks - 1).wait()

    return kernel


def _make_bwd_kernel(chunk: int, t_max: int, b: int, h: int, sd):
    n_chunks = t_max // chunk

    def kernel(w_ref, ys_hbm, dy_hbm, dgx_hbm,
               ht0_buf, ht1_buf, dy0_buf, dy1_buf, dg0_buf, dg1_buf,
               pre_buf, dh_scr, in_sems, out_sems):
        def a0(ci):
            return (n_chunks - 1 - ci) * chunk  # dir0 reverse walk

        def a1(ci):
            return ci * chunk  # dir1 forward walk

        def small_in(ci):
            return [
                pltpu.make_async_copy(  # h_t0(t) = ys_store[t+1, 0:H]
                    ys_hbm.at[pl.ds(a0(ci) + 1, chunk), :, pl.ds(0, h)],
                    ht0_buf, in_sems.at[0, 0]),
                pltpu.make_async_copy(  # h_t1(t) = ys_store[t+1, H:2H]
                    ys_hbm.at[pl.ds(a1(ci) + 1, chunk), :, pl.ds(h, h)],
                    ht1_buf, in_sems.at[1, 0]),
                pltpu.make_async_copy(
                    dy_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h)],
                    dy0_buf, in_sems.at[2, 0]),
                pltpu.make_async_copy(
                    dy_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h, h)],
                    dy1_buf, in_sems.at[3, 0]),
            ]

        def dmas_out(slot, ci):
            return [
                pltpu.make_async_copy(
                    dg0_buf.at[slot],
                    dgx_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h)],
                    out_sems.at[0, slot]),
                pltpu.make_async_copy(
                    dg1_buf.at[slot],
                    dgx_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h, h)],
                    out_sems.at[1, slot]),
            ]

        dh_scr[:] = jnp.zeros((2, b, h), jnp.float32)

        def chunk_body(ci, _):
            slot = ci % 2
            for d in small_in(ci):
                d.start()
            for d in small_in(ci):
                d.wait()

            @pl.when(ci >= 2)
            def _():
                for d in dmas_out(slot, ci - 2):
                    d.wait()

            # parallel pre-pass: the tanh jacobian (1 - y^2) and the dy
            # planes are carry-free; store them in STEP order so the
            # serial loop is one add, one multiply, and the dot
            h2a = jnp.stack([ht0_buf[:], ht1_buf[:]]).astype(jnp.float32)
            pre = jnp.concatenate([
                1.0 - h2a * h2a,
                jnp.stack([dy0_buf[:], dy1_buf[:]]).astype(jnp.float32),
            ], axis=-1)  # (2, c, b, 2h)
            for j in range(chunk):  # static unroll: dir0 rows reversed
                pre_buf[j, 0] = pre[0, chunk - 1 - j]
                pre_buf[j, 1] = pre[1, j]

            def step(k, dh):
                r_ = chunk - 1 - k
                pk = pre_buf[k]  # (2, b, 2h)
                dpre = (pk[..., h:] + dh) * pk[..., :h]
                dg0_buf[slot, r_] = dpre[0].astype(sd)
                dg1_buf[slot, k] = dpre[1].astype(sd)
                dd = w_ref.dtype
                return jax.lax.dot_general(
                    dpre.astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            dh_scr[:] = jax.lax.fori_loop(0, chunk, step, dh_scr[:])
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


def _fwd_pallas(gx, w_hh, chunk, interpret, with_guard):
    t, b, h2 = gx.shape
    h = h2 // 2
    sd = gx.dtype
    kernel = _make_fwd_kernel(chunk, t, b, h, sd, with_guard)
    rows = t + 2 if with_guard else t
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, b, 2 * h), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM((1, b, 2 * h), sd),
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh.astype(gx.dtype))


def _bwd_pallas(w_hh, ys_store, dy, chunk, interpret):
    tp2, b, h2 = ys_store.shape
    t = tp2 - 2
    h = h2 // 2
    sd = ys_store.dtype
    kernel = _make_bwd_kernel(chunk, t, b, h, sd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, b, 2 * h), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM((chunk, 2, b, 2 * h), jnp.float32),  # pre-pass
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(w_hh.astype(sd), ys_store, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rnn_scan_v2(gx, w_hh, chunk: int, interpret: bool | None = None):
    ys, _ = _fwd_impl(gx, w_hh, chunk, interpret)
    return ys


def _fwd_impl(gx, w_hh, chunk, interpret):
    interp = _auto_interpret(interpret)
    ys_store = _fwd_pallas(gx, w_hh, chunk, interp, with_guard=True)
    return ys_store, (w_hh, ys_store)


def _fwd_rule(gx, w_hh, chunk, interpret):
    return _fwd_impl(gx, w_hh, chunk, interpret)


def _bwd_rule(chunk, interpret, res, dys):
    w_hh, ys_store = res
    interp = _auto_interpret(interpret)
    t = ys_store.shape[0] - 2
    h = w_hh.shape[1]
    sd = ys_store.dtype
    dy = dys[1:t + 1].astype(sd)
    dgx = _bwd_pallas(w_hh, ys_store, dy, chunk, interp)
    dw_f = jnp.einsum("tbh,tbg->hg", ys_store[0:t, :, :h], dgx[..., :h],
                      preferred_element_type=jnp.float32)
    dw_b = jnp.einsum("tbh,tbg->hg", ys_store[2:t + 2, :, h:], dgx[..., h:],
                      preferred_element_type=jnp.float32)
    return dgx, jnp.stack([dw_f, dw_b]).astype(w_hh.dtype)


rnn_scan_v2.defvjp(_fwd_rule, _bwd_rule)


def _pick_chunk(t: int, b: int, h: int, sd_bytes: int,
                budget: int = 13 * 1024 * 1024) -> int:
    w_bytes = 2 * h * h * sd_bytes
    carries = 2 * 2 * b * h * 4
    # divisibility NOT required: the wrapper zero-pads gx (gru_pallas_v2)
    for c in (8, 4, 2, 1):
        bufs = (2 * 2 * c * b * h * 2 + 4 * c * b * h) * sd_bytes
        if bufs + w_bytes + carries <= budget:
            return c
    return 0


def rnn_bidir_v2(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, H)
    w_hh: jnp.ndarray,  # (2, H, H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    train: bool = True,
) -> jnp.ndarray:
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
    ).reshape(tp, b, 2 * h)
    if train:
        ys_store = rnn_scan_v2(gx, w_hh.astype(jnp.float32), chunk, interpret)
        return ys_store[1:t + 1].astype(jnp.float32)
    interp = _auto_interpret(interpret)
    ys = _fwd_pallas(gx, w_hh.astype(jnp.float32), chunk, interp,
                     with_guard=False)
    return ys[:t].astype(jnp.float32)


def rnn_v2_ok(t: int, b: int, h: int, compute_dtype) -> bool:
    # v2 buffers are per-direction: the sublane dim is b (not the v1
    # stacked 2B), so the bf16 min-tile check must see b itself
    sd = stream_dtype_for(compute_dtype, b)
    # any t: the wrapper zero-pads gx to a chunk multiple (gru_pallas_v2)
    return (t >= 1 and h % 128 == 0 and (2 * b) % 8 == 0
            and _pick_chunk(t, b, h, jnp.dtype(sd).itemsize) > 0)
