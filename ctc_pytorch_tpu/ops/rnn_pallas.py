"""Fused Pallas vanilla-RNN (tanh) kernels: eval forward + trainable VJP.

Completes the cuDNN-replacement matrix (SURVEY.md §2.2: ``nn.RNN`` is the
third cell the reference's config can select, ``timit/models/model_ctc.py:26``)
with the same streaming skeleton as the LSTM/GRU kernels:

- the cell is ``h_t = tanh(gx_t + h_{t-1} @ W_hh)`` per direction, both
  directions stacked on the batch axis (2B rows, one fused dot per step);
- **forward** streams gx (T, 2B, H) HBM->VMEM double-buffered and emits the
  hidden states ``ys`` (the complete residual set);
- **backward** walks time in reverse carrying ``dh``:

      dpre     = (dy_t + dh) * (1 - h_t^2)        (= d gx_t)
      dh_{t-1} = dpre @ W_hh^T

  ``dW_hh = sum_t h_{t-1}^T dpre`` is one large XLA matmul outside the
  kernel, and dW_ih/dx fall out of d gx exactly as in the LSTM wrapper.

Streams follow the bf16 policy of ops/lstm_pallas.stream_dtype_for.
Gradient check: tests/test_rnn_pallas.py vs autodiff of
``models.rnn._scan_bidir_fused`` (interpret mode + compiled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.lstm_pallas import (
    _auto_interpret,
    auto_chunk,
    pad_t,
    stream_dtype_for,
)


def _rnn_cell(gx_row, hs, wf_ref, wb_ref, b: int):
    dd = wf_ref.dtype
    hh_f = jnp.dot(hs[:b].astype(dd), wf_ref[:],
                   preferred_element_type=jnp.float32)
    hh_b = jnp.dot(hs[b:].astype(dd), wb_ref[:],
                   preferred_element_type=jnp.float32)
    hh = jnp.concatenate([hh_f, hh_b], axis=0)
    return jnp.tanh(gx_row.astype(jnp.float32) + hh)


def _make_fwd_kernel(chunk: int, t_max: int, b2: int, h: int,
                     sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(gx_hbm, wf_ref, wb_ref, ys_hbm, gx_buf, y_buf, h_scr,
               in_sems, out_sems):
        def in_dma(slot, idx):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(idx * chunk, chunk)], gx_buf.at[slot],
                in_sems.at[slot])

        def out_dma(slot, idx):
            return pltpu.make_async_copy(
                y_buf.at[slot], ys_hbm.at[pl.ds(idx * chunk, chunk)],
                out_sems.at[slot])

        h_scr[:] = jnp.zeros((b2, h), jnp.float32)
        in_dma(0, 0).start()

        def chunk_body(ci, _):
            slot = ci % 2
            nxt = (ci + 1) % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                in_dma(nxt, ci + 1).start()

            in_dma(slot, ci).wait()

            @pl.when(ci >= 2)
            def _():
                out_dma(slot, ci - 2).wait()

            def step(k, hs):
                hs = _rnn_cell(gx_buf[slot, k], hs, wf_ref, wb_ref, b)
                y_buf[slot, k] = hs.astype(sd)
                return hs

            h_scr[:] = jax.lax.fori_loop(0, chunk, step, h_scr[:])
            out_dma(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    return kernel


def _make_bwd_kernel(chunk: int, t_max: int, b2: int, h: int,
                     sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(ys_hbm, wf_ref, wb_ref, dy_hbm, dgx_hbm,
               y_buf, dy_buf, dgx_buf, dh_scr, sems, out_sems):
        def y_dma(ci):
            return pltpu.make_async_copy(
                ys_hbm.at[pl.ds(ci * chunk, chunk)], y_buf, sems.at[2])

        def dy_dma(ci):
            return pltpu.make_async_copy(
                dy_hbm.at[pl.ds(ci * chunk, chunk)], dy_buf, sems.at[3])

        def out_dma(slot, ci):
            return pltpu.make_async_copy(
                dgx_buf.at[slot], dgx_hbm.at[pl.ds(ci * chunk, chunk)],
                out_sems.at[slot])

        dh_scr[:] = jnp.zeros((b2, h), jnp.float32)

        def chunk_body(rci, _):
            ci = n_chunks - 1 - rci
            slot = ci % 2
            y_dma(ci).start()
            dy_dma(ci).start()
            y_dma(ci).wait()
            dy_dma(ci).wait()

            @pl.when(rci >= 2)
            def _():
                out_dma(slot, ci + 2).wait()

            def step(kk, dh):
                k = chunk - 1 - kk
                h_t = y_buf[k].astype(jnp.float32)
                dpre = (dy_buf[k].astype(jnp.float32) + dh) * (1.0 - h_t * h_t)
                dgx_buf[slot, k] = dpre.astype(sd)
                dd = wf_ref.dtype
                dh_f = jax.lax.dot_general(
                    dpre[:b].astype(dd), wf_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dh_b = jax.lax.dot_general(
                    dpre[b:].astype(dd), wb_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return jnp.concatenate([dh_f, dh_b], axis=0)

            dh_scr[:] = jax.lax.fori_loop(0, chunk, step, dh_scr[:])
            out_dma(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            out_dma(1, 1).wait()

        out_dma(0, 0).wait()

    return kernel



def _fwd_pallas(gx, w_hh, chunk, interpret):
    t_pad, b2, h = gx.shape
    sd = gx.dtype
    kernel = _make_fwd_kernel(chunk, t_pad, b2, h, sd=sd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, b2, h), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b2, h), sd),
            pltpu.VMEM((2, chunk, b2, h), sd),
            pltpu.VMEM((b2, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh[0], w_hh[1])


def _bwd_pallas(ys, w_hh, dy, chunk, interpret):
    t_pad, b2, h = ys.shape
    sd = ys.dtype
    kernel = _make_bwd_kernel(chunk, t_pad, b2, h, sd=sd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, b2, h), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ys
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # dy
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((chunk, b2, h), sd),  # ys (single)
            pltpu.VMEM((chunk, b2, h), sd),  # dy (single)
            pltpu.VMEM((2, chunk, b2, h), sd),  # dgx (double)
            pltpu.VMEM((b2, h), jnp.float32),  # dh carry
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ys, w_hh[0], w_hh[1], dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def rnn_scan_train(gx, w_hh, fwd_chunk: int = 8, bwd_chunk: int = 8,
                   interpret: bool | None = None):
    ys, _ = _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret)
    return ys


def _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret):
    interp = _auto_interpret(interpret)
    gx_p, t = pad_t(gx, fwd_chunk)
    ys = _fwd_pallas(gx_p, w_hh, fwd_chunk, interp)
    return ys[:t], (w_hh, ys, t)


def _fwd_rule(gx, w_hh, fwd_chunk, bwd_chunk, interpret):
    ys, res = _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret)
    return ys, res


def _bwd_rule(fwd_chunk, bwd_chunk, interpret, res, dy):
    w_hh, ys, t = res
    interp = _auto_interpret(interpret)
    sd = ys.dtype
    t_fwd = ys.shape[0]
    b2 = ys.shape[1]
    h = w_hh.shape[1]
    pad_b = (-t_fwd) % bwd_chunk
    t_pad = t_fwd + pad_b
    ys_p = jnp.pad(ys, ((0, pad_b), (0, 0), (0, 0))) if pad_b else ys
    dy_p = jnp.zeros((t_pad, b2, h), sd).at[:t].set(dy.astype(sd))
    dgx = _bwd_pallas(ys_p, w_hh, dy_p, bwd_chunk, interp)[:t_fwd]
    # dW_hh[d] = sum_t h_{t-1}^T dpre_t (one big XLA matmul per direction)
    zeros1 = jnp.zeros((1, b2, h), sd)
    hp = jnp.concatenate([zeros1, ys[:-1]], axis=0)
    b = b2 // 2
    dw_f = jnp.einsum("tbh,tbg->hg", hp[:, :b], dgx[:, :b],
                      preferred_element_type=jnp.float32)
    dw_b = jnp.einsum("tbh,tbg->hg", hp[:, b:], dgx[:, b:],
                      preferred_element_type=jnp.float32)
    return dgx[:t], jnp.stack([dw_f, dw_b]).astype(w_hh.dtype)


rnn_scan_train.defvjp(_fwd_rule, _bwd_rule)


def rnn_bidir_pallas(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, H)
    w_hh: jnp.ndarray,  # (2, H, H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    train: bool = False,
) -> jnp.ndarray:
    """Trainable bidirectional tanh-RNN layer, same semantics as
    ``models.rnn._scan_bidir_fused`` (full-padded-length reversal).

    One entry point for eval and training: the forward kernel is shared
    and the custom VJP only changes what autodiff records.
    """
    t, b, _ = x.shape
    h = w_hh.shape[1]
    sd = stream_dtype_for(compute_dtype, 2 * b)
    xr = jnp.flip(x, axis=0)
    x2 = jnp.stack([x, xr]).reshape(2, t * b, -1).astype(compute_dtype)
    gx = jax.lax.dot_general(
        x2, w_ih.astype(compute_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=sd,
    ).reshape(2, t, b, h)
    gx = jnp.concatenate([gx[0], gx[1]], axis=1)  # (T, 2B, H)
    w_bytes = 2 * h * h * 4
    sd_bytes = jnp.dtype(sd).itemsize
    if chunk is None:
        # fwd: gx 1H + ys 1H double-buffered; bwd: ys+dy+dgx(double) = 4H
        chunk = auto_chunk(2 * b, h, 2, weights_bytes=w_bytes,
                           elem_bytes=sd_bytes)
    ys = rnn_scan_train(gx, w_hh.astype(jnp.float32), chunk, chunk, interpret)
    fwd = ys[:, :b]
    bwd = jnp.flip(ys[:, b:], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1).astype(jnp.float32)
