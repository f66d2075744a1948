"""Fused Pallas GRU scan kernel (bidirectional, bias-free, eval path).

Same streaming design as the LSTM kernel (ops/lstm_pallas.py) with the GRU
cell (torch gate order r, z, n — ``models.rnn._gru_step`` semantics, used by
the 863 recipes with ``rnn_type=nn.GRU``): gx (T, 2B, 3H) streams through
double-buffered VMEM chunks, the recurrent weights and h stay resident, one
MXU matmul per direction per step.

Training keeps the autodiffable scan (GRU is not the flagship hot path);
forward parity is tested in interpret mode and the kernel obeys the same
Mosaic tiling limits (H % 128, 2B % 8) as the LSTM kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.lstm_pallas import _auto_interpret, auto_chunk


def _gru_cell(gx_row, hs, wf_ref, wb_ref, b: int, h: int):
    dd = wf_ref.dtype
    hh_f = jnp.dot(hs[:b].astype(dd), wf_ref[:],
                   preferred_element_type=jnp.float32)
    hh_b = jnp.dot(hs[b:].astype(dd), wb_ref[:],
                   preferred_element_type=jnp.float32)
    hh = jnp.concatenate([hh_f, hh_b], axis=0)
    gx_row = gx_row.astype(jnp.float32)
    r = jax.nn.sigmoid(gx_row[:, :h] + hh[:, :h])
    z = jax.nn.sigmoid(gx_row[:, h:2 * h] + hh[:, h:2 * h])
    n = jnp.tanh(gx_row[:, 2 * h:] + r * hh[:, 2 * h:])
    return (1.0 - z) * n + z * hs


def _make_kernel(chunk: int, t_max: int, b2: int, h: int,
                 sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(gx_hbm, wf_ref, wb_ref, out_hbm, gx_buf, out_buf, h_scr,
               in_sems, out_sems):
        def in_dma(slot, idx):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(idx * chunk, chunk)], gx_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, idx):
            return pltpu.make_async_copy(
                out_buf.at[slot], out_hbm.at[pl.ds(idx * chunk, chunk)],
                out_sems.at[slot],
            )

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
                hs = _gru_cell(gx_buf[slot, k], hs, wf_ref, wb_ref, b, h)
                out_buf[slot, k] = hs.astype(sd)
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


def gru_scan_pallas(
    gx: jnp.ndarray,  # (T, 2B, 3H)
    w_hh: jnp.ndarray,  # (2, H, 3H)
    chunk: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    interpret = _auto_interpret(interpret)
    t_max, b2, h3 = gx.shape
    h = h3 // 3
    sd = gx.dtype if gx.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    if chunk is None:
        w_bytes = 2 * h * h3 * w_hh.dtype.itemsize
        chunk = auto_chunk(b2, h, 4, weights_bytes=w_bytes,
                           elem_bytes=jnp.dtype(sd).itemsize)  # gx 3H + out 1H
    if t_max % chunk != 0:
        pad = chunk - t_max % chunk
        gx = jnp.pad(gx, ((0, pad), (0, 0), (0, 0)))
        t_pad = t_max + pad
    else:
        t_pad = t_max
    kernel = _make_kernel(chunk, t_pad, b2, h, sd=sd)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, b2, h), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b2, h3), sd),
            pltpu.VMEM((2, chunk, b2, h), sd),
            pltpu.VMEM((b2, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx.astype(sd), w_hh[0].astype(jnp.float32),
      w_hh[1].astype(jnp.float32))
    return out[:t_max]


def gru_bidir_pallas(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, 3H)
    w_hh: jnp.ndarray,  # (2, H, 3H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(T, B, F) -> (T, B, 2H), matching ``_scan_bidir_fused`` for GRU."""
    t, b, _ = x.shape
    h = w_hh.shape[1]
    from ctc_pytorch_tpu.ops.lstm_pallas import stream_dtype_for

    sd = stream_dtype_for(compute_dtype, 2 * b)
    xr = jnp.flip(x, axis=0)
    x2 = jnp.stack([x, xr]).reshape(2, t * b, -1).astype(compute_dtype)
    gx = jax.lax.dot_general(
        x2, w_ih.astype(compute_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=sd,
    ).reshape(2, t, b, 3 * h)
    gx = jnp.concatenate([gx[0], gx[1]], axis=1)
    ys = gru_scan_pallas(gx, w_hh, chunk=chunk, interpret=interpret)
    fwd = ys[:, :b]
    bwd = jnp.flip(ys[:, b:], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1).astype(jnp.float32)
