"""Trainable fused Pallas GRU: forward + hand-derived backward kernels.

Completes the cuDNN-replacement story for the 863 flagship (CNN+GRU,
``my_863_corpus/steps/model.py:168-234``): the same residual strategy as
the LSTM train kernel (ops/lstm_pallas_train.py) adapted to the GRU cell
(torch gate order r, z, n — ``models.rnn._gru_step`` semantics):

- **forward** streams gx (T, 2B, 3H) chunks HBM->VMEM and emits only the
  hidden states ``ys`` — the GRU has no cell state, so ys IS the full
  residual set (gates recompute from gx + h_prev in the backward);
- **backward** walks time in reverse carrying dh, recomputes
  ``hh = h_prev @ W_hh`` (one MXU matmul per direction per step, same cost
  as the forward), reforms r/z/n, and emits a 4-plane gradient row
  ``[dpre_r, dpre_z, dpre_n, dhh_n]`` where

      dz     = dh * (h_prev - n)          dn  = dh * (1 - z)
      dpre_n = dn * (1 - n^2)             dr  = dpre_n * hh_n
      dpre_r = dr * r * (1 - r)           dpre_z = dz * z * (1 - z)
      dhh_n  = dpre_n * r                 (the n-gate sees r * hh_n)
      dh_prev = [dpre_r, dpre_z, dhh_n] @ W^T + dh * z

  The first three planes are d gx; ``dW_hh`` is one big XLA matmul of the
  shifted ys against ``[dpre_r, dpre_z, dhh_n]`` outside the kernel, and
  ``dW_ih``/``dx`` fall out of d gx exactly as in the LSTM wrapper.

Gradient check: tests/test_gru_pallas_train.py vs autodiff of
``models.rnn._scan_bidir_fused`` in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.gru_pallas import _gru_cell
from ctc_pytorch_tpu.ops.lstm_pallas import _auto_interpret, auto_chunk, pad_t


# ---------------------------------------------------------------------------
# forward kernel: identical streaming skeleton to gru_pallas, factored here
# so the train path controls its own chunking
# ---------------------------------------------------------------------------

def _make_fwd_kernel(chunk: int, t_max: int, b2: int, h: int,
                     sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(gx_hbm, wf_ref, wb_ref, ys_hbm, gx_buf, y_buf, h_scr,
               in_sems, out_sems):
        def in_dma(slot, idx):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(idx * chunk, chunk)], gx_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, idx):
            return pltpu.make_async_copy(
                y_buf.at[slot], ys_hbm.at[pl.ds(idx * chunk, chunk)],
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


# ---------------------------------------------------------------------------
# backward kernel (emits [dgx | dhh_n]; dW_hh assembled outside)
# ---------------------------------------------------------------------------

def _make_bwd_kernel(chunk: int, t_max: int, b2: int, h: int,
                     sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(gx_hbm, wf_ref, wb_ref, ysprev_hbm, dy_hbm, dout_hbm,
               gx_buf, yprev_buf, dy_buf, dout_buf, dh_scr, sems, out_sems):
        # gx double-buffered (sems 0-1); the two small streams are
        # single-buffered (sems 2-3), as in the LSTM backward
        def gx_dma(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(ci * chunk, chunk)], gx_buf.at[slot],
                sems.at[slot])

        def small_dmas(ci):
            t0 = ci * chunk
            return [
                pltpu.make_async_copy(
                    ysprev_hbm.at[pl.ds(t0, chunk)], yprev_buf, sems.at[2]),
                pltpu.make_async_copy(
                    dy_hbm.at[pl.ds(t0, chunk)], dy_buf, sems.at[3]),
            ]

        def out_dma(slot, ci):
            return pltpu.make_async_copy(
                dout_buf.at[slot], dout_hbm.at[pl.ds(ci * chunk, chunk)],
                out_sems.at[slot],
            )

        dh_scr[:] = jnp.zeros((b2, h), jnp.float32)
        gx_dma((n_chunks - 1) % 2, n_chunks - 1).start()

        def chunk_body(rci, _):
            ci = n_chunks - 1 - rci
            slot = ci % 2
            nxt_ci = ci - 1

            for d in small_dmas(ci):
                d.start()

            @pl.when(nxt_ci >= 0)
            def _():
                gx_dma(nxt_ci % 2, nxt_ci).start()

            gx_dma(slot, ci).wait()
            for d in small_dmas(ci):
                d.wait()

            @pl.when(rci >= 2)
            def _():
                out_dma(slot, ci + 2).wait()

            def step(kk, dh):
                k = chunk - 1 - kk  # reverse within chunk
                h_prev = yprev_buf[k].astype(jnp.float32)
                dd = wf_ref.dtype
                hh_f = jnp.dot(h_prev[:b].astype(dd), wf_ref[:],
                               preferred_element_type=jnp.float32)
                hh_b = jnp.dot(h_prev[b:].astype(dd), wb_ref[:],
                               preferred_element_type=jnp.float32)
                hh = jnp.concatenate([hh_f, hh_b], axis=0)
                gx_row = gx_buf[slot, k].astype(jnp.float32)
                r = jax.nn.sigmoid(gx_row[:, :h] + hh[:, :h])
                z = jax.nn.sigmoid(gx_row[:, h:2 * h] + hh[:, h:2 * h])
                hh_n = hh[:, 2 * h:]
                n = jnp.tanh(gx_row[:, 2 * h:] + r * hh_n)

                dh_t = dy_buf[k].astype(jnp.float32) + dh
                dz = dh_t * (h_prev - n)
                dn = dh_t * (1.0 - z)
                dpre_n = dn * (1.0 - n * n)
                dr = dpre_n * hh_n
                dpre_r = dr * r * (1.0 - r)
                dpre_z = dz * z * (1.0 - z)
                dhh_n = dpre_n * r
                dout_buf[slot, k] = jnp.concatenate(
                    [dpre_r, dpre_z, dpre_n, dhh_n], axis=1
                ).astype(sd)  # (2B, 4H): first 3 planes = d gx, last = d hh_n
                # dh_{t-1} = [dpre_r, dpre_z, dhh_n] @ W^T + dh_t * z
                dhh = jnp.concatenate([dpre_r, dpre_z, dhh_n], axis=1)
                dh_f = jax.lax.dot_general(
                    dhh[:b].astype(dd), wf_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dh_b = jax.lax.dot_general(
                    dhh[b:].astype(dd), wb_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return jnp.concatenate([dh_f, dh_b], axis=0) + dh_t * z

            dh_scr[:] = jax.lax.fori_loop(0, chunk, step, dh_scr[:])
            out_dma(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            out_dma(1, 1).wait()

        out_dma(0, 0).wait()

    return kernel


# ---------------------------------------------------------------------------
# wrappers + custom VJP
# ---------------------------------------------------------------------------


def _fwd_pallas(gx, w_hh, chunk, interpret):
    t_pad, b2, h3 = gx.shape
    h = h3 // 3
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
            pltpu.VMEM((2, chunk, b2, h3), sd),
            pltpu.VMEM((2, chunk, b2, h), sd),
            pltpu.VMEM((b2, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh[0], w_hh[1])


def _bwd_pallas(gx, w_hh, ys_prev, dy, chunk, interpret):
    t_pad, b2, h3 = gx.shape
    h = h3 // 3
    sd = gx.dtype
    kernel = _make_bwd_kernel(chunk, t_pad, b2, h, sd=sd)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, b2, 4 * h), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wb
            pl.BlockSpec(memory_space=pl.ANY),  # ys_prev
            pl.BlockSpec(memory_space=pl.ANY),  # dy
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b2, h3), sd),  # gx (double)
            pltpu.VMEM((chunk, b2, h), sd),  # y_prev (single)
            pltpu.VMEM((chunk, b2, h), sd),  # dy (single)
            pltpu.VMEM((2, chunk, b2, 4 * h), sd),  # out (double)
            pltpu.VMEM((b2, h), jnp.float32),  # dh carry
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh[0], w_hh[1], ys_prev, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gru_scan_train(gx, w_hh, fwd_chunk: int = 4, bwd_chunk: int = 2,
                   interpret: bool | None = None):
    ys, _ = _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret)
    return ys


def _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret):
    interp = _auto_interpret(interpret)
    gx_p, t = pad_t(gx, fwd_chunk)
    ys = _fwd_pallas(gx_p, w_hh, fwd_chunk, interp)
    return ys[:t], (gx_p, w_hh, ys, t)


def _fwd_rule(gx, w_hh, fwd_chunk, bwd_chunk, interpret):
    ys, res = _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret)
    return ys, res


def _bwd_rule(fwd_chunk, bwd_chunk, interpret, res, dy):
    gx_p, w_hh, ys, t = res
    interp = _auto_interpret(interpret)
    sd = gx_p.dtype
    t_fwd = gx_p.shape[0]
    b2 = gx_p.shape[1]
    h = w_hh.shape[1]
    pad_b = (-t_fwd) % bwd_chunk
    t_pad = t_fwd + pad_b
    zeros1 = jnp.zeros((1, b2, h), sd)
    ys_prev = jnp.concatenate([zeros1, ys[:-1]], axis=0)  # row t = h_{t-1}
    if pad_b:
        gx_p = jnp.pad(gx_p, ((0, pad_b), (0, 0), (0, 0)))
        ys_prev = jnp.pad(ys_prev, ((0, pad_b), (0, 0), (0, 0)))
    dy_p = jnp.zeros((t_pad, b2, h), sd).at[:t].set(dy.astype(sd))
    dout = _bwd_pallas(gx_p, w_hh, ys_prev, dy_p, bwd_chunk, interp)
    dgx = dout[:t_fwd, :, : 3 * h]
    # dW_hh[d] = sum_t h_prev[t]^T [dpre_r, dpre_z, dhh_n][t]
    dhh = jnp.concatenate(
        [dout[:t_fwd, :, : 2 * h], dout[:t_fwd, :, 3 * h:]], axis=2
    )
    b = b2 // 2
    hp = ys_prev[:t_fwd]
    dw_f = jnp.einsum("tbh,tbg->hg", hp[:, :b], dhh[:, :b],
                      preferred_element_type=jnp.float32)
    dw_b = jnp.einsum("tbh,tbg->hg", hp[:, b:], dhh[:, b:],
                      preferred_element_type=jnp.float32)
    return dgx[:t], jnp.stack([dw_f, dw_b]).astype(w_hh.dtype)


gru_scan_train.defvjp(_fwd_rule, _bwd_rule)


def _gru_bwd_auto_chunk(b2, h, w_bytes, budget=13 * 1024 * 1024,
                        elem_bytes=4):
    """gx (3H) + out (4H) double-buffered, two single-buffered H streams.
    Returns 0 when even chunk=1 would overflow VMEM (callers gate via
    gru_train_ok and fall back to the scan path)."""
    carries = 2 * b2 * h * 4
    for c in (8, 4, 2, 1):
        bytes_ = (2 * c * b2 * 7 * h + 2 * c * b2 * h) * elem_bytes
        if bytes_ + w_bytes + carries <= budget:
            return c
    return 0


def gru_train_ok(b: int, h: int, compute_dtype) -> bool:
    """Whether the trainable GRU kernel's backward fits VMEM at this shape."""
    from ctc_pytorch_tpu.ops.lstm_pallas import stream_dtype_for

    sd_bytes = jnp.dtype(stream_dtype_for(compute_dtype, 2 * b)).itemsize
    w_bytes = 2 * h * 3 * h * 4
    return _gru_bwd_auto_chunk(2 * b, h, w_bytes, elem_bytes=sd_bytes) >= 1


def gru_bidir_train(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, 3H)
    w_hh: jnp.ndarray,  # (2, H, 3H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Trainable bidirectional GRU layer, same semantics as
    ``models.rnn._scan_bidir_fused`` (full-padded-length reversal)."""
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
    gx = jnp.concatenate([gx[0], gx[1]], axis=1)  # (T, 2B, 3H)
    w_bytes = 2 * h * 3 * h * 4
    sd_bytes = jnp.dtype(sd).itemsize
    if chunk is None:
        fwd_chunk = auto_chunk(2 * b, h, 4, weights_bytes=w_bytes,
                               elem_bytes=sd_bytes)
        bwd_chunk = _gru_bwd_auto_chunk(2 * b, h, w_bytes,
                                        elem_bytes=sd_bytes)
        if bwd_chunk == 0:
            raise ValueError(
                f"gru_bidir_train backward does not fit VMEM at B={b}, "
                f"H={h}; use the scan path"
            )
    else:
        fwd_chunk, bwd_chunk = chunk, max(chunk // 2, 1)
    ys = gru_scan_train(
        gx, w_hh.astype(jnp.float32), fwd_chunk, bwd_chunk, interpret
    )
    fwd = ys[:, :b]
    bwd = jnp.flip(ys[:, b:], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1).astype(jnp.float32)
