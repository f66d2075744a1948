"""Fused Pallas LSTM scan kernel (bidirectional, bias-free).

The recurrence is the TPU bottleneck of this model family (SURVEY.md §7
"hard parts"): T sequential steps of small matmuls.  XLA's ``lax.scan``
executes each step as a while-loop iteration with HBM round-trips between
the matmul and the gate nonlinearities; this kernel instead runs the WHOLE
time loop inside one Pallas program:

- ``gx`` (the hoisted input projection, (T, 2B, 4H) with both directions
  stacked on the batch axis) streams HBM -> VMEM in double-buffered chunks;
- the recurrent weights (2, H, 4H) and the (h, c) state live in VMEM for
  the entire scan; each step is one MXU matmul per direction plus fused
  VPU gate math — nothing leaves the chip until the outputs stream back;
- outputs (T, 2B, H) stream VMEM -> HBM from the same chunk buffers.

VMEM budget at the flagship shape (B=64, H=384, chunk=4): gx double-buffer
6.3 MB + out 1.6 MB + weights 4.7 MB + state 0.4 MB ≈ 13 MB < 16 MB (the
earlier block-diagonal-weights variant OOMed scoped vmem at 33 MB).

Forward-only (inference/eval path); ops/lstm_pallas_train.py adds the
custom-VJP training variant.  ``lstm_bidir_pallas`` matches
``models.rnn._scan_bidir_fused`` numerically (tests/test_lstm_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _auto_interpret(interpret):
    """None -> interpreter mode automatically when not running on TPU."""
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


VMEM_BUDGET = 14 * 1024 * 1024  # leave ~2 MB slack under the 16 MB limit


def auto_chunk(b2: int, h: int, stream_h_units: int, budget: int = VMEM_BUDGET,
               weights_bytes: int = 0, candidates=(8, 4, 2, 1),
               elem_bytes: int = 4) -> int:
    """Largest chunk whose double-buffered streams + weights fit VMEM.

    ``stream_h_units``: total per-timestep stream width in units of H
    (e.g. eval kernel: gx 4H + out 1H = 5; train fwd: 4+1+1 = 6;
    train bwd: gx 4 + dgx 4 + 4 small streams = 12).
    ``elem_bytes``: stream element size (2 for bf16 streams).
    """
    state_bytes = 4 * b2 * h * 4  # h/c or dh/dc carries (fp32, generous)
    for c in candidates:
        stream = 2 * c * b2 * h * stream_h_units * elem_bytes
        if stream + weights_bytes + state_bytes <= budget:
            return c
    return 1


def _lstm_cell(gx_row, hs, cs, wf_ref, wb_ref, b: int, h: int):
    """One step for both directions stacked on the batch axis (2B, ·).

    The recurrent dots run in the weights' dtype (bf16 on the production
    path — native MXU rate) with fp32 accumulation; state stays fp32.
    ``gx_row`` may be a bf16 stream — gate math happens in fp32 VREGs.
    """
    dd = wf_ref.dtype
    hh_f = jnp.dot(hs[:b].astype(dd), wf_ref[:],
                   preferred_element_type=jnp.float32)
    hh_b = jnp.dot(hs[b:].astype(dd), wb_ref[:],
                   preferred_element_type=jnp.float32)
    gates = gx_row.astype(jnp.float32) + jnp.concatenate([hh_f, hh_b], axis=0)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    cs = jax.nn.sigmoid(f) * cs + jax.nn.sigmoid(i) * jnp.tanh(g)
    hs = jax.nn.sigmoid(o) * jnp.tanh(cs)
    return hs, cs, gates


def stream_dtype_for(compute_dtype, b2: int):
    """HBM stream dtype for the gx/ys/cs planes.

    bf16 streams halve the kernels' HBM traffic (the dominant cost at
    flagship shapes).  Mosaic's bf16 min tile is (16, 128) on the
    (sublane, lane) axes, so bf16 requires the stacked batch to tile to
    16; smaller shapes (unit tests) keep exact fp32.
    """
    if jnp.dtype(compute_dtype) == jnp.bfloat16 and b2 % 16 == 0:
        return jnp.bfloat16
    return jnp.float32


def pad_t(x, chunk):
    """Zero-pad the time axis to a multiple of ``chunk``; returns (padded,
    original T).  Shared by every kernel wrapper that grids over T-chunks."""
    t = x.shape[0]
    pad = (-t) % chunk
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, t


def _make_kernel(chunk: int, t_max: int, b2: int, h: int,
                 sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(gx_hbm, wf_ref, wb_ref, out_hbm, gx_buf, out_buf, h_scr,
               c_scr, in_sems, out_sems):
        def in_dma(slot, idx):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(idx * chunk, chunk)],
                gx_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, idx):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                out_hbm.at[pl.ds(idx * chunk, chunk)],
                out_sems.at[slot],
            )

        h_scr[:] = jnp.zeros((b2, h), jnp.float32)
        c_scr[:] = jnp.zeros((b2, h), jnp.float32)
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

            def step(k, carry):
                hs, cs = carry
                hs, cs, _ = _lstm_cell(
                    gx_buf[slot, k], hs, cs, wf_ref, wb_ref, b, h
                )
                out_buf[slot, k] = hs.astype(sd)
                return hs, cs

            hs, cs = jax.lax.fori_loop(
                0, chunk, step, (h_scr[:], c_scr[:])
            )
            h_scr[:] = hs
            c_scr[:] = cs
            out_dma(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())
        # drain the last two output DMAs
        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    return kernel


def lstm_scan_pallas(
    gx: jnp.ndarray,  # (T, 2B, 4H) fp32: input projections, dirs on batch
    w_hh: jnp.ndarray,  # (2, H, 4H); its dtype sets the MXU dot dtype
    chunk: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run the fused LSTM time loop; returns hidden states (T, 2B, H).

    The stream dtype follows ``gx.dtype`` (bf16 streams halve HBM traffic;
    pass fp32 gx for exact unit-test numerics).
    """
    interpret = _auto_interpret(interpret)
    t_max, b2, h4 = gx.shape
    h = h4 // 4
    sd = gx.dtype if gx.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    if chunk is None:
        w_bytes = 2 * h * h4 * w_hh.dtype.itemsize
        chunk = auto_chunk(b2, h, 5, weights_bytes=w_bytes,
                           elem_bytes=jnp.dtype(sd).itemsize)
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
            pl.BlockSpec(memory_space=pl.ANY),  # gx stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b2, h * 4), sd),  # gx double buf
            pltpu.VMEM((2, chunk, b2, h), sd),  # out double buf
            pltpu.VMEM((b2, h), jnp.float32),  # h
            pltpu.VMEM((b2, h), jnp.float32),  # c
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx.astype(sd), w_hh[0], w_hh[1])
    return out[:t_max]


def lstm_bidir_pallas(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, 4H)
    w_hh: jnp.ndarray,  # (2, H, 4H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Full bidirectional layer: (T, B, F) -> (T, B, 2H), matching
    ``models.rnn._scan_bidir_fused`` full-padded-length semantics."""
    t, b, _ = x.shape
    h = w_hh.shape[1]
    sd = stream_dtype_for(compute_dtype, 2 * b)
    xr = jnp.flip(x, axis=0)
    x2 = jnp.stack([x, xr]).reshape(2, t * b, -1).astype(compute_dtype)
    gx = jax.lax.dot_general(
        x2, w_ih.astype(compute_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=sd,
    ).reshape(2, t, b, 4 * h)
    # stack directions on the batch axis: (T, 2B, 4H)
    gx = jnp.concatenate([gx[0], gx[1]], axis=1)
    # NOTE: kernel weights stay fp32 (validated on v5e); pass a bf16 w_hh
    # explicitly to opt into bf16 MXU dots (untested on hardware so far)
    ys = lstm_scan_pallas(
        gx, w_hh.astype(jnp.float32), chunk=chunk, interpret=interpret
    )
    fwd = ys[:, :b]
    bwd = jnp.flip(ys[:, b:], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1).astype(jnp.float32)
