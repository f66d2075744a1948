"""LSTM Pallas kernels, v2 layout: in-kernel time reversal, no plane copies.

The v1 kernels (ops/lstm_pallas*.py) stack both directions on the batch
axis of one (T, 2B, 4H) gx plane, which costs four full-plane copies per
layer in the wrapper: flip(x), stack, the direction concat, and the
output split+flip+concat.  v2 removes ALL of them:

- ``gx`` is built by ONE dot against the lane-concatenated weights
  ``[W_f | W_b] (in, 8H)`` -> (T, B, 8H); lanes 0:4H belong to the
  forward direction, 4H:8H to the backward one.  No flip, no stack, no
  concat — the reshape views are free.
- the kernel streams TWO windows of gx per chunk: the forward direction
  reads chunk ci top-down, the backward direction reads chunk
  ``n-1-ci`` bottom-up (its rows consumed in reverse inside the chunk).
  Each step does one direction-batched MXU dot ``(2,B,H)@(2,H,4H)``.
- outputs write straight into a (T, B, 2H) plane via lane-offset DMAs,
  with the backward direction's rows landing in forward-time order —
  the result IS the next layer's input, zero post-processing.

Requires T % chunk == 0 (bucket lengths are 8-aligned by
``data/batching.BucketBatcher``, and chunk divides 8) — otherwise the
caller must use the v1 path, whose end-padding semantics keep the
backward direction off the pad rows.

Eval/forward only here; v1 remains the trainable path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.lstm_pallas import (
    _auto_interpret,
    auto_chunk,
    stream_dtype_for,
)


def _cell2(gx2, h, c, w_ref):
    """Direction-batched LSTM step: gx2 (2,B,4H), h/c (2,B,H), w (2,H,4H)."""
    dd = w_ref.dtype
    hh = jax.lax.dot_general(
        h.astype(dd), w_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    gates = gx2.astype(jnp.float32) + hh
    hsz = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hsz])
    f = jax.nn.sigmoid(gates[..., hsz:2 * hsz])
    g = jnp.tanh(gates[..., 2 * hsz:3 * hsz])
    o = jax.nn.sigmoid(gates[..., 3 * hsz:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _make_kernel(chunk: int, t_max: int, b: int, h: int, sd):
    n_chunks = t_max // chunk
    h4 = 4 * h

    def kernel(gx_hbm, w_ref, ys_hbm, gf_buf, gb_buf, yf_buf, yb_buf,
               h_scr, c_scr, in_sems, out_sems):
        def f_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(ci * chunk, chunk), :, pl.ds(0, h4)],
                gf_buf.at[slot], in_sems.at[0, slot])

        def b_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(t_max - (ci + 1) * chunk, chunk), :,
                          pl.ds(h4, h4)],
                gb_buf.at[slot], in_sems.at[1, slot])

        def f_out(slot, ci):
            return pltpu.make_async_copy(
                yf_buf.at[slot],
                ys_hbm.at[pl.ds(ci * chunk, chunk), :, pl.ds(0, h)],
                out_sems.at[0, slot])

        def b_out(slot, ci):
            return pltpu.make_async_copy(
                yb_buf.at[slot],
                ys_hbm.at[pl.ds(t_max - (ci + 1) * chunk, chunk), :,
                          pl.ds(h, h)],
                out_sems.at[1, slot])

        h_scr[:] = jnp.zeros((2, b, h), jnp.float32)
        c_scr[:] = jnp.zeros((2, b, h), jnp.float32)
        f_in(0, 0).start()
        b_in(0, 0).start()

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
                f_out(slot, ci - 2).wait()
                b_out(slot, ci - 2).wait()

            def step(k, carry):
                hs, cs = carry
                gx2 = jnp.stack([gf_buf[slot, k],
                                 gb_buf[slot, chunk - 1 - k]])
                hs, cs = _cell2(gx2, hs, cs, w_ref)
                yf_buf[slot, k] = hs[0].astype(sd)
                yb_buf[slot, chunk - 1 - k] = hs[1].astype(sd)
                return hs, cs

            hs, cs = jax.lax.fori_loop(0, chunk, step, (h_scr[:], c_scr[:]))
            h_scr[:] = hs
            c_scr[:] = cs
            f_out(slot, ci).start()
            b_out(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            f_out((n_chunks - 2) % 2, n_chunks - 2).wait()
            b_out((n_chunks - 2) % 2, n_chunks - 2).wait()

        f_out((n_chunks - 1) % 2, n_chunks - 1).wait()
        b_out((n_chunks - 1) % 2, n_chunks - 1).wait()

    return kernel


def lstm_bidir_pallas_v2(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, 4H)
    w_hh: jnp.ndarray,  # (2, H, 4H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(T, B, F) -> (T, B, 2H), numerically identical to
    ``lstm_bidir_pallas`` when T % chunk == 0 (caller must check
    ``v2_ok``)."""
    interp = _auto_interpret(interpret)
    t, b, _ = x.shape
    h = w_hh.shape[1]
    h4 = 4 * h
    # v2 buffers are per-direction: the sublane dim is b (not the v1
    # stacked 2B), so the bf16 min-tile check must see b itself
    sd = stream_dtype_for(compute_dtype, b)
    if chunk is None:
        w_bytes = 2 * h * h4 * 4
        chunk = auto_chunk(2 * b, h, 5, weights_bytes=w_bytes,
                           elem_bytes=jnp.dtype(sd).itemsize)
    tp = -(-t // chunk) * chunk
    if tp != t:
        # pad BEFORE the gx dot: zero input rows give zero gx rows
        # (bias-free cells); rows [0, t) are unchanged (gru_pallas_v2)
        x = jnp.pad(x, ((0, tp - t), (0, 0), (0, 0)))
    # one dot against lane-concatenated weights: (T*B, in) @ (in, 8H)
    w_cat = jnp.concatenate([w_ih[0], w_ih[1]], axis=1).astype(compute_dtype)
    gx = jax.lax.dot_general(
        x.reshape(tp * b, -1).astype(compute_dtype), w_cat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=sd,
    ).reshape(tp, b, 2 * h4)
    kernel = _make_kernel(chunk, tp, b, h, sd)
    ys = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tp, b, 2 * h), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh (2,H,4H)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b, h4), sd),  # gx fwd double buf
            pltpu.VMEM((2, chunk, b, h4), sd),  # gx bwd double buf
            pltpu.VMEM((2, chunk, b, h), sd),  # y fwd
            pltpu.VMEM((2, chunk, b, h), sd),  # y bwd
            pltpu.VMEM((2, b, h), jnp.float32),  # h
            pltpu.VMEM((2, b, h), jnp.float32),  # c
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interp,
    )(gx, w_hh.astype(jnp.float32))
    return ys[:t].astype(jnp.float32)


def v2_ok(t: int, b: int, h: int) -> bool:
    # any t >= 1: the chunk picker falls back to chunk=1 when nothing
    # larger divides t (odd conv-output lengths, e.g. the 863 front's
    # t'=95); measured 2-3x over the v1 path even at chunk=1 because
    # the wrapper plane copies, not the DMA count, dominate v1
    return t >= 1 and h % 128 == 0 and (2 * b) % 8 == 0
