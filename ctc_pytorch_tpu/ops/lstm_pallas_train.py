"""Trainable fused Pallas LSTM: forward + hand-derived backward kernels.

Extends ops/lstm_pallas.py to the training path via ``jax.custom_vjp``:

- **forward** streams gx chunks HBM->VMEM and emits BOTH hidden states
  ``ys`` and cell states ``cs`` (the only residuals; gates are recomputed
  in the backward from gx + ys, one extra MXU matmul per step — cheaper
  than streaming 4 gate planes);
- **backward** walks time in reverse with (dh, dc) carried in VMEM.  The
  gate pre-activations ``gates = gx + h_prev @ W_hh`` are recomputed
  OUTSIDE the kernel as one large batched matmul (every h_prev is in the
  residuals, so nothing forces that dot to be sequential) and streamed in
  place of gx; the kernel forms the activations, ``dpre`` (== d gx),
  streams it out, and backpropagates ``dh_{t-1}`` through the recurrent
  weights with a transposed-contraction dot — ONE sequential MXU dot per
  step instead of two;
- ``dW_hh`` is NOT accumulated in the kernel: it is one large XLA matmul
  over the emitted ``dgx`` and the shifted ``ys`` (keeps the kernel's VMEM
  at ~14 MB: gx/dgx double-buffers at chunk=2, four small streams, fp32
  weights, carries);
- ``dW_ih``/``dx`` fall out of ``dgx`` with two more XLA matmuls.

Gradient check: tests/test_lstm_pallas_train.py compares against autodiff
of ``models.rnn._scan_bidir_fused`` in interpret mode; the same comparison
runs compiled on real TPU hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.lstm_pallas import (
    _auto_interpret,
    _lstm_cell,
    auto_chunk,
    pad_t,
)


# ---------------------------------------------------------------------------
# forward kernel: like lstm_pallas but also writes cell states
# ---------------------------------------------------------------------------

def _make_fwd_kernel(chunk: int, t_max: int, b2: int, h: int,
                     sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(gx_hbm, wf_ref, wb_ref, ys_hbm, cs_hbm, gx_buf, y_buf, c_buf,
               h_scr, c_scr, in_sems, y_sems, c_sems):
        def in_dma(slot, idx):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(idx * chunk, chunk)], gx_buf.at[slot],
                in_sems.at[slot],
            )

        def y_dma(slot, idx):
            return pltpu.make_async_copy(
                y_buf.at[slot], ys_hbm.at[pl.ds(idx * chunk, chunk)],
                y_sems.at[slot],
            )

        def c_dma(slot, idx):
            return pltpu.make_async_copy(
                c_buf.at[slot], cs_hbm.at[pl.ds(idx * chunk, chunk)],
                c_sems.at[slot],
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
                y_dma(slot, ci - 2).wait()
                c_dma(slot, ci - 2).wait()

            def step(k, carry):
                hs, cs = carry
                hs, cs, _ = _lstm_cell(
                    gx_buf[slot, k], hs, cs, wf_ref, wb_ref, b, h
                )
                y_buf[slot, k] = hs.astype(sd)
                c_buf[slot, k] = cs.astype(sd)
                return hs, cs

            hs, cs = jax.lax.fori_loop(0, chunk, step, (h_scr[:], c_scr[:]))
            h_scr[:] = hs
            c_scr[:] = cs
            y_dma(slot, ci).start()
            c_dma(slot, ci).start()
            return ()

        jax.lax.fori_loop(0, n_chunks, chunk_body, ())

        @pl.when(n_chunks >= 2)
        def _():
            y_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            c_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        y_dma((n_chunks - 1) % 2, n_chunks - 1).wait()
        c_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    return kernel


# ---------------------------------------------------------------------------
# backward kernel (emits dgx; dW_hh assembled outside)
# ---------------------------------------------------------------------------

def _make_bwd_kernel(chunk: int, t_max: int, b2: int, h: int,
                     sd=jnp.float32):
    n_chunks = t_max // chunk
    b = b2 // 2

    def kernel(gates_hbm, wf_ref, wb_ref, cs_hbm, dy_hbm, dgx_hbm,
               gates_buf, cprev_buf, c_buf, dy_buf, dgx_buf,
               dh_scr, dc_scr, sems, out_sems):
        # gates double-buffered (sems 0-1); the three small state/grad
        # streams are single-buffered (sems 2-4) — they are tiny next to
        # gates/dgx and waited immediately, trading overlap for VMEM.
        # ``gates`` = gx + h_prev @ W_hh is precomputed OUTSIDE the kernel:
        # unlike the forward, the backward knows every h_prev from the
        # residuals, so that matmul runs as ONE large MXU-efficient XLA dot
        # instead of T sequential per-step dots — this halves the kernel's
        # serial MXU work (measured 5.4 ms -> 3.2 ms per layer at the
        # flagship backward shape on v5e).
        def gates_dma(slot, ci):
            return pltpu.make_async_copy(
                gates_hbm.at[pl.ds(ci * chunk, chunk)], gates_buf.at[slot],
                sems.at[slot])

        def small_dmas(ci):
            t0 = ci * chunk
            # the wrapper passes cs shifted one step, so the aligned chunk
            # IS the "previous state" plane for t in the chunk
            return [
                pltpu.make_async_copy(
                    cs_hbm.at[pl.ds(t0, chunk)], cprev_buf, sems.at[2]),
                pltpu.make_async_copy(
                    cs_hbm.at[pl.ds(t0 + 1, chunk)], c_buf, sems.at[3]),
                pltpu.make_async_copy(
                    dy_hbm.at[pl.ds(t0, chunk)], dy_buf, sems.at[4]),
            ]

        def out_dma(slot, ci):
            return pltpu.make_async_copy(
                dgx_buf.at[slot], dgx_hbm.at[pl.ds(ci * chunk, chunk)],
                out_sems.at[slot],
            )

        dh_scr[:] = jnp.zeros((b2, h), jnp.float32)
        dc_scr[:] = jnp.zeros((b2, h), jnp.float32)

        gates_dma((n_chunks - 1) % 2, n_chunks - 1).start()

        def chunk_body(rci, _):
            ci = n_chunks - 1 - rci
            slot = ci % 2
            nxt_ci = ci - 1

            for d in small_dmas(ci):
                d.start()

            @pl.when(nxt_ci >= 0)
            def _():
                gates_dma(nxt_ci % 2, nxt_ci).start()

            gates_dma(slot, ci).wait()
            for d in small_dmas(ci):
                d.wait()

            @pl.when(rci >= 2)
            def _():
                out_dma(slot, ci + 2).wait()

            def step(kk, carry):
                k = chunk - 1 - kk  # reverse within chunk
                dh, dc = carry
                c_prev = cprev_buf[k].astype(jnp.float32)
                c_t = c_buf[k].astype(jnp.float32)
                dd = wf_ref.dtype
                gates = gates_buf[slot, k].astype(jnp.float32)
                i = jax.nn.sigmoid(gates[:, :h])
                f = jax.nn.sigmoid(gates[:, h:2 * h])
                g = jnp.tanh(gates[:, 2 * h:3 * h])
                o = jax.nn.sigmoid(gates[:, 3 * h:])
                tc = jnp.tanh(c_t)

                dh_t = dy_buf[k].astype(jnp.float32) + dh
                do = dh_t * tc
                dct = dc + dh_t * o * (1.0 - tc * tc)
                di = dct * g
                df = dct * c_prev
                dg = dct * i
                dpre = jnp.concatenate([
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ], axis=1)  # (2B, 4H)
                dgx_buf[slot, k] = dpre.astype(sd)
                # dh_{t-1}: contract dpre with W over the 4H axis, per dir
                dh_f = jax.lax.dot_general(
                    dpre[:b].astype(dd), wf_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dh_b = jax.lax.dot_general(
                    dpre[b:].astype(dd), wb_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dh_prev = jnp.concatenate([dh_f, dh_b], axis=0)
                dc_prev = dct * f
                return dh_prev, dc_prev

            dh, dc = jax.lax.fori_loop(0, chunk, step, (dh_scr[:], dc_scr[:]))
            dh_scr[:] = dh
            dc_scr[:] = dc
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
    t_pad, b2, h4 = gx.shape
    h = h4 // 4
    sd = gx.dtype
    kernel = _make_fwd_kernel(chunk, t_pad, b2, h, sd=sd)
    ys, cs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, b2, h), sd),
            jax.ShapeDtypeStruct((t_pad, b2, h), sd),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b2, h4), sd),
            pltpu.VMEM((2, chunk, b2, h), sd),
            pltpu.VMEM((2, chunk, b2, h), sd),
            pltpu.VMEM((b2, h), jnp.float32),
            pltpu.VMEM((b2, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh[0], w_hh[1])
    return ys, cs


def _bwd_pallas(gates, w_hh, cs_shift, dy, chunk, interpret):
    t_pad, b2, h4 = gates.shape
    h = h4 // 4
    sd = gates.dtype
    kernel = _make_bwd_kernel(chunk, t_pad, b2, h, sd=sd)
    dgx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, b2, h4), sd),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gates
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wb
            pl.BlockSpec(memory_space=pl.ANY),  # cs_shift
            pl.BlockSpec(memory_space=pl.ANY),  # dy
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b2, h4), sd),  # gates (double)
            pltpu.VMEM((chunk, b2, h), sd),  # c_prev (single)
            pltpu.VMEM((chunk, b2, h), sd),  # c_t (single)
            pltpu.VMEM((chunk, b2, h), sd),  # dy (single)
            pltpu.VMEM((2, chunk, b2, h4), sd),  # dgx out (double)
            pltpu.VMEM((b2, h), jnp.float32),  # dh carry
            pltpu.VMEM((b2, h), jnp.float32),  # dc carry
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gates, w_hh[0], w_hh[1], cs_shift, dy)
    return dgx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def lstm_scan_train(gx, w_hh, fwd_chunk: int = 4, bwd_chunk: int = 2,
                    interpret: bool | None = None, bwd_split: bool = False):
    ys, _ = _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret)
    return ys


def _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret):
    interp = _auto_interpret(interpret)
    # stream dtype follows gx.dtype (bf16 streams halve kernel HBM traffic)
    gx_p, t = pad_t(gx, fwd_chunk)
    ys, cs = _fwd_pallas(gx_p, w_hh, fwd_chunk, interp)
    return ys[:t], (gx_p, w_hh, ys, cs, t)


def _fwd_rule(gx, w_hh, fwd_chunk, bwd_chunk, interpret, bwd_split):
    ys, res = _fwd_impl(gx, w_hh, fwd_chunk, bwd_chunk, interpret)
    return ys, res


def _split_halves(a, b):
    """Direction-interleaved batch split of a (T, 2B, ·) plane.

    Rows [0:B] are the forward direction, [B:2B] the backward one; each
    half keeps B/2 columns of BOTH directions so the kernel's wf/wb row
    split stays valid at b2/2.
    """
    half = b // 2
    return (
        jnp.concatenate([a[:, :half], a[:, b:b + half]], axis=1),
        jnp.concatenate([a[:, half:b], a[:, b + half:]], axis=1),
    )


def _join_halves(d1, d2, b):
    half = b // 2
    return jnp.concatenate(
        [d1[:, :half], d2[:, :half], d1[:, half:], d2[:, half:]], axis=1
    )


def _bwd_rule(fwd_chunk, bwd_chunk, interpret, bwd_split, res, dy):
    gx_p, w_hh, ys, cs, t = res
    interp = _auto_interpret(interpret)
    sd = gx_p.dtype
    t_fwd = gx_p.shape[0]
    b2 = gx_p.shape[1]
    h = w_hh.shape[1]
    # re-pad to the backward chunk size
    pad_b = (-t_fwd) % bwd_chunk
    t_pad = t_fwd + pad_b
    zeros1 = jnp.zeros((1, b2, h), sd)
    ys_prev = jnp.concatenate([zeros1, ys[:-1]], axis=0)  # row t = h_{t-1}
    cs_shift = jnp.concatenate([zeros1, cs], axis=0)  # row t+1 = c_t
    if pad_b:
        gx_p = jnp.pad(gx_p, ((0, pad_b), (0, 0), (0, 0)))
        ys_prev = jnp.pad(ys_prev, ((0, pad_b), (0, 0), (0, 0)))
        cs_shift = jnp.pad(cs_shift, ((0, pad_b), (0, 0), (0, 0)))
    dy_p = jnp.zeros((t_pad,) + dy.shape[1:], sd).at[:t].set(dy.astype(sd))
    # hoist the recurrent-gate recompute out of the kernel: every h_prev is
    # in the residuals, so hh = h_prev @ W_hh is one large batched matmul
    # here (MXU-efficient) instead of T sequential dots inside the kernel
    b = b2 // 2
    hh = jax.lax.dot_general(
        jnp.stack([ys_prev[:, :b], ys_prev[:, b:]]),  # (2, T, B, H)
        w_hh.astype(sd),
        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
        preferred_element_type=sd,  # stream dtype: halves the plane traffic
    )  # (2, T, B, 4H)
    gates = gx_p + jnp.concatenate([hh[0], hh[1]], axis=1)
    if bwd_split:
        # two half-batch kernel calls (expert escape hatch; measured slower
        # than one chunk=1 full-batch call at flagship shapes — see wrapper)
        halves = [
            _bwd_pallas(g, w_hh, c_s, d, bwd_chunk, interp)
            for g, c_s, d in zip(
                _split_halves(gates, b), _split_halves(cs_shift, b),
                _split_halves(dy_p, b),
            )
        ]
        dgx = _join_halves(halves[0], halves[1], b)
    else:
        dgx = _bwd_pallas(gates, w_hh, cs_shift, dy_p, bwd_chunk, interp)
    dgx = dgx[:t_fwd]
    # dW_hh[d] = sum_t h_prev[t]^T dpre[t] — one big XLA matmul per direction
    b = b2 // 2
    hp = ys_prev[:t_fwd]
    dw_f = jnp.einsum("tbh,tbg->hg", hp[:, :b], dgx[:, :b],
                      preferred_element_type=jnp.float32)
    dw_b = jnp.einsum("tbh,tbg->hg", hp[:, b:], dgx[:, b:],
                      preferred_element_type=jnp.float32)
    # cotangent dtype must match the (possibly bf16) primal weights
    return dgx[:t], jnp.stack([dw_f, dw_b]).astype(w_hh.dtype)


lstm_scan_train.defvjp(_fwd_rule, _bwd_rule)


def _bwd_auto_chunk(b2, h, w_bytes, budget=None, elem_bytes=4):
    if budget is None:
        budget = _BWD_BUDGET
    """gates+dgx double-buffered (8H units), three single-buffered H streams.

    Returns 0 when not even chunk=1 fits the VMEM budget — the wrapper must
    then split the batch (two half-batch kernel calls).
    """
    carries = 4 * b2 * h * 4
    for c in (8, 4, 2, 1):
        bytes_ = (2 * c * b2 * 8 * h + 3 * c * b2 * h) * elem_bytes
        if bytes_ + w_bytes + carries <= budget:
            return c
    return 0


# flagship backward (b2=256, H=384) measures 13.1 MiB resident — a 13 MiB
# budget would spuriously reject it, a 14 MiB one admits it with slack
_BWD_BUDGET = 14 * 1024 * 1024


def train_v1_ok(b: int, h: int, compute_dtype) -> bool:
    """Whether the v1 trainable kernel's backward fits VMEM at this shape
    (directly or via the half-batch split) — callers fall back to the scan
    path otherwise."""
    from ctc_pytorch_tpu.ops.lstm_pallas import stream_dtype_for

    sd_bytes = jnp.dtype(stream_dtype_for(compute_dtype, 2 * b)).itemsize
    w_bytes = 2 * h * 4 * h * 4
    if _bwd_auto_chunk(2 * b, h, w_bytes, elem_bytes=sd_bytes) >= 1:
        return True
    return ((2 * b) % 16 == 0
            and _bwd_auto_chunk(b, h, w_bytes, elem_bytes=sd_bytes) >= 1)


def lstm_bidir_train(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, 4H)
    w_hh: jnp.ndarray,  # (2, H, 4H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Trainable bidirectional layer, same semantics as
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
    ).reshape(2, t, b, 4 * h)
    gx = jnp.concatenate([gx[0], gx[1]], axis=1)  # (T, 2B, 4H)
    # kernel weights stay fp32 (validated on v5e); bf16 dots are opt-in
    h4 = 4 * h
    w_bytes = 2 * h * h4 * 4
    sd_bytes = jnp.dtype(sd).itemsize
    # bwd_split (two half-batch backward calls) is NOT a chunk-size
    # optimisation: at the flagship shape a half-batch chunk=2 backward
    # measures WORSE than one full-batch chunk=1 call (5.8 ms vs 5.4 ms on
    # v5e).  It exists for batches whose backward cannot fit VMEM at all
    # (e.g. B=256, H=384 needs 22.8 MiB at chunk=1) — splitting is what
    # makes those shapes runnable.
    bwd_split = False
    if chunk is None:
        fwd_chunk = auto_chunk(2 * b, h, 6, weights_bytes=w_bytes,
                               elem_bytes=sd_bytes)
        bwd_chunk = _bwd_auto_chunk(2 * b, h, w_bytes, elem_bytes=sd_bytes)
        if bwd_chunk == 0 and (2 * b) % 16 == 0:
            half_chunk = _bwd_auto_chunk(b, h, w_bytes, elem_bytes=sd_bytes)
            if half_chunk >= 1:
                bwd_split, bwd_chunk = True, half_chunk
        if bwd_chunk == 0:
            # fail loudly here rather than deep inside Mosaic with an
            # opaque scoped-vmem allocation error (callers gate via
            # train_v1_ok and fall back to the scan path)
            raise ValueError(
                f"lstm_bidir_train backward does not fit VMEM at B={b}, "
                f"H={h} (even batch-split); use the scan path"
            )
    else:
        fwd_chunk, bwd_chunk = chunk, max(chunk // 2, 1)
    ys = lstm_scan_train(
        gx, w_hh.astype(jnp.float32), fwd_chunk, bwd_chunk, interpret,
        bwd_split
    )
    fwd = ys[:, :b]
    bwd = jnp.flip(ys[:, b:], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1).astype(jnp.float32)
