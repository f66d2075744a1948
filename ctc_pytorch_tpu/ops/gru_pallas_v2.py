"""v2-layout GRU Pallas kernels (eval + trainable custom VJP).

GRU twin of ops/lstm_pallas_v2.py / lstm_pallas_train_v2.py — see those
modules for the layout story (in-kernel time reversal over a lane-split
``gx (T, B, 6H)``, guard-row ``ys_store (T+2, B, 2H)`` residual, zero
wrapper plane copies).  GRU specifics:

- no cell state: ``ys_store`` is the complete residual set;
- the backward emits TWO planes: ``dgx (T, B, 6H)`` (the input-projection
  gradient, lanes split by direction) and ``dhhn (T, B, 2H)`` (the
  n-gate's recurrent-branch gradient ``dpre_n * r``, needed for dW_hh's
  third block — the n gate sees ``r * (h_prev @ W_n)``);
- ``dW_hh = [hp^T dpre_r | hp^T dpre_z | hp^T dhh_n]`` assembles from
  column blocks outside the kernel (torch gate order r, z, n —
  ``models.rnn._gru_step`` semantics, my_863_corpus/steps/model.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctc_pytorch_tpu.ops.lstm_pallas import _auto_interpret, stream_dtype_for


def _gru_cell2(gx2, h, w_ref):
    """Direction-batched GRU step: gx2 (2,B,3H), h (2,B,H), w (2,H,3H)."""
    dd = w_ref.dtype
    hh = jax.lax.dot_general(
        h.astype(dd), w_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    gx2 = gx2.astype(jnp.float32)
    hsz = h.shape[-1]
    r = jax.nn.sigmoid(gx2[..., :hsz] + hh[..., :hsz])
    z = jax.nn.sigmoid(gx2[..., hsz:2 * hsz] + hh[..., hsz:2 * hsz])
    n = jnp.tanh(gx2[..., 2 * hsz:] + r * hh[..., 2 * hsz:])
    return (1.0 - z) * n + z * h


def _make_fwd_kernel(chunk: int, t_max: int, b: int, h: int, sd,
                     with_guard: bool):
    """with_guard: emit (T+2) guard-row layout (training residual); else a
    plain aligned (T, B, 2H) output (eval)."""
    n_chunks = t_max // chunk
    h3 = 3 * h
    off = 1 if with_guard else 0

    def kernel(gx_hbm, w_ref, ys_hbm, gf_buf, gb_buf, yf_buf, yb_buf,
               zero_buf, h_scr, in_sems, out_sems, z_sems):
        def f_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(ci * chunk, chunk), :, pl.ds(0, h3)],
                gf_buf.at[slot], in_sems.at[0, slot])

        def b_in(slot, ci):
            return pltpu.make_async_copy(
                gx_hbm.at[pl.ds(t_max - (ci + 1) * chunk, chunk), :,
                          pl.ds(h3, h3)],
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
                hs = _gru_cell2(gx2, hs, w_ref)
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
    from ctc_pytorch_tpu.ops.lstm_pallas_train_v2 import _use_hoist
    n_chunks = t_max // chunk
    h3 = 3 * h
    use_hoist = _use_hoist(chunk, b, h)

    def kernel(gx_hbm, w_ref, ys_hbm, dy_hbm, dgx_hbm, dhhn_hbm,
               gf_buf, gb_buf, hp0_buf, hp1_buf, dy0_buf, dy1_buf,
               dg0_buf, dg1_buf, dn0_buf, dn1_buf, pre_buf, dh_scr,
               in_sems, out_sems):
        def a0(ci):
            return (n_chunks - 1 - ci) * chunk  # dir0 reverse walk

        def a1(ci):
            return ci * chunk  # dir1 forward walk

        def big_in(slot, ci):
            return [
                pltpu.make_async_copy(
                    gx_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h3)],
                    gf_buf.at[slot], in_sems.at[0, slot]),
                pltpu.make_async_copy(
                    gx_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h3, h3)],
                    gb_buf.at[slot], in_sems.at[1, slot]),
            ]

        def small_in(ci):
            return [
                pltpu.make_async_copy(  # h_prev0(t) = ys_store[t, 0:H]
                    ys_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h)],
                    hp0_buf, in_sems.at[2, 0]),
                pltpu.make_async_copy(  # h_prev1(t) = ys_store[t+2, H:2H]
                    ys_hbm.at[pl.ds(a1(ci) + 2, chunk), :, pl.ds(h, h)],
                    hp1_buf, in_sems.at[3, 0]),
                pltpu.make_async_copy(
                    dy_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h)],
                    dy0_buf, in_sems.at[4, 0]),
                pltpu.make_async_copy(
                    dy_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h, h)],
                    dy1_buf, in_sems.at[5, 0]),
            ]

        def dmas_out(slot, ci):
            return [
                pltpu.make_async_copy(
                    dg0_buf.at[slot],
                    dgx_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h3)],
                    out_sems.at[0, slot]),
                pltpu.make_async_copy(
                    dg1_buf.at[slot],
                    dgx_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h3, h3)],
                    out_sems.at[1, slot]),
                pltpu.make_async_copy(
                    dn0_buf.at[slot],
                    dhhn_hbm.at[pl.ds(a0(ci), chunk), :, pl.ds(0, h)],
                    out_sems.at[2, slot]),
                pltpu.make_async_copy(
                    dn1_buf.at[slot],
                    dhhn_hbm.at[pl.ds(a1(ci), chunk), :, pl.ds(h, h)],
                    out_sems.at[3, slot]),
            ]

        dh_scr[:] = jnp.zeros((2, b, h), jnp.float32)
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
            # Every gate quantity is carry-free (r, z, n depend only on
            # pre-loaded planes), so the recompute dot, all
            # transcendentals, and the gate jacobians hoist out of the
            # serial loop as chunk-batched work.  dpre/dhh_n/dh_prev are
            # all LINEAR in dh_t = dy + dh, so the serial chain is just
            # that add, three fused multiplies, and the dpre @ W^T dot.
            # (fp32 multiply reassociation: ulp-level differences only.)
            # Gated by _use_hoist (see lstm_pallas_train_v2): at chunk=1
            # with large h the pre-pass VMEM pressure erases the win.
            dd = w_ref.dtype
            if use_hoist:
                hp2a = jnp.stack([hp0_buf[:], hp1_buf[:]])  # (2, c, b, h)
                hh = jax.lax.dot_general(
                    hp2a.reshape(2, chunk * b, h).astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(2, chunk, b, h3)
                gxa = jnp.stack(
                    [gf_buf[slot], gb_buf[slot]]).astype(jnp.float32)
                hpf = hp2a.astype(jnp.float32)
                r = jax.nn.sigmoid(gxa[..., :h] + hh[..., :h])
                z = jax.nn.sigmoid(gxa[..., h:2 * h] + hh[..., h:2 * h])
                hh_n = hh[..., 2 * h:]
                n = jnp.tanh(gxa[..., 2 * h:] + r * hh_n)
                p_n = (1.0 - z) * (1.0 - n * n)      # dpre_n = dh_t * p_n
                # lanes: [P_r | P_z | P_n | P_hn | z | dy], each h wide
                pre = jnp.concatenate([
                    p_n * hh_n * (r * (1.0 - r)),    # dpre_r = dh_t * P_r
                    (hpf - n) * (z * (1.0 - z)),     # dpre_z = dh_t * P_z
                    p_n,
                    p_n * r,                         # dhh_n = dh_t * P_hn
                    z,
                    jnp.stack([dy0_buf[:], dy1_buf[:]]).astype(jnp.float32),
                ], axis=-1)  # (2, c, b, 6h)
                # STEP order (dir0 walks its buffer rows in reverse);
                # static unroll (chunk <= 8): Mosaic has no rev/value-slice
                for j in range(chunk):
                    pre_buf[j, 0] = pre[0, chunk - 1 - j]
                    pre_buf[j, 1] = pre[1, j]

            def step(k, dh):
                r_ = chunk - 1 - k  # dir0 in-buffer row
                pk = pre_buf[k]  # (2, b, 6h)
                dh_t = pk[..., 5 * h:] + dh
                dh3 = jnp.concatenate([dh_t, dh_t, dh_t], axis=-1)
                dpre = dh3 * pk[..., :3 * h]
                dhh_n = dh_t * pk[..., 3 * h:4 * h]
                dg0_buf[slot, r_] = dpre[0].astype(sd)
                dg1_buf[slot, k] = dpre[1].astype(sd)
                dn0_buf[slot, r_] = dhh_n[0].astype(sd)
                dn1_buf[slot, k] = dhh_n[1].astype(sd)
                # dh_prev = [dpre_r, dpre_z, dhh_n] @ W^T + dh_t * z
                dhh = jnp.concatenate([dpre[..., :2 * h], dhh_n], axis=-1)
                dh_prev = jax.lax.dot_general(
                    dhh.astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return dh_prev + dh_t * pk[..., 4 * h:5 * h]

            def step_unhoisted(k, dh):
                r_ = chunk - 1 - k  # dir0 in-buffer row
                gx2 = jnp.stack([gf_buf[slot, r_], gb_buf[slot, k]])
                hp2 = jnp.stack([hp0_buf[r_], hp1_buf[k]])
                dy2 = jnp.stack([dy0_buf[r_], dy1_buf[k]])
                hh_s = jax.lax.dot_general(
                    hp2.astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                gx2f = gx2.astype(jnp.float32)
                hpf_s = hp2.astype(jnp.float32)
                r = jax.nn.sigmoid(gx2f[..., :h] + hh_s[..., :h])
                z = jax.nn.sigmoid(gx2f[..., h:2 * h] + hh_s[..., h:2 * h])
                hh_n = hh_s[..., 2 * h:]
                n = jnp.tanh(gx2f[..., 2 * h:] + r * hh_n)
                dh_t = dy2.astype(jnp.float32) + dh
                dz = dh_t * (hpf_s - n)
                dn = dh_t * (1.0 - z)
                dpre_n = dn * (1.0 - n * n)
                dr = dpre_n * hh_n
                dpre_r = dr * r * (1.0 - r)
                dpre_z = dz * z * (1.0 - z)
                dhh_n = dpre_n * r
                dpre = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
                dg0_buf[slot, r_] = dpre[0].astype(sd)
                dg1_buf[slot, k] = dpre[1].astype(sd)
                dn0_buf[slot, r_] = dhh_n[0].astype(sd)
                dn1_buf[slot, k] = dhh_n[1].astype(sd)
                dhh = jnp.concatenate([dpre_r, dpre_z, dhh_n], axis=-1)
                dh_prev = jax.lax.dot_general(
                    dhh.astype(dd), w_ref[:],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return dh_prev + dh_t * z

            body_fn = step if use_hoist else step_unhoisted
            dh_scr[:] = jax.lax.fori_loop(0, chunk, body_fn, dh_scr[:])
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

def _fwd_pallas(gx, w_hh, chunk, interpret, with_guard):
    t, b, h6 = gx.shape
    h = h6 // 6
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
            pltpu.VMEM((2, chunk, b, 3 * h), sd),
            pltpu.VMEM((2, chunk, b, 3 * h), sd),
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


def _bwd_pallas(gx, w_hh, ys_store, dy, chunk, interpret):
    from ctc_pytorch_tpu.ops.lstm_pallas_train_v2 import _use_hoist as _uh
    t, b, h6 = gx.shape
    h = h6 // 6
    sd = gx.dtype
    kernel = _make_bwd_kernel(chunk, t, b, h, sd)
    dgx, dhhn = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, b, h6), sd),
            jax.ShapeDtypeStruct((t, b, 2 * h), sd),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, b, 3 * h), sd),
            pltpu.VMEM((2, chunk, b, 3 * h), sd),
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((chunk, b, h), sd),
            pltpu.VMEM((2, chunk, b, 3 * h), sd),
            pltpu.VMEM((2, chunk, b, 3 * h), sd),
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM((2, chunk, b, h), sd),
            pltpu.VMEM(
                (chunk, 2, b, 6 * h) if _uh(chunk, b, h)
                else (1, 1, 8, 128), jnp.float32),  # pre-pass (or dummy)
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.SemaphoreType.DMA((6, 2)),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gx, w_hh.astype(sd), ys_store, dy)
    return dgx, dhhn


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gru_scan_train_v2(gx, w_hh, chunk: int, interpret: bool | None = None):
    ys, _ = _fwd_impl(gx, w_hh, chunk, interpret)
    return ys


def _fwd_impl(gx, w_hh, chunk, interpret):
    interp = _auto_interpret(interpret)
    ys_store = _fwd_pallas(gx, w_hh, chunk, interp, with_guard=True)
    return ys_store, (gx, w_hh, ys_store)


def _fwd_rule(gx, w_hh, chunk, interpret):
    return _fwd_impl(gx, w_hh, chunk, interpret)


def _bwd_rule(chunk, interpret, res, dys):
    gx, w_hh, ys_store = res
    interp = _auto_interpret(interpret)
    t = gx.shape[0]
    h = w_hh.shape[1]
    sd = gx.dtype
    dy = dys[1:t + 1].astype(sd)
    dgx, dhhn = _bwd_pallas(gx, w_hh, ys_store, dy, chunk, interp)
    # dW_hh column blocks: [r | z] from dgx lanes, [n] from dhhn
    hp_f = ys_store[0:t, :, :h]
    hp_b = ys_store[2:t + 2, :, h:]
    def blocks(hp, drz, dn):
        rz = jnp.einsum("tbh,tbg->hg", hp, drz,
                        preferred_element_type=jnp.float32)
        nn = jnp.einsum("tbh,tbg->hg", hp, dn,
                        preferred_element_type=jnp.float32)
        return jnp.concatenate([rz, nn], axis=1)
    dw_f = blocks(hp_f, dgx[..., : 2 * h], dhhn[..., :h])
    dw_b = blocks(hp_b, dgx[..., 3 * h:5 * h], dhhn[..., h:])
    return dgx, jnp.stack([dw_f, dw_b]).astype(w_hh.dtype)


gru_scan_train_v2.defvjp(_fwd_rule, _bwd_rule)


def _pick_chunk(t: int, b: int, h: int, sd_bytes: int,
                budget: int = 13 * 1024 * 1024) -> int:
    w_bytes = 2 * h * 3 * h * sd_bytes
    carries = 2 * 2 * b * h * 4
    # divisibility is NOT required: the wrapper zero-pads gx to a chunk
    # multiple (bias-free cells keep the padded tail's state exactly zero,
    # so outputs in [0, t) are unchanged).  chunk=1 is deliberately last:
    # the hoisted pre-pass amortizes nothing at one step per chunk
    # (measured 0.99 ms/layer at chunk=1 vs 0.22 at chunk=2, (95,128,256)).
    for c in (8, 4, 2, 1):
        # bwd: (gx + dgx) double (3H each per dir) + dhhn double + 4 small
        bufs = (2 * 2 * c * b * 3 * h * 2 + 2 * 2 * c * b * h
                + 4 * c * b * h) * sd_bytes
        # + the hoisted pre-pass (6h fp32 scratch + transient gate planes)
        # — only charged when _use_hoist actually hoists at this chunk
        # (the un-hoisted kernel allocates a dummy (1,1,8,128) scratch)
        from ctc_pytorch_tpu.ops.lstm_pallas_train_v2 import _use_hoist
        hoist = 20 * c * b * h * 4 if _use_hoist(c, b, h) else 0
        if bufs + hoist + w_bytes + carries <= budget:
            return c
    return 0


def gru_bidir_v2(
    x: jnp.ndarray,  # (T, B, F)
    w_ih: jnp.ndarray,  # (2, F, 3H)
    w_hh: jnp.ndarray,  # (2, H, 3H)
    chunk: int | None = None,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    train: bool = True,
) -> jnp.ndarray:
    """Bidirectional GRU layer, v2 layout (train + eval)."""
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
        # (bias-free cells), which keep both directions' state exactly
        # zero through the tail, so rows [0, t) are unchanged; the pad's
        # autodiff slices dx back down
        x = jnp.pad(x, ((0, tp - t), (0, 0), (0, 0)))
    w_cat = jnp.concatenate([w_ih[0], w_ih[1]], axis=1).astype(compute_dtype)
    gx = jax.lax.dot_general(
        x.reshape(tp * b, -1).astype(compute_dtype), w_cat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=sd,
    ).reshape(tp, b, 6 * h)
    if train:
        ys_store = gru_scan_train_v2(gx, w_hh.astype(jnp.float32), chunk,
                                     interpret)
        return ys_store[1:t + 1].astype(jnp.float32)
    interp = _auto_interpret(interpret)
    ys = _fwd_pallas(gx, w_hh.astype(jnp.float32), chunk, interp,
                     with_guard=False)
    return ys[:t].astype(jnp.float32)


def gru_v2_ok(t: int, b: int, h: int, compute_dtype) -> bool:
    # v2 buffers are per-direction: the sublane dim is b (not the v1
    # stacked 2B), so the bf16 min-tile check must see b itself
    sd = stream_dtype_for(compute_dtype, b)
    # any t: the wrapper zero-pads gx to a chunk multiple (odd conv-output
    # lengths like the 863 front's t'=95 cost one zero row, not the v1
    # path's ~1 ms/layer wrapper plane copies)
    return (t >= 1 and h % 128 == 0 and (2 * b) % 8 == 0
            and _pick_chunk(t, b, h, jnp.dtype(sd).itemsize) > 0)
