"""Training loop: jitted train/eval steps + the reference's epoch driver.

Functional redesign of ``timit/steps/train_ctc.py`` (``main``/``run_epoch``):

- one jitted ``train_step`` per bucket shape (buckets bound recompilation):
  forward (bf16 matmuls / fp32 loss) -> CTC loss -> grads -> Adam update,
  with state donated so updates are in-place on device;
- the fractional length contract (``train_ctc.py:46``):
  ``input_sizes = (frac * T_out).astype(int)``;
- ``loss = CTCLoss(sum) / batch`` semantics via masked mean over real
  examples (``example_mask`` excludes repeat-padding rows);
- per-step training token-error via on-device greedy collapse + host edit
  distance (``model_ctc.py:187-202``), optional for peak throughput;
- the plateau scheduler with device-side snapshots and rollback, and the
  best-dev-accuracy state kept for the final package (``train_ctc.py:160-249``);
- data parallelism: with a mesh, batches are sharded over the ``data`` axis
  and XLA inserts the gradient psum (parallel/mesh.py).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.decode.greedy import greedy_collapse
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.ops import ctc_loss
from ctc_pytorch_tpu.train import checkpoint as ckpt
from ctc_pytorch_tpu.train.metrics_log import MetricsLogger
from ctc_pytorch_tpu.train.scheduler import PlateauScheduler
from ctc_pytorch_tpu.train.state import (
    TrainState,
    create_train_state,
    get_lr,
    scale_lr,
    snapshot,
)


def make_step_fns(spec: ModelSpec, tx, mesh=None, data_axis: str = "data",
                  frontend_fn=None, ctc_impl: str = "scan",
                  return_raw: bool = False):
    """Build jitted (train_step, eval_step) closed over spec and optimizer.

    With ``frontend_fn`` (waveform-in end-to-end), ``feats`` carries padded
    raw waveforms and ``frac`` carries the valid *sample* counts; the frontend
    runs inside the same jitted graph and rewrites both.

    ``ctc_impl`` selects the loss backend: 'scan' (lax.scan DP) or 'pallas'
    (single-program alpha/beta kernels, ops/ctc_pallas.py) — both expose the
    same custom −γ VJP, so training results are identical.
    """
    if ctc_impl == "pallas":
        from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas as _ctc
    else:
        _ctc = ctc_loss

    axis = data_axis if mesh is not None else None

    def _forward(params, model_state, feats, frac, labels, label_lens, mask,
                 rng, train: bool):
        if frontend_fn is not None:
            feats, frac, _ = frontend_fn(feats, frac)
        out = CTCModel.apply(
            spec, params, model_state, feats, train=train, rng=rng,
            axis_name=axis, frac=frac, example_mask=mask,
        )
        log_probs, new_mstate = out[0], out[1]
        t_out = log_probs.shape[0]
        # 'batchmax' recomputes the reference's len/batch_max fraction and
        # rescales by the batch max's OWN output length (train_ctc.py:46 to
        # the float32 op); other modes rescale the boundary-relative frac
        input_sizes = CTCModel.input_sizes(
            spec, frac, feats.shape[1], t_out, example_mask=mask,
            axis_name=axis,
        )
        neg_ll = _ctc(
            log_probs, labels, input_sizes, label_lens, reduction="none"
        )
        # reference: sum over batch / batch_size (train_ctc.py:47-48);
        # masked mean excludes repeat-padded rows of ragged final batches.
        # Per-shard the denominator is the GLOBAL mask count, so the local
        # value is this shard's contribution to the global mean — its grads
        # psum to exactly the single-device gradient.
        denom = jnp.sum(mask)
        if axis is not None:
            denom = jax.lax.psum(denom, axis)
        loss = jnp.sum(neg_ll * mask) / jnp.maximum(denom, 1.0)
        return loss, (new_mstate, log_probs, input_sizes)

    def train_step(state: TrainState, feats, frac, labels, label_lens, mask,
                   rng):
        rng = jax.random.fold_in(rng, state.step)
        if axis is not None:
            # the key arrives replicated; decorrelate the per-shard dropout
            # masks (otherwise rows i, i+B/n, ... share masks every step)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, (new_mstate, log_probs, input_sizes)), grads = (
            jax.value_and_grad(_forward, has_aux=True)(
                state.params, state.model_state, feats, frac, labels,
                label_lens, mask, rng, True,
            )
        )
        if axis is not None:
            # explicit DP collective: per-shard grad contributions + loss
            # terms sum over ICI (the psum GSPMD used to insert for us)
            grads = jax.lax.psum(grads, axis)
            loss = jax.lax.psum(loss, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_mstate, new_opt)
        greedy_idx = jnp.argmax(log_probs, axis=-1).T  # (B, T_out)
        return new_state, loss, greedy_idx, input_sizes

    def eval_step(state: TrainState, feats, frac, labels, label_lens, mask):
        loss, (_, log_probs, input_sizes) = _forward(
            state.params, state.model_state, feats, frac, labels, label_lens,
            mask, None, False,
        )
        if axis is not None:
            loss = jax.lax.psum(loss, axis)
        greedy_idx = jnp.argmax(log_probs, axis=-1).T
        return loss, greedy_idx, input_sizes, log_probs

    donate = {"donate_argnums": (0,)}
    if mesh is not None:
        # Explicit SPMD via shard_map (scaling-book recipe): each device
        # runs the full step on its batch shard — including the Pallas
        # RNN/CTC kernels, which GSPMD cannot partition through a jit
        # boundary (an unpartitioned custom call would be all-gathered and
        # replicated, silently serialising the hot path).  Collectives are
        # the explicit psums above plus the sync-BN psums inside the model.
        from jax.sharding import PartitionSpec as P

        from ctc_pytorch_tpu.parallel.mesh import shard_map_compat

        repl, data = P(), P(data_axis)
        train_sm = shard_map_compat(
            train_step, mesh,
            in_specs=(repl, data, data, data, data, data, repl),
            out_specs=(repl, repl, data, data),
        )
        eval_sm = shard_map_compat(
            eval_step, mesh,
            in_specs=(repl, data, data, data, data, data),
            # log_probs is time-major (T', B, C): batch is axis 1
            out_specs=(repl, data, data, P(None, data_axis)),
        )
        train_jit = jax.jit(train_sm, **donate)
        eval_jit = jax.jit(eval_sm)
    else:
        train_jit = jax.jit(train_step, **donate)
        eval_jit = jax.jit(eval_step)
    if return_raw:
        return train_jit, eval_jit, train_step, eval_step
    return train_jit, eval_jit


def make_fused_fns(raw_step_fns, mesh=None, data_axis: str = "data",
                   waveform: bool = False, pregather: bool = False,
                   _unjitted: bool = False):
    """Jitted per-bucket-group epoch runners over a device-resident cache.

    Each call runs a whole group of same-shape batches as one
    ``lax.scan``: gather batch rows from the cached bucket arrays, run the
    train/eval step, and accumulate loss + token-error sums — all on
    device, ONE dispatch per group instead of one per batch.  This is the
    TPU answer to the dispatch-latency bound on the device-cached epoch
    rate (docs/KERNELS.md "Input pipeline on tunneled devices"): the host
    leaves the hot path entirely.

    Per-batch numerics are identical to the streaming path *given the same
    incoming state*: the same gathers, the same frac contract
    (``in_len / t_pad``, ``train_ctc.py:46``), and the same per-step
    dropout keys (``train_step`` folds the key with ``state.step``, which
    advances identically under the scan).  Across an epoch with multiple
    bucket shapes only batch ORDER differs (batches are grouped by shape,
    within-group order preserved), so the optimizer visits groups in
    blocks — the single-bucket case is bit-comparable end to end.

    Group lengths are padded to powers of two with ``valid``-masked no-op
    iterations (``lax.cond`` skips the whole step, so state/step-count/
    dropout keys are untouched): in ``quantized`` batch mode the per-epoch
    shuffle changes each group's batch count, and without canonicalisation
    every epoch would recompile the full train program per (t_pad, count).

    With a ``mesh``, the whole fused epoch runs under ``shard_map``: bucket
    arrays arrive replicated (``DeviceCachedLoader(mesh=...)`` places them
    so), ``pos``/``mask`` are sharded over the batch axis so each device
    gathers and computes its own rows, and the loss/grad psums inside the
    raw step plus a final errs/toks psum are the only collectives — the
    same math as the streaming mesh path.

    ``waveform=True`` composes the fused epoch with a step-fused frontend
    (waveform-in training): the cached planes then hold padded raw samples
    and ``in_len`` holds valid SAMPLE counts, which the step's frac slot
    carries directly — the in-step frontend rewrites it to the frame-frac
    contract (``run_epoch(waveform=True)``'s streaming equivalent).

    ``pregather=True`` moves the row gathers OUT of the scan: the whole
    group's batches are materialised with one vectorised ``take`` before
    the scan, which then consumes contiguous slices.  Numerics identical
    (same rows, same order); it trades one group-sized HBM copy for the
    per-step dynamic-slice gathers — the A/B probing the fused-epoch
    residual (docs/KERNELS.md "Fused epochs": 75% of the FLOP-honest step
    ceiling with in-scan gathers).
    """
    train_step, eval_step = raw_step_fns
    axis = data_axis if mesh is not None else None

    def _gather_batch(feats_all, labels_all, inlen_all, lablen_all, p,
                      t_pad: int):
        feats = jnp.take(feats_all, p, axis=0)[:, :t_pad]
        labels = jnp.take(labels_all, p, axis=0)
        in_len = jnp.take(inlen_all, p, axis=0)
        lab_len = jnp.take(lablen_all, p, axis=0)
        frac = (in_len.astype(jnp.float32) if waveform
                else in_len.astype(jnp.float32) / jnp.float32(t_pad))
        return feats, frac, labels, lab_len

    def _pregather(feats_all, labels_all, inlen_all, lablen_all, pos,
                   t_pad: int):
        """(n, B) pos -> stacked (n, B, ...) batch arrays, one gather."""
        flat = pos.reshape(-1)
        nb = pos.shape
        feats = jnp.take(feats_all, flat, axis=0)[:, :t_pad].reshape(
            nb + (t_pad,) + feats_all.shape[2:])
        labels = jnp.take(labels_all, flat, axis=0).reshape(
            nb + labels_all.shape[1:])
        in_len = jnp.take(inlen_all, flat, axis=0).reshape(nb)
        lab_len = jnp.take(lablen_all, flat, axis=0).reshape(nb)
        frac = (in_len.astype(jnp.float32) if waveform
                else in_len.astype(jnp.float32) / jnp.float32(t_pad))
        return feats, frac, labels, lab_len

    def fused_train(state, feats_all, labels_all, inlen_all, lablen_all,
                    pos, mask, valid, rng, t_pad: int, compute_wer: bool):
        if pregather:
            gathered = _pregather(feats_all, labels_all, inlen_all,
                                  lablen_all, pos, t_pad)

        def body(carry, xs):
            i, m, v = xs

            def run(c):
                st, errs, toks = c
                if pregather:
                    feats, frac, labels, lab_len = jax.tree_util.tree_map(
                        lambda a: a[i], gathered)
                else:
                    feats, frac, labels, lab_len = _gather_batch(
                        feats_all, labels_all, inlen_all, lablen_all, i,
                        t_pad)
                st, loss, greedy_idx, input_sizes = train_step(
                    st, feats, frac, labels, lab_len, m, rng)
                if compute_wer:
                    e, t = _device_token_errors(
                        greedy_idx, input_sizes, labels, lab_len, m)
                    errs, toks = errs + e, toks + t
                return (st, errs, toks), loss

            def skip(c):
                return c, jnp.zeros((), jnp.float32)

            # `valid` is replicated, so every shard takes the same branch
            # and the collectives inside train_step stay in lockstep.
            return jax.lax.cond(v, run, skip, carry)

        xs0 = jnp.arange(pos.shape[0]) if pregather else pos
        zero = jnp.zeros((), jnp.int32)
        (state, errs, toks), losses = jax.lax.scan(
            body, (state, zero, zero), (xs0, mask, valid))
        if axis is not None:
            errs = jax.lax.psum(errs, axis)
            toks = jax.lax.psum(toks, axis)
        return state, losses, errs, toks

    def fused_eval(state, feats_all, labels_all, inlen_all, lablen_all,
                   pos, mask, valid, t_pad: int, compute_wer: bool):
        if pregather:
            gathered = _pregather(feats_all, labels_all, inlen_all,
                                  lablen_all, pos, t_pad)

        def body(carry, xs):
            i, m, v = xs

            def run(c):
                errs, toks = c
                if pregather:
                    feats, frac, labels, lab_len = jax.tree_util.tree_map(
                        lambda a: a[i], gathered)
                else:
                    feats, frac, labels, lab_len = _gather_batch(
                        feats_all, labels_all, inlen_all, lablen_all, i,
                        t_pad)
                loss, greedy_idx, input_sizes, _ = eval_step(
                    state, feats, frac, labels, lab_len, m)
                if compute_wer:
                    e, t = _device_token_errors(
                        greedy_idx, input_sizes, labels, lab_len, m)
                    errs, toks = errs + e, toks + t
                return (errs, toks), loss

            def skip(c):
                return c, jnp.zeros((), jnp.float32)

            return jax.lax.cond(v, run, skip, carry)

        xs0 = jnp.arange(pos.shape[0]) if pregather else pos
        zero = jnp.zeros((), jnp.int32)
        (errs, toks), losses = jax.lax.scan(
            body, (zero, zero), (xs0, mask, valid))
        if axis is not None:
            errs = jax.lax.psum(errs, axis)
            toks = jax.lax.psum(toks, axis)
        return losses, errs, toks

    if mesh is None:
        if _unjitted:
            return fused_train, fused_eval
        return (
            jax.jit(fused_train, static_argnums=(9, 10),
                    donate_argnums=(0,)),
            jax.jit(fused_eval, static_argnums=(8, 9)),
        )

    import functools

    from jax.sharding import PartitionSpec as P

    from ctc_pytorch_tpu.parallel.mesh import shard_map_compat

    repl, rows = P(), P(None, data_axis)

    def train_outer(state, feats_all, labels_all, inlen_all, lablen_all,
                    pos, mask, valid, rng, t_pad: int, compute_wer: bool):
        f = functools.partial(fused_train, t_pad=t_pad,
                              compute_wer=compute_wer)
        f = shard_map_compat(
            f, mesh,
            in_specs=(repl, repl, repl, repl, repl, rows, rows, repl, repl),
            out_specs=(repl, repl, repl, repl),
        )
        return f(state, feats_all, labels_all, inlen_all, lablen_all, pos,
                 mask, valid, rng)

    def eval_outer(state, feats_all, labels_all, inlen_all, lablen_all,
                   pos, mask, valid, t_pad: int, compute_wer: bool):
        f = functools.partial(fused_eval, t_pad=t_pad,
                              compute_wer=compute_wer)
        f = shard_map_compat(
            f, mesh,
            in_specs=(repl, repl, repl, repl, repl, rows, rows, repl),
            out_specs=(repl, repl, repl),
        )
        return f(state, feats_all, labels_all, inlen_all, lablen_all, pos,
                 mask, valid)

    if _unjitted:
        return train_outer, eval_outer
    return (
        jax.jit(train_outer, static_argnums=(9, 10), donate_argnums=(0,)),
        jax.jit(eval_outer, static_argnums=(8, 9)),
    )


def make_epoch_fns(raw_step_fns, mesh=None, data_axis: str = "data",
                   waveform: bool = False, pregather: bool = False):
    """Single-dispatch twin of :func:`make_fused_fns`: ONE jitted program
    chains every bucket group of the epoch, so the host issues exactly one
    device call (and one result fetch) per epoch instead of one per group.

    Motivation (docs/KERNELS.md "Fused epochs"): on a tunneled rig each
    dispatch blocks on an RPC round-trip (~25 ms); the per-group fused
    path still pays O(bucket shapes) of those per epoch, which is the
    entire measured residual vs the FLOP-honest step ceiling.  Chaining
    the groups inside one ``jit`` removes them: epoch wall-clock becomes
    compute + ONE round-trip (the reference's per-epoch timing contract is
    `timit/steps/train_ctc.py:229-230`).

    Numerics: per-group math is byte-identical to the per-group fused
    path (the same un-jitted group runners are traced); groups are chained
    in the caller's order.  The compiled program is keyed by the epoch's
    full group SIGNATURE — the ordered tuple of (t_pad, padded group
    length) — so callers should visit groups in a canonical order
    (``run_epoch_single`` sorts by t_pad) to keep the compiled set small.

    Returns ``(epoch_train, epoch_eval)``:

    - ``epoch_train(state, rng, groups, t_pads, compute_wer)`` ->
      ``(state, per-group losses tuple, errs, toks)``
    - ``epoch_eval(state, groups, t_pads, compute_wer)`` ->
      ``(per-group losses tuple, errs, toks)``

    where ``groups`` is a tuple of per-group 7-tuples matching
    ``fused_train``'s array arguments and ``t_pads`` the matching static
    lengths."""
    inner_train, inner_eval = make_fused_fns(
        raw_step_fns, mesh, data_axis, waveform=waveform,
        pregather=pregather, _unjitted=True)

    def epoch_train(state, rng, groups, t_pads: tuple, compute_wer: bool):
        outs = []
        errs = jnp.zeros((), jnp.int32)
        toks = jnp.zeros((), jnp.int32)
        for g, t_pad in zip(groups, t_pads):
            state, losses, e, t = inner_train(
                state, *g, rng, t_pad=t_pad, compute_wer=compute_wer)
            outs.append(losses)
            errs = errs + e
            toks = toks + t
        return state, tuple(outs), errs, toks

    def epoch_eval(state, groups, t_pads: tuple, compute_wer: bool):
        outs = []
        errs = jnp.zeros((), jnp.int32)
        toks = jnp.zeros((), jnp.int32)
        for g, t_pad in zip(groups, t_pads):
            losses, e, t = inner_eval(
                state, *g, t_pad=t_pad, compute_wer=compute_wer)
            outs.append(losses)
            errs = errs + e
            toks = toks + t
        return tuple(outs), errs, toks

    return (
        jax.jit(epoch_train, static_argnums=(3, 4), donate_argnums=(0,)),
        jax.jit(epoch_eval, static_argnums=(2, 3)),
    )


def _pad_group(pos: np.ndarray, mask: np.ndarray):
    """Pad a group's (n, B) pos/mask to the next power-of-two n with
    valid=False rows, so quantized-mode epochs reuse a small compiled set
    of scan lengths instead of recompiling per (t_pad, count)."""
    k = pos.shape[0]
    n = 1 << max(k - 1, 0).bit_length()
    valid = np.zeros((n,), bool)
    valid[:k] = True
    if n == k:
        return pos, mask, valid
    pad = n - k
    pos = np.concatenate([pos, np.repeat(pos[-1:], pad, axis=0)])
    mask = np.concatenate(
        [mask, np.zeros((pad,) + mask.shape[1:], mask.dtype)])
    return pos, mask, valid


def run_epoch_fused(
    epoch_id: int,
    fused_fns,
    state: TrainState,
    loader,
    *,
    training: bool,
    rng: Optional[jax.Array] = None,
    compute_wer: bool = True,
    log=print,
) -> Tuple[TrainState, float, float]:
    """`run_epoch` over a ``DeviceCachedLoader`` with one dispatch per
    bucket group (``epoch_groups``); same return contract.  Progress is
    logged once per GROUP, not per ``verbose_step`` batches — the host
    only sees group boundaries (one to a few lines per epoch)."""
    fused_train, fused_eval = fused_fns
    loss_sum = 0.0
    n_batches = 0
    errs = toks = 0
    for arrs, pos, mask, t_pad in loader.epoch_groups(loader.epoch):
        k = pos.shape[0]
        pos, mask, valid = _pad_group(pos, mask)
        args = (arrs["feats"], arrs["labels"], arrs["in_len"],
                arrs["lab_len"], jnp.asarray(pos), jnp.asarray(mask),
                jnp.asarray(valid))
        if training:
            state, losses, e, t = fused_train(
                state, *args, rng, t_pad, compute_wer)
        else:
            losses, e, t = fused_eval(state, *args, t_pad, compute_wer)
        vals = np.asarray(losses)[:k]
        loss_sum += float(vals.sum())
        n_batches += k
        errs += int(e)
        toks += int(t)
        if training:
            log(
                f"Epoch = {epoch_id}, step = {n_batches}, "
                f"cur_loss = {float(vals.mean()):.4f}, "
                f"total_loss = {loss_sum / n_batches:.4f}, "
                f"total_wer = {errs / (toks + 1e-9):.4f}"
            )
    avg_loss = loss_sum / max(n_batches, 1)
    acc = 1.0 - errs / (toks + 1e-9)
    tag = "Train" if training else "Valid"
    log(f"Epoch {epoch_id} {tag} done, total_loss: {avg_loss:.4f}, "
        f"total_wer: {1.0 - acc:.4f}")
    return state, acc, avg_loss


def run_epoch_single(
    epoch_id: int,
    epoch_fns,
    state: TrainState,
    loader,
    *,
    training: bool,
    rng: Optional[jax.Array] = None,
    compute_wer: bool = True,
    log=print,
) -> Tuple[TrainState, float, float]:
    """``run_epoch_fused`` through :func:`make_epoch_fns`: the WHOLE epoch
    is one jitted call and one result fetch.  Same return contract; the
    per-group progress lines collapse to the single epoch summary (the
    host has nothing to print until the one dispatch returns).

    Groups are visited in t_pad order (canonical), not first-appearance
    order: the compiled program is keyed by the ordered group signature,
    and a shuffle-dependent order would recompile per epoch.  Like the
    per-group fused path this only permutes batch VISITING order within
    the epoch; per-batch math is unchanged."""
    epoch_train, epoch_eval = epoch_fns
    groups, t_pads, ks = [], [], []
    for arrs, pos, mask, t_pad in sorted(
        loader.epoch_groups(loader.epoch), key=lambda g: g[3]
    ):
        ks.append(pos.shape[0])
        pos, mask, valid = _pad_group(pos, mask)
        groups.append((arrs["feats"], arrs["labels"], arrs["in_len"],
                       arrs["lab_len"], jnp.asarray(pos), jnp.asarray(mask),
                       jnp.asarray(valid)))
        t_pads.append(int(t_pad))
    if not groups:
        tag = "Train" if training else "Valid"
        log(f"Epoch {epoch_id} {tag} done, total_loss: 0.0000, "
            f"total_wer: 0.0000")
        return state, 1.0, 0.0
    if training:
        state, losses, errs, toks = epoch_train(
            state, rng, tuple(groups), tuple(t_pads), compute_wer)
    else:
        losses, errs, toks = epoch_eval(
            state, tuple(groups), tuple(t_pads), compute_wer)
    loss_sum = 0.0
    n_batches = 0
    for vals, k in zip(losses, ks):
        vals = np.asarray(vals)[:k]
        loss_sum += float(vals.sum())
        n_batches += k
    errs, toks = int(errs), int(toks)
    avg_loss = loss_sum / max(n_batches, 1)
    acc = 1.0 - errs / (toks + 1e-9)
    tag = "Train" if training else "Valid"
    if training:
        log(
            f"Epoch = {epoch_id}, step = {n_batches}, "
            f"total_loss = {avg_loss:.4f}, "
            f"total_wer = {errs / (toks + 1e-9):.4f}"
        )
    log(f"Epoch {epoch_id} {tag} done, total_loss: {avg_loss:.4f}, "
        f"total_wer: {1.0 - acc:.4f}")
    return state, acc, avg_loss


@jax.jit
def _device_token_errors(greedy_idx, input_sizes, labels, label_lens, mask):
    """Greedy collapse + edit distance + masked sums, all on device.

    Per-step WER with ZERO host fetches: the epoch loop accumulates the
    returned (errs, toks) device scalars and fetches once per print/epoch.
    (The host variant below cost two device->host round-trips per step,
    which dominated the WER-on epoch rate on high-latency rigs.)"""
    from ctc_pytorch_tpu.ops.editdistance import padded_edit_distance_device

    tokens, lens = greedy_collapse(greedy_idx, input_sizes)
    dists = padded_edit_distance_device(labels, label_lens, tokens, lens)
    keep = mask > 0
    errs = jnp.sum(jnp.where(keep, dists, 0))
    toks = jnp.sum(jnp.where(keep, label_lens, 0))
    return errs, toks


def run_epoch(
    epoch_id: int,
    step_fns,
    state: TrainState,
    loader,
    *,
    training: bool,
    rng: Optional[jax.Array] = None,
    print_every: int = 50,
    compute_wer: bool = True,
    waveform: bool = False,
    log=print,
) -> Tuple[TrainState, float, float]:
    """One pass; returns (state, accuracy=1-wer, average_loss) like
    ``run_epoch`` (``train_ctc.py:26-69``)."""
    train_jit, eval_jit = step_fns
    device_losses = []  # defer host syncs: fetch only at print/epoch points
    cur_start = 0
    fetched_sum = 0.0  # running sum of already-fetched losses
    total_errs = jnp.zeros((), jnp.int32)  # device accumulators
    total_tokens = jnp.zeros((), jnp.int32)
    n_batches = 0
    for i, batch in enumerate(loader):
        feats = jnp.asarray(batch.feats)
        # waveform-in: the frac slot carries valid sample counts instead
        frac = jnp.asarray(
            batch.input_lengths.astype(np.float32) if waveform
            else batch.input_frac
        )
        labels = jnp.asarray(batch.labels)
        label_lens = jnp.asarray(batch.label_lengths)
        mask = jnp.asarray(batch.example_mask)
        if training:
            state, loss, greedy_idx, input_sizes = train_jit(
                state, feats, frac, labels, label_lens, mask, rng
            )
        else:
            loss, greedy_idx, input_sizes, _ = eval_jit(
                state, feats, frac, labels, label_lens, mask
            )
        device_losses.append(loss)
        n_batches += 1
        if compute_wer:
            errs, toks = _device_token_errors(
                greedy_idx, input_sizes, labels, label_lens, mask,
            )
            total_errs = total_errs + errs
            total_tokens = total_tokens + toks
        if training and (i + 1) % print_every == 0:
            vals = [float(l) for l in device_losses[cur_start:]]
            fetched_sum += sum(vals)  # each device scalar fetched ONCE
            log(
                f"Epoch = {epoch_id}, step = {i + 1}, "
                f"cur_loss = {sum(vals) / max(len(vals), 1):.4f}, "
                f"total_loss = {fetched_sum / (i + 1):.4f}, "
                f"total_wer = {float(total_errs) / (float(total_tokens) + 1e-9):.4f}"
            )
            cur_start = len(device_losses)
    total_loss = fetched_sum + sum(float(l) for l in device_losses[cur_start:])
    avg_loss = total_loss / max(n_batches, 1)
    acc = 1.0 - float(total_errs) / (float(total_tokens) + 1e-9)
    tag = "Train" if training else "Valid"
    log(f"Epoch {epoch_id} {tag} done, total_loss: {avg_loss:.4f}, "
        f"total_wer: {1.0 - acc:.4f}")
    return state, acc, avg_loss


class Trainer:
    """Full training driver with plateau scheduling and checkpointing."""

    def __init__(
        self,
        cfg: Config,
        spec: ModelSpec,
        mesh=None,
        out_dir: Optional[str] = None,
        frontend_fn=None,
    ):
        self.cfg = cfg
        self.spec = spec
        self.mesh = mesh
        self.frontend_fn = frontend_fn
        key = jax.random.PRNGKey(cfg.seed)
        self.init_key, self.dropout_key = jax.random.split(key)
        self.state, self.tx = create_train_state(
            self.init_key, spec, cfg.init_lr, cfg.weight_decay, cfg.grad_clip
        )
        if mesh is not None:
            from ctc_pytorch_tpu.parallel import replicate

            self.state = replicate(self.state, mesh)
        fns = make_step_fns(spec, self.tx, mesh, cfg.data_axis,
                            frontend_fn=frontend_fn,
                            ctc_impl=cfg.ctc_impl, return_raw=True)
        self.step_fns = fns[:2]
        # fused per-bucket-group epoch runners (cfg.fused_epoch): host
        # dispatch leaves the hot path.  Composes with a data mesh (the
        # fused scan runs under shard_map, pos/mask batch-sharded) AND
        # with waveform-in (the cached gather passes sample counts through
        # the frac slot for the in-step frontend to rewrite).
        self.fused_fns = (
            make_fused_fns(fns[2:], mesh, cfg.data_axis,
                           waveform=frontend_fn is not None,
                           pregather=cfg.fused_pregather)
            if cfg.fused_epoch
            else None
        )
        if cfg.fused_dispatch not in ("group", "epoch"):
            raise ValueError(
                f"fused_dispatch must be 'group' or 'epoch', "
                f"got {cfg.fused_dispatch!r}")
        # cfg.fused_dispatch == "epoch": the whole epoch as ONE jitted
        # call (make_epoch_fns) — one dispatch + one fetch per epoch
        self.epoch_fns = (
            make_epoch_fns(fns[2:], mesh, cfg.data_axis,
                           waveform=frontend_fn is not None,
                           pregather=cfg.fused_pregather)
            if cfg.fused_epoch and cfg.fused_dispatch == "epoch"
            else None
        )
        self.scheduler = PlateauScheduler(
            end_adjust_acc=cfg.end_adjust_acc, lr_decay=cfg.lr_decay,
            mode=cfg.scheduler_mode,
        )
        self.out_dir = Path(out_dir or Path(cfg.checkpoint_dir) / cfg.exp_name)
        self.logger = MetricsLogger(self.out_dir)
        self.histories: Dict[str, list] = {
            "loss_results": [], "dev_loss_results": [], "dev_cer_results": []
        }
        if cfg.dev_over_train:
            # 863-mode: per-epoch eval over the training set
            # (my_863_corpus/steps/cnn_lstm_ctc.py:203-206)
            self.histories["training_cer_results"] = []
        self._rollback = snapshot(self.state)
        self._best = snapshot(self.state)
        self.epoch = 0
        self._decay_next = False

    def _run_fused(self, loader, *, training, rng=None, compute_wer=True,
                   log=print):
        """Dispatch one fused pass at the configured granularity."""
        if self.epoch_fns is not None:
            return run_epoch_single(
                self.epoch, self.epoch_fns, self.state, loader,
                training=training, rng=rng, compute_wer=compute_wer, log=log)
        return run_epoch_fused(
            self.epoch, self.fused_fns, self.state, loader,
            training=training, rng=rng, compute_wer=compute_wer, log=log)

    def fit(
        self,
        train_loader,
        dev_loader,
        num_epoches: Optional[int] = None,
        compute_wer: bool = True,
        log=print,
    ) -> Path:
        cfg = self.cfg
        num_epoches = num_epoches or cfg.num_epoches
        stop = False
        while not stop and self.epoch < num_epoches:
            self.epoch += 1
            if self._decay_next:
                self.state = TrainState(
                    self.state.step, self.state.params, self.state.model_state,
                    scale_lr(self.state.opt_state, cfg.lr_decay),
                )
                self._decay_next = False
            lr = get_lr(self.state.opt_state)
            log(f"Start training epoch: {self.epoch}, learning_rate: {lr:.5f}")
            t0 = time.time()
            train_loader.set_epoch(self.epoch)
            wf = self.frontend_fn is not None
            from ctc_pytorch_tpu.train.metrics_log import profile_ctx

            fuse_train = self.fused_fns is not None and hasattr(
                train_loader, "epoch_groups")
            fuse_dev = self.fused_fns is not None and hasattr(
                dev_loader, "epoch_groups")
            if cfg.fused_epoch and not fuse_train and self.epoch == 1:
                log(
                    "fused_epoch requested but running the streaming "
                    f"path: {type(train_loader).__name__} has no "
                    "epoch_groups (a DeviceCachedLoader is required)"
                )
            with profile_ctx(cfg.profile and self.epoch == 1,
                             self.out_dir / "profile"):
                if fuse_train:
                    self.state, train_acc, train_loss = self._run_fused(
                        train_loader, training=True, rng=self.dropout_key,
                        compute_wer=compute_wer, log=log,
                    )
                else:
                    self.state, train_acc, train_loss = run_epoch(
                        self.epoch, self.step_fns, self.state, train_loader,
                        training=True, rng=self.dropout_key,
                        print_every=cfg.verbose_step, compute_wer=compute_wer,
                        waveform=wf, log=log,
                    )
            if cfg.dev_over_train:
                # reference 863 loop: a separate dev() pass over the
                # TRAINING set each epoch; its accuracy*100 is the printed
                # "cer on training set" (sic — the reference mislabels
                # accuracy as cer, preserved for comparability)
                if fuse_train:
                    _, tr_eval_acc, _ = self._run_fused(
                        train_loader, training=False, compute_wer=True,
                        log=log,
                    )
                else:
                    _, tr_eval_acc, _ = run_epoch(
                        self.epoch, self.step_fns, self.state, train_loader,
                        training=False, compute_wer=True, waveform=wf,
                        log=log,
                    )
                log(f"cer on training set is {tr_eval_acc * 100:.4f}")
                self.histories["training_cer_results"].append(
                    tr_eval_acc * 100
                )
            if fuse_dev:
                _, dev_acc, dev_loss = self._run_fused(
                    dev_loader, training=False, compute_wer=compute_wer,
                    log=log,
                )
            else:
                _, dev_acc, dev_loss = run_epoch(
                    self.epoch, self.step_fns, self.state, dev_loader,
                    training=False, compute_wer=compute_wer, waveform=wf,
                    log=log,
                )
            self.histories["loss_results"].append(train_loss)
            self.histories["dev_loss_results"].append(dev_loss)
            self.histories["dev_cer_results"].append(dev_acc)

            decision = self.scheduler.update(
                dev_loss, dev_acc,
                allow_adjust=self.epoch > cfg.least_train_epoch,
            )
            if decision.snapshot:
                self._rollback = snapshot(self.state)
            if decision.snapshot_best:
                self._best = snapshot(self.state)
            if decision.rollback:
                # restore params+optimizer, keep scheduler counters
                self.state = snapshot(self._rollback)
            if decision.decay_lr:
                self._decay_next = True
            stop = decision.stop

            self.logger.log({
                "epoch": self.epoch, "lr": lr,
                "train_loss": train_loss, "train_acc": train_acc,
                "dev_loss": dev_loss, "dev_acc": dev_acc,
                "epoch_minutes": (time.time() - t0) / 60.0,
                "adjust_time": self.scheduler.adjust_time,
                "rollback": decision.rollback, "decay_lr": decision.decay_lr,
                "snapshot": decision.snapshot,
            })
            if cfg.save_every and self.epoch % cfg.save_every == 0:
                self.save_resume_checkpoint()
        return self.save_best()

    # -- persistence ----------------------------------------------------
    def save_best(self) -> Path:
        path = self.out_dir / "ctc_best_model.npz"
        # TIMIT reloads the best-dev-acc snapshot before saving
        # (train_ctc.py:240-242); the 863 recipe saves the live model at
        # loop end — i.e. the last rollback snapshot when stopping via
        # adjust_time==8 (cnn_lstm_ctc.py:256-260)
        state = self.state if self.cfg.scheduler_mode == "acc" else self._best
        ckpt.save_package(
            path, self.spec, state, config=self.cfg,
            scheduler_state=self.scheduler.state_dict(), epoch=self.epoch,
            **self.histories,
        )
        return path

    def save_resume_checkpoint(self) -> Path:
        path = self.out_dir / f"resume_ep{self.epoch:04d}.npz"
        ckpt.save_package(
            path, self.spec, self.state, config=self.cfg,
            scheduler_state=self.scheduler.state_dict(), epoch=self.epoch,
            **self.histories,
        )
        return path

    def resume(self, path) -> None:
        self.state, manifest = ckpt.restore_train_state(path, self.state)
        if manifest.get("scheduler"):
            self.scheduler = PlateauScheduler.from_state_dict(
                manifest["scheduler"]
            )
        self.epoch = manifest.get("epoch") or 0
        for k in self.histories:
            self.histories[k] = manifest.get(k, [])
        self._rollback = snapshot(self.state)
        self._best = snapshot(self.state)
