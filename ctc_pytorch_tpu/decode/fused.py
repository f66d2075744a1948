"""Fused stage-4 decode: one jitted dispatch per bucket group.

The reference's decode loop streams host batches through the model one at
a time (``timit/steps/test_ctc.py:69-112``); measured honestly through the
real loader, per-batch host streaming + dispatch made the round-4 stage-4
greedy RTF 4.4x the kernel-level forward+collapse RTF.  This module gives
eval/decode the same treatment the training loop got (DeviceCachedLoader +
per-group fused scans, ``train/loop.py``): all same-shape batches of the
epoch run as ONE ``lax.scan`` — gather rows from the device-resident
cache, forward, greedy-collapse (or the on-device beam search) — with a
single host fetch of the packed token matrix per group.

Unlike the training scans, groups are NOT padded to power-of-two lengths:
stage-4 is a single pass with no per-epoch reshuffle, so each (t_pad, n)
shape compiles exactly once either way and padding would only burn compute.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctc_pytorch_tpu.decode.greedy import greedy_collapse
from ctc_pytorch_tpu.models import CTCModel


def make_fused_decode_fn(
    spec,
    params,
    mstate,
    *,
    mode: str = "greedy",
    blank: int = 0,
    beam_width: int = 10,
    beam_max_len: int = 96,
    lm_table: Optional[np.ndarray] = None,
    lm_alpha: float = 0.0,
):
    """Jitted group decoder: (feats_all, inlen_all, pos, t_pad) ->
    (tokens (n, B, L), lens (n, B)).

    ``pos`` is a (n, B) int32 matrix of row positions into the cached
    bucket planes (``DeviceCachedLoader.epoch_groups``); ``t_pad`` is the
    group's static padded length.  ``mode`` is 'greedy' (argmax + collapse,
    L = post-model T) or 'beam' (``batched_beam_search``, L = beam_max_len).
    """
    if mode not in ("greedy", "beam"):
        raise ValueError(f"unknown fused decode mode: {mode!r}")
    lm = jnp.asarray(lm_table, jnp.float32) if lm_table is not None else None

    @functools.partial(jax.jit, static_argnums=(3,))
    def group_decode(feats_all, inlen_all, pos, t_pad):
        def body(_, p):
            feats = jnp.take(feats_all, p, axis=0)[:, :t_pad]
            in_len = jnp.take(inlen_all, p, axis=0)
            frac = in_len.astype(jnp.float32) / jnp.float32(t_pad)
            # frac feeds the padding-masked BN planes (pad_dynamics 'valid'
            # / 'batchmax' packages; no-op for 'padded')
            log_probs, _ = CTCModel.apply(spec, params, mstate, feats,
                                          frac=frac)
            sizes = CTCModel.input_sizes(
                spec, frac, feats.shape[1], log_probs.shape[0]
            )
            if mode == "greedy":
                idx = jnp.argmax(log_probs, axis=-1).T  # (B, T_out)
                tokens, lens = greedy_collapse(idx, sizes, blank)
            else:
                from ctc_pytorch_tpu.decode.beam_device import (
                    batched_beam_search,
                )

                probs = jnp.exp(log_probs).transpose(1, 0, 2)
                tokens, lens, _ = batched_beam_search(
                    probs, sizes, beam_width=beam_width,
                    max_len=beam_max_len, blank=blank, lm_table=lm,
                    lm_alpha=lm_alpha,
                )
            return (), (tokens.astype(jnp.int32), lens.astype(jnp.int32))

        _, (tokens, lens) = jax.lax.scan(body, (), pos)
        return tokens, lens

    def fused(arrs, pos, t_pad: int):
        return group_decode(arrs["feats"], arrs["in_len"],
                            jnp.asarray(pos, jnp.int32), int(t_pad))

    return fused
