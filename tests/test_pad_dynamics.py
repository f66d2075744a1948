"""pad_dynamics='batchmax': reference-exact per-batch-max training dynamics
at static padded shapes.

The PARITY_RUN.md padding ladder measured that padding overshoot beyond the
reference's per-batch-max padding (``create_input``, data_loader.py:119-140)
is a real accuracy knob at hard regimes: the reference's BN planes normalise
padding too (``model_ctc.py:29-32``), so its training dynamics depend on how
much padding the batch carries.  'batchmax' removes the knob without giving
up static shapes: BN statistics stop at the batch's true max length (a
traced scalar), everything beyond is zeroed (bias-free RNNs then carry exact
zero state, ``model_ctc.py:24-25``), the conv stack masks per layer through
its own floor arithmetic, and the loss's fractional-length rescale
recomputes ``len/batch_max * T_out(batch_max)`` in the reference's own
float32 ops (``train_ctc.py:46``).

The tests prove the defining property directly: a batch padded PAST its max
(with a repeat-padded ragged row) produces the same loss, gradients and BN
running statistics as the genuinely-smaller batch padded exactly to its max
— i.e. quantized/bucketed batching with ANY boundary count trains exactly
like ``num_buckets: 0``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctc_pytorch_tpu.config import CNNConfig
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.ops import ctc_loss


def _spec(add_cnn: bool, pd: str) -> ModelSpec:
    cnn = (
        CNNConfig(
            add_cnn=True, layers=2,
            channel=[(1, 4), (4, 4)], kernel_size=[(3, 3), (3, 3)],
            stride=[(1, 2), (2, 2)], padding=[(1, 1), (1, 1)],
            pooling=None, activation_function="relu", batch_norm=True,
        )
        if add_cnn else CNNConfig()
    )
    return ModelSpec(
        add_cnn=add_cnn, cnn=cnn, rnn_input_size=12, rnn_hidden_size=16,
        rnn_layers=2, rnn_cell="lstm", bidirectional=True, batch_norm=True,
        num_class=7, drop_out=0.0, compute_dtype="float32",
        use_pallas_rnn=False, pad_dynamics=pd,
    )


_LENS = np.array([12, 17], np.int32)
_LABELS = np.array([[1, 2, 3], [2, 4, 5]], np.int32)
_LAB_LENS = np.array([3, 3], np.int32)


def _run(sp: ModelSpec, t_pad: int, reps, em):
    """Loss/grads/new-state for rows ``reps`` padded to ``t_pad``."""
    rng = np.random.RandomState(0)
    feats = [rng.randn(l, 12).astype(np.float32) for l in _LENS]
    b = len(reps)
    x = np.zeros((b, t_pad, 12), np.float32)
    ls = np.array([_LENS[r] for r in reps], np.int32)
    for i, r in enumerate(reps):
        x[i, : _LENS[r]] = feats[r]
    frac = jnp.asarray(ls / np.float32(t_pad))
    emj = jnp.asarray(np.asarray(em, np.float32))
    labs = jnp.asarray(np.stack([_LABELS[r] for r in reps]))
    lls = jnp.asarray(np.array([_LAB_LENS[r] for r in reps], np.int32))
    params, state = CTCModel.init(jax.random.PRNGKey(0), sp)

    def loss_fn(p):
        out = CTCModel.apply(
            sp, p, state, jnp.asarray(x), train=True,
            rng=jax.random.PRNGKey(7), frac=frac, example_mask=emj,
        )
        lp = out[0]
        sizes = CTCModel.input_sizes(
            sp, frac, t_pad, lp.shape[0], example_mask=emj
        )
        nll = ctc_loss(lp, labs, sizes, lls, reduction="none")
        return jnp.sum(nll * emj) / jnp.sum(emj), (out[1], sizes)

    (loss, (st, sizes)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    return float(loss), grads, st, np.asarray(sizes)


@pytest.mark.parametrize("add_cnn", [
    False,
    # the conv-stack masking chain compiles a much larger graph; slow tier
    pytest.param(True, marks=pytest.mark.slow),
])
def test_batchmax_equals_true_batchmax_padding(add_cnn):
    """Overshoot-padded batch + repeat row under 'batchmax' == the genuine
    smaller batch padded exactly to its max under 'padded' (the reference's
    own configuration): loss, every gradient leaf, every BN running stat."""
    l_a, g_a, st_a, sz_a = _run(_spec(add_cnn, "batchmax"), 24,
                                [0, 1, 1], [1, 1, 0])
    l_b, g_b, st_b, sz_b = _run(_spec(add_cnn, "padded"), 17,
                                [0, 1], [1, 1])
    np.testing.assert_array_equal(sz_a[:2], sz_b)
    assert abs(l_a - l_b) < 1e-5
    for ga, gb in zip(jax.tree_util.tree_leaves(g_a),
                      jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)
    for sa, sb in zip(jax.tree_util.tree_leaves(st_a),
                      jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-5, atol=1e-6)


def test_batchmax_padding_invariant_across_boundaries():
    """The same batch at two different bucket boundaries trains identically
    under 'batchmax' (the property 'padded' lacks, PARITY_RUN.md ladder)."""
    l_a, g_a, st_a, _ = _run(_spec(False, "batchmax"), 20, [0, 1], [1, 1])
    l_b, g_b, st_b, _ = _run(_spec(False, "batchmax"), 32, [0, 1], [1, 1])
    assert abs(l_a - l_b) < 1e-5
    for ga, gb in zip(jax.tree_util.tree_leaves(g_a),
                      jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)


def test_padded_mode_is_boundary_sensitive():
    """Sanity: under 'padded' the same comparison must differ — otherwise
    the invariance above proves nothing."""
    l_a, _, _, _ = _run(_spec(False, "padded"), 20, [0, 1], [1, 1])
    l_b, _, _, _ = _run(_spec(False, "padded"), 32, [0, 1], [1, 1])
    assert abs(l_a - l_b) > 1e-4


def test_input_sizes_reference_float32_arith():
    """'batchmax' reproduces create_input (data_loader.py:137) +
    train_ctc.py:46 bit-for-bit: frac = len/batch_max in float32, then
    (frac * T_out).long() truncation — including the truncate-below-true
    quirk for lengths that don't round-trip in float32."""
    sp = _spec(False, "batchmax")
    lens = np.array([7, 9, 9], np.int32)  # f32(7/9)*9 truncates to 6
    t_pad = 16
    frac = jnp.asarray(lens / np.float32(t_pad))
    sizes = np.asarray(CTCModel.input_sizes(sp, frac, t_pad, t_pad))
    ref = (
        (lens.astype(np.float32) / np.float32(9)) * np.float32(9)
    ).astype(np.int64)
    np.testing.assert_array_equal(sizes, ref)


@pytest.mark.slow
def test_trainer_quantized_batchmax_equals_reference_exact():
    """End-to-end: a few epochs through the real step/loop at quantized
    boundaries under 'batchmax' track num_buckets=0 ('padded') losses —
    same composition (BucketBatcher shuffles the full order first in both
    modes), so per-epoch mean losses must agree to float noise."""
    from ctc_pytorch_tpu.data.batching import SpeechDataLoader
    from ctc_pytorch_tpu.train.loop import make_step_fns, run_epoch
    from ctc_pytorch_tpu.train.state import create_train_state

    class _DS:
        def __init__(self, n=24, seed=3):
            r = np.random.RandomState(seed)
            self._lens = r.randint(8, 25, size=n)
            self._feats = [r.randn(l, 12).astype(np.float32)
                           for l in self._lens]
            self._labels = [r.randint(1, 7, size=r.randint(2, 5)).tolist()
                            for _ in range(n)]
            self.items = [(f"u{i}", None) for i in range(n)]

        def __len__(self):
            return len(self._lens)

        def lengths(self):
            return np.asarray(self._lens)

        def label_lengths(self):
            return np.asarray([len(l) for l in self._labels])

        def __getitem__(self, i):
            return self._feats[i], self._labels[i], f"u{i}"

    import optax

    losses = {}
    for mode, buckets in (("batchmax", 4), ("padded", 0)):
        sp = _spec(False, mode)
        state, tx = create_train_state(jax.random.PRNGKey(0), sp, 1e-3, 0.0)
        fns = make_step_fns(sp, tx)
        loader = SpeechDataLoader(_DS(), 8, shuffle=True,
                                  num_buckets=buckets, seed=5)
        per_epoch = []
        for ep in range(1, 4):
            loader.set_epoch(ep)
            state, loss, _ = run_epoch(
                ep, fns[:2], state, loader, training=True,
                rng=jax.random.PRNGKey(11), compute_wer=False,
                log=lambda *a: None,
            )
            per_epoch.append(loss)
        losses[mode] = per_epoch
    np.testing.assert_allclose(losses["batchmax"], losses["padded"],
                               rtol=2e-4)
