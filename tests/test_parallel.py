"""Data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.parallel import make_mesh, replicate, shard_batch
from ctc_pytorch_tpu.train.loop import make_step_fns
from ctc_pytorch_tpu.train.state import create_train_state


def _cfg():
    cfg = Config()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.rnn_input_size = 8
    cfg.rnn_hidden_size = 8
    cfg.rnn_layers = 1
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    return cfg


def _batch(b, t=16, f=8, l=4, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(b, t, f).astype(np.float32),
        np.ones((b,), np.float32),
        rng.randint(1, 5, size=(b, l)).astype(np.int32),
        np.full((b,), l, np.int32),
        np.ones((b,), np.float32),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_step_matches_single_device():
    cfg = _cfg()
    spec = ModelSpec.from_config(cfg, num_class=5)
    arrays = _batch(8)

    # single-device result
    state1, tx = create_train_state(jax.random.PRNGKey(0), spec, 1e-3)
    train1, _ = make_step_fns(spec, tx)
    key = jax.random.PRNGKey(1)
    new1, loss1, _, _ = train1(state1, *map(jnp.asarray, arrays), key)

    # 8-device mesh result
    mesh = make_mesh()
    state8, tx8 = create_train_state(jax.random.PRNGKey(0), spec, 1e-3)
    state8 = replicate(state8, mesh)
    train8, _ = make_step_fns(spec, tx8, mesh)
    sharded = shard_batch(arrays, mesh)
    new8, loss8, _, _ = train8(state8, *sharded, replicate(key, mesh))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_mesh_dropout_masks_decorrelated_across_shards():
    """The replicated dropout key must be folded with the shard index.

    Regression: without the axis_index fold-in, rows at the same local
    index of every shard get IDENTICAL dropout masks.  With all batch rows
    identical and heavy dropout, per-row outputs must now differ across
    shards (and stay identical with dropout off)."""
    cfg = _cfg()
    cfg.rnn_hidden_size = 16
    spec = ModelSpec.from_config(cfg, num_class=5)
    feats, frac, labels, label_lens, mask = _batch(8, t=24)
    feats[:] = feats[:1]  # every row identical
    labels[:] = labels[:1]

    mesh = make_mesh()
    key = jax.random.PRNGKey(3)

    import dataclasses

    for drop, expect_equal in [(0.8, False), (0.0, True)]:
        spec_d = dataclasses.replace(spec, drop_out=drop)
        state, tx = create_train_state(jax.random.PRNGKey(0), spec_d, 1e-3)
        state = replicate(state, mesh)
        train8, _ = make_step_fns(spec_d, tx, mesh)
        sharded = shard_batch((feats, frac, labels, label_lens, mask), mesh)
        _, _, greedy_idx, _ = train8(state, *sharded, replicate(key, mesh))
        g = np.asarray(greedy_idx)
        rows_equal = all(np.array_equal(g[0], g[i]) for i in range(1, 8))
        assert rows_equal == expect_equal, (
            f"drop={drop}: rows_equal={rows_equal}"
        )


def test_mesh_eval_log_probs_assembled_on_batch_axis():
    """eval_jit's log_probs out-spec must shard axis 1 (batch), not time.

    Regression: P('data') on the time-major (T', B, C) output stacked the
    shards along time, giving (n*T', B/n, C) garbage."""
    cfg = _cfg()
    spec = ModelSpec.from_config(cfg, num_class=5)
    arrays = _batch(8, t=16)

    state1, tx = create_train_state(jax.random.PRNGKey(0), spec, 1e-3)
    _, eval1 = make_step_fns(spec, tx)
    loss1, _, sizes1, lp1 = eval1(state1, *map(jnp.asarray, arrays))

    mesh = make_mesh()
    state8, tx8 = create_train_state(jax.random.PRNGKey(0), spec, 1e-3)
    state8 = replicate(state8, mesh)
    _, eval8 = make_step_fns(spec, tx8, mesh)
    loss8, _, sizes8, lp8 = eval8(state8, *shard_batch(arrays, mesh))

    assert lp8.shape == lp1.shape  # (T', B, C)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lp1), np.asarray(lp8), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 48  # 96 frames -> conv time stride 2 -> 48
    assert np.isfinite(np.asarray(out)).all()


def test_cmvn_psum_on_mesh():
    """Global CMVN stats via psum across the data axis == host reduction."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ctc_pytorch_tpu.frontend.cmvn import (
        accumulate_cmvn, finalize_cmvn, init_cmvn,
    )

    rng = np.random.RandomState(0)
    feats = rng.randn(8, 10, 4).astype(np.float32)
    mask = (rng.rand(8, 10) > 0.2).astype(np.float32)

    mean_h, inv_h = finalize_cmvn(
        accumulate_cmvn(init_cmvn(4), jnp.asarray(feats), jnp.asarray(mask))
    )

    mesh = make_mesh()
    from jax import shard_map

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=(P(), P(), P()),
    )
    def stats_fn(f, m):
        s = accumulate_cmvn(init_cmvn(4), f, m, axis_name="data")
        return s.count[None], s.sum[None], s.sumsq[None]

    count, ssum, ssq = stats_fn(jnp.asarray(feats), jnp.asarray(mask))
    from ctc_pytorch_tpu.frontend.cmvn import CmvnStats

    mean_d, inv_d = finalize_cmvn(
        CmvnStats(count[0], ssum[0], ssq[0])
    )
    np.testing.assert_allclose(np.asarray(mean_h), np.asarray(mean_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inv_h), np.asarray(inv_d), rtol=1e-4)
