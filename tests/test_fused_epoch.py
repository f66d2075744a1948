"""Fused multi-step epochs over the device cache.

`run_epoch_fused` runs each bucket-shape group of an epoch as ONE jitted
lax.scan (gather + step + metric accumulation on device), so the host
dispatches O(buckets) calls instead of O(batches).  These tests pin:

- `DeviceCachedLoader.epoch_groups` covers exactly the batches `__iter__`
  yields (same composition, grouped order);
- a single-bucket corpus (grouped order == streaming order) trains to the
  SAME final params / loss / token-error as the streaming `run_epoch`;
- the multi-bucket fused path stays finite and counts every batch;
- `Trainer` picks the fused path when `cfg.fused_epoch` is set.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.data.batching import DeviceCachedLoader, SpeechDataLoader
from ctc_pytorch_tpu.data.dataset import SpeechDataset
from ctc_pytorch_tpu.data.kaldi_io import ArkWriter
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train.loop import (
    make_fused_fns,
    make_step_fns,
    run_epoch,
    run_epoch_fused,
)
from ctc_pytorch_tpu.train.state import create_train_state
from ctc_pytorch_tpu.vocab import Vocab


def _corpus(tmp_path, n=14, dim=7, varied=True, seed=0):
    rng = np.random.RandomState(seed)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with ArkWriter(ark, scp) as w:
        for i in range(n):
            t = 20 + (rng.randint(50) if varied else 0)
            w.write(f"u{i:02d}", rng.randn(t, dim).astype(np.float32))
    (tmp_path / "units").write_text("a\nb\nc\n")
    with open(tmp_path / "lab", "w") as f:
        for i in range(n):
            f.write(f"u{i:02d} " + " ".join(rng.choice(["a", "b", "c"], 3))
                    + "\n")
    cfg = Config()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    cfg.rnn_input_size = dim
    cfg.rnn_hidden_size = 16
    cfg.rnn_layers = 2
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, scp, str(tmp_path / "lab"), cfg)
    return cfg, vocab, ds


def _loader(ds, batch=4, buckets=1, mode="bucket", seed=7):
    return DeviceCachedLoader(
        SpeechDataLoader(ds, batch, shuffle=True, num_buckets=buckets,
                         seed=seed, mode=mode)
    )


@pytest.mark.parametrize("mode", ["bucket", "quantized"])
def test_epoch_groups_cover_iter_batches(tmp_path, mode):
    _, _, ds = _corpus(tmp_path)
    dev = _loader(ds, buckets=3, mode=mode)
    for epoch in (0, 1):
        dev.set_epoch(epoch)
        streamed = list(dev)
        grouped = []
        for arrs, pos, mask, t_pad in dev.epoch_groups(epoch):
            assert pos.shape == mask.shape
            for k in range(pos.shape[0]):
                feats = np.asarray(arrs["feats"])[pos[k]][:, :t_pad]
                labels = np.asarray(arrs["labels"])[pos[k]]
                grouped.append((feats.tobytes(), labels.tobytes(),
                                mask[k].tobytes()))
        keys = [(np.asarray(b.feats).tobytes(),
                 np.asarray(b.labels).tobytes(),
                 np.asarray(b.example_mask, np.float32).tobytes())
                for b in streamed]
        assert sorted(grouped) == sorted(keys)


def _state_and_fns(cfg, num_class=5, seed=0):
    spec = ModelSpec.from_config(cfg, num_class=num_class)
    state, tx = create_train_state(
        jax.random.PRNGKey(seed), spec, cfg.init_lr, cfg.weight_decay)
    fns = make_step_fns(spec, tx, return_raw=True)
    return spec, state, fns


def test_fused_matches_streaming_single_bucket(tmp_path):
    """One bucket => grouped order == streaming order => identical run."""
    cfg, _, ds = _corpus(tmp_path, varied=False)
    cfg.init_lr = 5e-3
    dev_a = _loader(ds, buckets=1)
    dev_b = _loader(ds, buckets=1)
    _, state0, fns = _state_and_fns(cfg)
    fused = make_fused_fns(fns[2:])
    rng = jax.random.PRNGKey(3)

    dev_a.set_epoch(1)
    st_s = jax.tree_util.tree_map(jnp.copy, state0)
    st_s, acc_s, loss_s = run_epoch(
        1, fns[:2], st_s, dev_a, training=True, rng=rng,
        log=lambda *a, **k: None)

    dev_b.set_epoch(1)
    st_f, acc_f, loss_f = run_epoch_fused(
        1, fused, state0, dev_b, training=True, rng=rng,
        log=lambda *a, **k: None)

    assert loss_f == pytest.approx(loss_s, rel=1e-5)
    assert acc_f == pytest.approx(acc_s, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_s.params),
                    jax.tree_util.tree_leaves(st_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # eval side: same loss/acc from the fused eval runner
    dev_a.set_epoch(0)
    _, acc_es, loss_es = run_epoch(
        0, fns[:2], st_s, dev_a, training=False, log=lambda *a, **k: None)
    dev_b.set_epoch(0)
    _, acc_ef, loss_ef = run_epoch_fused(
        0, fused, st_f, dev_b, training=False, log=lambda *a, **k: None)
    assert loss_ef == pytest.approx(loss_es, rel=1e-5)
    assert acc_ef == pytest.approx(acc_es, abs=1e-6)


@pytest.mark.parametrize("mode", ["bucket", "quantized"])
def test_fused_multibucket_trains(tmp_path, mode):
    cfg, _, ds = _corpus(tmp_path)
    dev = _loader(ds, buckets=3, mode=mode)
    _, state, fns = _state_and_fns(cfg)
    fused = make_fused_fns(fns[2:])
    dev.set_epoch(1)
    n_exp = len(dev)
    logs = []
    state, acc, loss = run_epoch_fused(
        1, fused, state, dev, training=True, rng=jax.random.PRNGKey(0),
        log=logs.append)
    # acc = 1 - errs/tokens can go negative for an untrained model
    # (insertions make edit distance exceed the label count)
    assert np.isfinite(loss) and np.isfinite(acc) and acc <= 1.0
    assert f"step = {n_exp}" in logs[-2]  # every batch counted
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("mode", ["bucket",
                                  pytest.param("quantized",
                                               marks=pytest.mark.slow)])
def test_fused_mesh_matches_single_device(tmp_path, mode):
    """The shard_map'd fused epoch on a 4-device data mesh produces the
    same losses and updated params as single-device fused (the loss/grad
    psums reduce the same per-batch math)."""
    from ctc_pytorch_tpu.parallel import make_mesh, replicate

    cfg, _, ds = _corpus(tmp_path)
    cfg.init_lr = 5e-3
    _, state0, fns_sd = _state_and_fns(cfg)
    fused_sd = make_fused_fns(fns_sd[2:])

    mesh = make_mesh(jax.devices()[:4])
    spec = ModelSpec.from_config(cfg, num_class=5)
    state_m, tx = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay)
    state_m = replicate(state_m, mesh)
    fns_m = make_step_fns(spec, tx, mesh=mesh, return_raw=True)
    fused_m = make_fused_fns(fns_m[2:], mesh)

    rng = jax.random.PRNGKey(3)
    dev_sd = _loader(ds, buckets=3, mode=mode)
    dev_m = DeviceCachedLoader(
        SpeechDataLoader(ds, 4, shuffle=True, num_buckets=3, seed=7,
                         mode=mode),
        mesh=mesh,
    )
    dev_sd.set_epoch(1)
    dev_m.set_epoch(1)
    st_s, acc_s, loss_s = run_epoch_fused(
        1, fused_sd, state0, dev_sd, training=True, rng=rng,
        log=lambda *a, **k: None)
    st_m, acc_m, loss_m = run_epoch_fused(
        1, fused_m, state_m, dev_m, training=True, rng=rng,
        log=lambda *a, **k: None)
    assert loss_m == pytest.approx(loss_s, rel=1e-5)
    assert acc_m == pytest.approx(acc_s, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_s.params),
                    jax.tree_util.tree_leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # eval: fused mesh eval == fused single-device eval on the new state
    dev_sd.set_epoch(0)
    dev_m.set_epoch(0)
    _, acc_es, loss_es = run_epoch_fused(
        0, fused_sd, st_s, dev_sd, training=False, log=lambda *a, **k: None)
    _, acc_em, loss_em = run_epoch_fused(
        0, fused_m, st_m, dev_m, training=False, log=lambda *a, **k: None)
    assert loss_em == pytest.approx(loss_es, rel=1e-5)
    assert acc_em == pytest.approx(acc_es, abs=1e-6)


def test_pad_group_canonical_lengths():
    """Group padding caps the compiled scan-length set at powers of two
    and marks padded rows invalid (the cond no-op keeps numerics exact)."""
    from ctc_pytorch_tpu.train.loop import _pad_group

    for k, expect in [(1, 1), (2, 2), (3, 4), (5, 8), (8, 8), (13, 16)]:
        pos = np.arange(k * 4, dtype=np.int32).reshape(k, 4)
        mask = np.ones((k, 4), np.float32)
        p2, m2, v = _pad_group(pos, mask)
        assert p2.shape[0] == m2.shape[0] == v.shape[0] == expect
        assert v[:k].all() and not v[k:].any()
        np.testing.assert_array_equal(p2[:k], pos)
        assert (m2[k:] == 0).all()


@pytest.mark.parametrize("mode", ["bucket", "quantized"])
def test_fused_pregather_matches_in_scan(tmp_path, mode):
    """pregather=True (one vectorised gather before the scan) must be
    numerically identical to the in-scan per-step gathers."""
    cfg, _, ds = _corpus(tmp_path)
    cfg.init_lr = 5e-3
    _, state0, fns = _state_and_fns(cfg)
    fused_a = make_fused_fns(fns[2:])
    fused_b = make_fused_fns(fns[2:], pregather=True)
    rng = jax.random.PRNGKey(3)

    dev_a, dev_b = _loader(ds, buckets=3, mode=mode), _loader(
        ds, buckets=3, mode=mode)
    dev_a.set_epoch(1)
    st_a = jax.tree_util.tree_map(jnp.copy, state0)
    st_a, acc_a, loss_a = run_epoch_fused(
        1, fused_a, st_a, dev_a, training=True, rng=rng,
        log=lambda *a, **k: None)
    dev_b.set_epoch(1)
    st_b, acc_b, loss_b = run_epoch_fused(
        1, fused_b, state0, dev_b, training=True, rng=rng,
        log=lambda *a, **k: None)
    assert loss_b == pytest.approx(loss_a, rel=1e-6)
    assert acc_b == pytest.approx(acc_a, abs=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_waveform_matches_streaming(tmp_path):
    """fused_epoch x waveform-in: the cached gather passes SAMPLE counts
    through the frac slot for the in-step frontend to rewrite — one epoch
    must match the streaming run_epoch(waveform=True) exactly."""
    from ctc_pytorch_tpu.data.prep.sphere import write_wav
    from ctc_pytorch_tpu.frontend import FrontendConfig
    from ctc_pytorch_tpu.frontend.e2e import (
        WaveFrontendSpec, build_frontend_fn,
    )

    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    data.mkdir()
    (tmp_path / "units").write_text("a\nb\nc\n")
    with open(data / "wav.scp", "w") as scp, open(data / "lab", "w") as lab:
        for i in range(8):
            wav = (rng.randn(3200) * 800).astype(np.int16)
            write_wav(data / f"u{i}.wav", wav)
            scp.write(f"u{i} {data / f'u{i}.wav'}\n")
            lab.write(f"u{i} " + " ".join(rng.choice(["a", "b", "c"], 3))
                      + "\n")
    cfg = Config()
    cfg.feature_type = "waveform"
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.left_ctx = cfg.right_ctx = 0
    cfg.n_skip_frame = cfg.n_downsample = 1
    cfg.rnn_input_size = 13
    cfg.rnn_hidden_size = 16
    cfg.rnn_layers = 1
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    cfg.init_lr = 5e-3
    vocab = Vocab(str(tmp_path / "units"))
    ds = SpeechDataset(vocab, str(data / "wav.scp"), str(data / "lab"), cfg)
    fe = build_frontend_fn(WaveFrontendSpec(
        feat_type="fbank", frontend=FrontendConfig(num_mel_bins=12),
        left_ctx=0, right_ctx=0, n_skip_frame=1, n_downsample=1,
    ))
    spec = ModelSpec.from_config(cfg, num_class=vocab.n_words)
    state0, tx = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay)
    fns = make_step_fns(spec, tx, frontend_fn=fe, return_raw=True)
    fused = make_fused_fns(fns[2:], waveform=True)
    rng_d = jax.random.PRNGKey(3)

    dev_a, dev_b = _loader(ds), _loader(ds)
    dev_a.loader.set_epoch(1)
    st_s = jax.tree_util.tree_map(jnp.copy, state0)
    st_s, acc_s, loss_s = run_epoch(
        1, fns[:2], st_s, dev_a.loader, training=True, rng=rng_d,
        waveform=True, log=lambda *a, **k: None)

    dev_b.set_epoch(1)
    st_f, acc_f, loss_f = run_epoch_fused(
        1, fused, state0, dev_b, training=True, rng=rng_d,
        log=lambda *a, **k: None)

    assert loss_f == pytest.approx(loss_s, rel=1e-5)
    assert acc_f == pytest.approx(acc_s, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_s.params),
                    jax.tree_util.tree_leaves(st_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # waveform x single-dispatch: the one-jit epoch program carries the
    # same sample-count frac contract (the shipped waveform recipe sets
    # fused_dispatch: "epoch")
    from ctc_pytorch_tpu.train.loop import make_epoch_fns, run_epoch_single

    st0b, _ = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay)
    epoch_fns = make_epoch_fns(fns[2:], waveform=True)
    dev_c = _loader(ds)
    dev_c.set_epoch(1)
    _, acc_1, loss_1 = run_epoch_single(
        1, epoch_fns, st0b, dev_c, training=True, rng=rng_d,
        log=lambda *a, **k: None)
    assert loss_1 == pytest.approx(loss_s, rel=1e-5)
    assert acc_1 == pytest.approx(acc_s, abs=1e-6)


def test_trainer_uses_fused_path(tmp_path, monkeypatch):
    cfg, _, ds = _corpus(tmp_path, varied=False)
    cfg.fused_epoch = True
    cfg.num_epoches = 1
    cfg.least_train_epoch = 0
    cfg.save_every = 0
    spec = ModelSpec.from_config(cfg, num_class=5)
    from ctc_pytorch_tpu.train import loop as loop_mod

    calls = {"fused": 0}
    orig = loop_mod.run_epoch_fused

    def spy(*a, **k):
        calls["fused"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(loop_mod, "run_epoch_fused", spy)
    tr = loop_mod.Trainer(cfg, spec, out_dir=str(tmp_path / "out"))
    assert tr.fused_fns is not None
    tr.fit(_loader(ds), _loader(ds), num_epoches=1,
           log=lambda *a, **k: None)
    assert calls["fused"] == 2  # train + dev epoch


@pytest.mark.parametrize("mode", ["bucket", "quantized"])
def test_single_dispatch_matches_per_group_sorted(tmp_path, mode):
    """run_epoch_single == the per-group jitted runners driven in the same
    (t_pad-sorted) group order: state, loss, and token-error sums."""
    from ctc_pytorch_tpu.train.loop import (
        _pad_group,
        make_epoch_fns,
        run_epoch_single,
    )

    cfg, _, ds = _corpus(tmp_path)
    dev_a = _loader(ds, buckets=3, mode=mode)
    dev_b = _loader(ds, buckets=3, mode=mode)
    _, state0, fns = _state_and_fns(cfg)
    rng = jax.random.PRNGKey(3)

    # reference: per-group fused calls, sorted by t_pad like run_epoch_single
    fused_train, _ = make_fused_fns(fns[2:])
    dev_a.set_epoch(1)
    st_ref = jax.tree_util.tree_map(jnp.copy, state0)
    loss_sum, n_batches, errs, toks = 0.0, 0, 0, 0
    for arrs, pos, mask, t_pad in sorted(
        dev_a.epoch_groups(1), key=lambda g: g[3]
    ):
        k = pos.shape[0]
        pos, mask, valid = _pad_group(pos, mask)
        st_ref, losses, e, t = fused_train(
            st_ref, arrs["feats"], arrs["labels"], arrs["in_len"],
            arrs["lab_len"], jnp.asarray(pos), jnp.asarray(mask),
            jnp.asarray(valid), rng, int(t_pad), True)
        loss_sum += float(np.asarray(losses)[:k].sum())
        n_batches += k
        errs += int(e)
        toks += int(t)

    epoch_fns = make_epoch_fns(fns[2:])
    dev_b.set_epoch(1)
    st_s, acc_s, loss_s = run_epoch_single(
        1, epoch_fns, state0, dev_b, training=True, rng=rng,
        log=lambda *a, **k: None)

    assert loss_s == pytest.approx(loss_sum / n_batches, rel=1e-6)
    assert acc_s == pytest.approx(1.0 - errs / (toks + 1e-9), abs=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(st_ref.params),
                    jax.tree_util.tree_leaves(st_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # eval is order-independent: totals must match the per-group fused
    # runner over the unsorted order too
    fused = make_fused_fns(fns[2:])
    dev_a.set_epoch(2)
    _, acc_ef, loss_ef = run_epoch_fused(
        2, fused, st_ref, dev_a, training=False, log=lambda *a, **k: None)
    dev_b.set_epoch(2)
    _, acc_es, loss_es = run_epoch_single(
        2, epoch_fns, st_s, dev_b, training=False, log=lambda *a, **k: None)
    assert loss_es == pytest.approx(loss_ef, rel=1e-6)
    assert acc_es == pytest.approx(acc_ef, abs=1e-9)


def test_trainer_single_dispatch_path(tmp_path, monkeypatch):
    cfg, _, ds = _corpus(tmp_path, varied=False)
    cfg.fused_epoch = True
    cfg.fused_dispatch = "epoch"
    cfg.num_epoches = 1
    cfg.least_train_epoch = 0
    cfg.save_every = 0
    spec = ModelSpec.from_config(cfg, num_class=5)
    from ctc_pytorch_tpu.train import loop as loop_mod

    calls = {"single": 0}
    orig = loop_mod.run_epoch_single

    def spy(*a, **k):
        calls["single"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(loop_mod, "run_epoch_single", spy)
    tr = loop_mod.Trainer(cfg, spec, out_dir=str(tmp_path / "out"))
    assert tr.epoch_fns is not None
    tr.fit(_loader(ds), _loader(ds), num_epoches=1,
           log=lambda *a, **k: None)
    assert calls["single"] == 2  # train + dev epoch

    cfg.fused_dispatch = "nope"
    with pytest.raises(ValueError):
        loop_mod.Trainer(cfg, spec, out_dir=str(tmp_path / "out2"))


def test_single_dispatch_mesh_matches_single_device(tmp_path):
    """One-dispatch-per-epoch under shard_map on a 4-device data mesh ==
    the single-device single-dispatch run (state, loss, acc)."""
    from ctc_pytorch_tpu.parallel import make_mesh, replicate
    from ctc_pytorch_tpu.train.loop import make_epoch_fns, run_epoch_single

    cfg, _, ds = _corpus(tmp_path)
    cfg.init_lr = 5e-3
    _, state0, fns_sd = _state_and_fns(cfg)
    epoch_sd = make_epoch_fns(fns_sd[2:])

    mesh = make_mesh(jax.devices()[:4])
    spec = ModelSpec.from_config(cfg, num_class=5)
    state_m, tx = create_train_state(
        jax.random.PRNGKey(0), spec, cfg.init_lr, cfg.weight_decay)
    state_m = replicate(state_m, mesh)
    fns_m = make_step_fns(spec, tx, mesh=mesh, return_raw=True)
    epoch_m = make_epoch_fns(fns_m[2:], mesh)

    rng = jax.random.PRNGKey(3)
    dev_sd = _loader(ds, buckets=3, mode="quantized")
    dev_m = DeviceCachedLoader(
        SpeechDataLoader(ds, 4, shuffle=True, num_buckets=3, seed=7,
                         mode="quantized"),
        mesh=mesh,
    )
    dev_sd.set_epoch(1)
    dev_m.set_epoch(1)
    st_s, acc_s, loss_s = run_epoch_single(
        1, epoch_sd, state0, dev_sd, training=True, rng=rng,
        log=lambda *a, **k: None)
    st_m, acc_m, loss_m = run_epoch_single(
        1, epoch_m, state_m, dev_m, training=True, rng=rng,
        log=lambda *a, **k: None)
    assert loss_m == pytest.approx(loss_s, rel=1e-5)
    assert acc_m == pytest.approx(acc_s, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_s.params),
                    jax.tree_util.tree_leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
