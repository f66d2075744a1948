"""Training loop tests: overfit a tiny corpus, checkpoint roundtrip, resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_pytorch_tpu.config import CNNConfig, Config
from ctc_pytorch_tpu.data.batching import Batch
from ctc_pytorch_tpu.models import CTCModel
from ctc_pytorch_tpu.models.ctc_model import ModelSpec
from ctc_pytorch_tpu.train import (
    PlateauScheduler,
    Trainer,
    load_package,
    model_from_package,
    run_epoch,
    save_package,
)
from ctc_pytorch_tpu.train.checkpoint import restore_train_state
from ctc_pytorch_tpu.train.loop import make_step_fns
from ctc_pytorch_tpu.train.state import create_train_state, get_lr, scale_lr


def _tiny_cfg(**kw):
    cfg = Config()
    cfg.cnn = CNNConfig(add_cnn=False)
    cfg.rnn_input_size = 8
    cfg.rnn_hidden_size = 16
    cfg.rnn_layers = 2
    cfg.drop_out = 0.0
    cfg.dtype = "float32"
    cfg.batch_size = 4
    cfg.init_lr = 5e-3
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class _ToyLoader:
    """Fixed synthetic batches: features carry the label pattern."""

    def __init__(self, seed=0, n_batches=2, b=4, t=12, f=8, n_class=5):
        rng = np.random.RandomState(seed)
        self.batches = []
        for _ in range(n_batches):
            labels = rng.randint(1, n_class, size=(b, 3)).astype(np.int32)
            feats = rng.randn(b, t, f).astype(np.float32) * 0.1
            # plant label-dependent structure so the model can learn
            for i in range(b):
                for j, lab in enumerate(labels[i]):
                    feats[i, j * 4 : j * 4 + 4, lab % f] += 2.0
            self.batches.append(Batch(
                feats=feats,
                input_frac=np.ones(b, np.float32),
                input_lengths=np.full(b, t, np.int32),
                labels=labels,
                label_lengths=np.full(b, 3, np.int32),
                utts=[f"u{i}" for i in range(b)],
                example_mask=np.ones(b, np.float32),
            ))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, e):
        pass


def test_train_step_reduces_loss():
    cfg = _tiny_cfg()
    spec = ModelSpec.from_config(cfg, num_class=5)
    state, tx = create_train_state(jax.random.PRNGKey(0), spec, cfg.init_lr,
                                   cfg.weight_decay)
    fns = make_step_fns(spec, tx)
    loader = _ToyLoader()
    rng = jax.random.PRNGKey(1)
    state, acc0, loss0 = run_epoch(1, fns, state, loader, training=True,
                                   rng=rng, log=lambda *a: None)
    for ep in range(15):
        state, acc, loss = run_epoch(ep + 2, fns, state, loader, training=True,
                                     rng=rng, log=lambda *a: None)
    assert loss < loss0 * 0.5, (loss0, loss)
    # eval pass runs and produces finite numbers
    state2, acc_e, loss_e = run_epoch(0, fns, state, loader, training=False,
                                      log=lambda *a: None)
    assert np.isfinite(loss_e)


def test_trainer_fit_and_checkpoint(tmp_path):
    cfg = _tiny_cfg(num_epoches=3, save_every=1)
    cfg.checkpoint_dir = str(tmp_path)
    spec = ModelSpec.from_config(cfg, num_class=5)
    trainer = Trainer(cfg, spec)
    loader = _ToyLoader()
    best = trainer.fit(loader, _ToyLoader(seed=5), num_epoches=3,
                       log=lambda *a: None)
    assert best.exists()
    # package rebuilds the model standalone (test_ctc.py:38-58 contract)
    spec2, params, mstate, manifest = model_from_package(best)
    assert spec2 == spec
    x = jnp.ones((2, 12, 8), jnp.float32)
    lp, _ = CTCModel.apply(spec2, params, mstate, x)
    assert lp.shape == (12, 2, 5)
    assert manifest["epoch"] == 3
    assert len(manifest["loss_results"]) == 3
    # metrics artifacts written (visdom replacement)
    assert (trainer.out_dir / "train_metrics.jsonl").exists()
    assert (trainer.out_dir / "train_metrics.csv").exists()
    # periodic resume checkpoints exist
    assert (trainer.out_dir / "resume_ep0001.npz").exists()


def test_resume_restores_state(tmp_path):
    cfg = _tiny_cfg(num_epoches=2, save_every=1)
    cfg.checkpoint_dir = str(tmp_path)
    spec = ModelSpec.from_config(cfg, num_class=5)
    t1 = Trainer(cfg, spec)
    t1.fit(_ToyLoader(), _ToyLoader(seed=5), num_epoches=2, log=lambda *a: None)
    ckpt_path = t1.out_dir / "resume_ep0002.npz"

    t2 = Trainer(cfg, spec)
    t2.resume(ckpt_path)
    assert t2.epoch == 2
    # params identical after restore
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state (incl. adam moments + lr) restored
    assert get_lr(t2.state.opt_state) == get_lr(t1.state.opt_state)


def test_lr_scaling():
    cfg = _tiny_cfg()
    spec = ModelSpec.from_config(cfg, num_class=5)
    state, tx = create_train_state(jax.random.PRNGKey(0), spec, 0.01)
    assert abs(get_lr(state.opt_state) - 0.01) < 1e-9
    new_opt = scale_lr(state.opt_state, 0.5)
    assert abs(get_lr(new_opt) - 0.005) < 1e-9


def test_rollback_restores_params(tmp_path):
    cfg = _tiny_cfg(num_epoches=1)
    cfg.checkpoint_dir = str(tmp_path)
    spec = ModelSpec.from_config(cfg, num_class=5)
    trainer = Trainer(cfg, spec)
    before = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(trainer.state.params)]
    trainer.fit(_ToyLoader(), _ToyLoader(seed=5), num_epoches=1,
                log=lambda *a: None)
    after = [np.asarray(x) for x in
             jax.tree_util.tree_leaves(trainer.state.params)]
    # params moved during the epoch
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))
    # force a rollback: scheduler says restore snapshot
    snap = [np.asarray(x) for x in
            jax.tree_util.tree_leaves(trainer._rollback.params)]
    trainer.state = trainer._rollback
    now = [np.asarray(x) for x in
           jax.tree_util.tree_leaves(trainer.state.params)]
    for a, b in zip(snap, now):
        np.testing.assert_array_equal(a, b)
