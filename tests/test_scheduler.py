"""Plateau scheduler state machine vs a direct transcription of
train_ctc.py:160-227."""

import numpy as np

from ctc_pytorch_tpu.train.scheduler import PlateauScheduler


class _ReferenceLogic:
    """Line-by-line transcription of the reference control flow."""

    def __init__(self, end_adjust_acc=2.0):
        self.end_adjust_acc = end_adjust_acc
        self.loss_best = 1000.0
        self.loss_best_true = 1000.0
        self.adjust_rate_count = 0
        self.adjust_time = 0
        self.acc_best = 0.0

    def update(self, dev_loss, acc):
        events = dict(snapshot=False, snapshot_best=False, rollback=False,
                      decay_lr=False, stop=False)
        if dev_loss < (self.loss_best - self.end_adjust_acc):
            self.loss_best = dev_loss
            self.loss_best_true = dev_loss
            self.adjust_rate_count = 0
            events["snapshot"] = True
        elif dev_loss < self.loss_best + self.end_adjust_acc:
            self.adjust_rate_count += 1
            if dev_loss < self.loss_best and dev_loss < self.loss_best_true:
                self.loss_best_true = dev_loss
                events["snapshot"] = True
        else:
            self.adjust_rate_count = 10
        if acc > self.acc_best:
            self.acc_best = acc
            events["snapshot_best"] = True
        if self.adjust_rate_count == 10:
            events["decay_lr"] = True
            events["rollback"] = True
            self.adjust_time += 1
            self.adjust_rate_count = 0
            if self.loss_best > self.loss_best_true:
                self.loss_best = self.loss_best_true
        if self.adjust_time == 8:
            events["stop"] = True
        return events


def test_scheduler_matches_reference_random_walk():
    rng = np.random.RandomState(0)
    ours = PlateauScheduler()
    ref = _ReferenceLogic()
    loss = 120.0
    for step in range(300):
        loss = max(0.5, loss + rng.randn() * 3 - 0.3)
        acc = 1.0 - loss / 150.0 + rng.randn() * 0.01
        d = ours.update(loss, acc)
        e = ref.update(loss, acc)
        assert d.snapshot == e["snapshot"], step
        assert d.snapshot_best == e["snapshot_best"], step
        assert d.rollback == e["rollback"], step
        assert d.decay_lr == e["decay_lr"], step
        assert d.stop == e["stop"], step
        assert ours.adjust_time == ref.adjust_time
        assert ours.adjust_rate_count == ref.adjust_rate_count
        if d.stop:
            break


def test_scheduler_stops_after_8_decays():
    s = PlateauScheduler()
    s.update(10.0, 0.5)  # big improvement -> snapshot
    stops = 0
    for i in range(200):
        d = s.update(100.0, 0.1)  # always worse -> immediate decay
        if d.stop:
            stops = 1
            break
    assert stops == 1
    assert s.adjust_time == 8


def test_scheduler_band_counting():
    s = PlateauScheduler(end_adjust_acc=2.0)
    assert s.update(10.0, 0.5).snapshot  # 10 < 1000-2
    for i in range(9):
        d = s.update(10.5, 0.5)  # inside band
        assert not d.decay_lr
    d = s.update(10.5, 0.5)  # 10th in-band epoch -> decay+rollback
    assert d.decay_lr and d.rollback
    assert s.adjust_time == 1


class _Reference863Logic:
    """Line-by-line transcription of the 863 acc-keyed control flow
    (my_863_corpus/steps/cnn_lstm_ctc.py:175-241): percent-scale accuracy,
    big improvements leave acc_best_true, much-worse epochs reset (not
    force) the counter, unconditional acc_best=acc_best_true at decay."""

    def __init__(self, end_adjust_acc=0.5):
        self.end_adjust_acc = end_adjust_acc
        self.acc_best = -100.0
        self.acc_best_true = -100.0
        self.adjust_rate_count = 0
        self.adjust_time = 0

    def update(self, acc_pct):
        events = dict(snapshot=False, rollback=False, decay_lr=False,
                      stop=False)
        if acc_pct > (self.acc_best + self.end_adjust_acc):
            self.acc_best = acc_pct
            self.adjust_rate_count = 0
            events["snapshot"] = True
        elif acc_pct > self.acc_best - self.end_adjust_acc:
            self.adjust_rate_count += 1
            if acc_pct > self.acc_best and acc_pct > self.acc_best_true:
                self.acc_best_true = acc_pct
                events["snapshot"] = True
        else:
            self.adjust_rate_count = 0
        if self.adjust_rate_count == 10:
            events["decay_lr"] = True
            events["rollback"] = True
            self.adjust_time += 1
            self.adjust_rate_count = 0
            self.acc_best = self.acc_best_true
        if self.adjust_time == 8:
            events["stop"] = True
        return events


def test_scheduler_acc_mode_matches_863_reference():
    rng = np.random.RandomState(7)
    ours = PlateauScheduler(end_adjust_acc=0.5, mode="acc")
    ref = _Reference863Logic(end_adjust_acc=0.5)
    acc = 0.05
    for step in range(400):
        # noisy rising-then-plateauing accuracy trajectory (fraction in
        # [0,1], like run_epoch returns); the reference sees it in percent
        drift = 0.005 if step < 80 else 0.0
        noise = 0.003 if step < 80 else 0.0015
        acc = float(np.clip(acc + rng.randn() * noise + drift, 0.0, 0.99))
        d = ours.update(dev_loss=123.0, dev_acc=acc)
        e = ref.update(acc * 100.0)
        assert d.snapshot == e["snapshot"], step
        assert d.rollback == e["rollback"], step
        assert d.decay_lr == e["decay_lr"], step
        assert d.stop == e["stop"], step
        assert ours.adjust_time == ref.adjust_time, step
        assert ours.adjust_rate_count == ref.adjust_rate_count, step
        if d.stop:
            break
    assert ours.adjust_time >= 1  # the walk must actually exercise decays


def test_scheduler_acc_mode_much_worse_resets_not_decays():
    s = PlateauScheduler(end_adjust_acc=1.0, mode="acc")
    s.update(0.0, 0.50)  # 50% — big improvement, snapshot
    for _ in range(5):
        s.update(0.0, 0.502)  # in band: counter climbs
    assert s.adjust_rate_count == 5
    d = s.update(0.0, 0.10)  # catastrophically worse
    # 863 resets the counter (cnn_lstm_ctc:224-225) — no immediate decay
    assert not d.decay_lr and s.adjust_rate_count == 0


def test_scheduler_roundtrip():
    s = PlateauScheduler()
    s.update(10.0, 0.6)
    s.update(50.0, 0.3)
    s2 = PlateauScheduler.from_state_dict(s.state_dict())
    assert s2 == s
