"""Plateau LR scheduler with snapshot rollback — the reference's exact
state machine (``timit/steps/train_ctc.py:160-227``), extracted so it is
unit-testable and reusable.

Band test on dev loss against ``loss_best ± end_adjust_acc``:

- improvement beyond the band: reset counter, snapshot model+optimizer;
- within the band: counter += 1; additionally snapshot when the loss is a new
  true best;
- worse than the band: counter jumps straight to 10;
- at counter == 10: halve (``lr_decay``) the LR *next epoch*, roll model and
  optimizer back to the last snapshot, ``adjust_time += 1``;
- stop after ``adjust_time == 8`` decays (``train_ctc.py:226-227``).

Separately tracks the best dev-accuracy state for the final save
(``train_ctc.py:209-212, 240-242``).  The 863 variant keys the same machine
on dev *accuracy* (``cnn_lstm_ctc.py:213-241``); pass ``mode='acc'``.
"""

from __future__ import annotations

import dataclasses

@dataclasses.dataclass
class PlateauDecision:
    snapshot: bool = False  # save rollback snapshot of model+optimizer
    snapshot_best: bool = False  # save "best dev accuracy" state
    rollback: bool = False  # restore rollback snapshot now
    decay_lr: bool = False  # multiply LR by lr_decay at next epoch start
    stop: bool = False


@dataclasses.dataclass
class PlateauScheduler:
    end_adjust_acc: float = 2.0
    lr_decay: float = 0.5
    max_decays: int = 8
    mode: str = "loss"  # 'loss' (timit) | 'acc' (863 keyed on accuracy)

    loss_best: float = 1000.0
    loss_best_true: float = 1000.0
    adjust_rate_count: int = 0
    adjust_time: int = 0
    acc_best: float = 0.0

    def update(self, dev_loss: float, dev_acc: float,
               allow_adjust: bool = True) -> PlateauDecision:
        """``allow_adjust=False`` implements the 863 recipe's
        ``least_train_epoch`` warmup: track bests/snapshots but never decay."""
        d = PlateauDecision()
        metric = dev_loss if self.mode == "loss" else -dev_acc
        if metric < (self.loss_best - self.end_adjust_acc):
            self.loss_best = metric
            self.loss_best_true = metric
            self.adjust_rate_count = 0
            d.snapshot = True
        elif metric < self.loss_best + self.end_adjust_acc:
            self.adjust_rate_count += 1
            if metric < self.loss_best and metric < self.loss_best_true:
                self.loss_best_true = metric
                d.snapshot = True
        else:
            self.adjust_rate_count = 10

        if dev_acc > self.acc_best:
            self.acc_best = dev_acc
            d.snapshot_best = True

        if self.adjust_rate_count == 10:
            if allow_adjust:
                d.decay_lr = True
                d.rollback = True
                self.adjust_time += 1
                if self.loss_best > self.loss_best_true:
                    self.loss_best = self.loss_best_true
            self.adjust_rate_count = 0

        if self.adjust_time == self.max_decays:
            d.stop = True
        return d

    # -- (de)serialisation for checkpoints --------------------------------
    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_state_dict(cls, d: dict) -> "PlateauScheduler":
        return cls(**d)
