"""Misc utilities: rotating file logging, target layout converters, seeding."""

from __future__ import annotations

import logging
from logging.handlers import RotatingFileHandler
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np


def init_file_logger(
    log_dir: str | Path,
    name: str = "ctc_train",
    max_bytes: int = 1024 * 1024,
    backup_count: int = 5,
) -> logging.Logger:
    """Rotating-file logger (863's ``init_logger``,
    ``my_863_corpus/steps/cnn_lstm_ctc.py:84-94``)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        handler = RotatingFileHandler(
            Path(log_dir) / f"{name}.log", maxBytes=max_bytes,
            backupCount=backup_count,
        )
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"
        ))
        logger.addHandler(handler)
        stream = logging.StreamHandler()
        stream.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(stream)
    return logger


def flatten_targets(
    labels: np.ndarray, label_lengths: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Padded (B, L) -> flat 1-D targets (the warp-ctc convention the 863
    collate produces, ``my_863_corpus/steps/data_loader.py:195``)."""
    flat = np.concatenate([
        labels[i, : int(label_lengths[i])] for i in range(labels.shape[0])
    ]) if labels.shape[0] else np.zeros((0,), labels.dtype)
    return flat, np.asarray(label_lengths)


def unflatten_targets(
    flat: np.ndarray, label_lengths: Sequence[int], pad_to: int | None = None
) -> np.ndarray:
    """Flat 1-D targets -> padded (B, L) (``ctcDecoder.py:51-64`` semantics)."""
    b = len(label_lengths)
    l_max = pad_to or max((int(l) for l in label_lengths), default=1)
    out = np.zeros((b, max(l_max, 1)), flat.dtype if flat.size else np.int32)
    off = 0
    for i, l in enumerate(label_lengths):
        l = int(l)
        out[i, :l] = flat[off : off + l]
        off += l
    return out


def seed_all(seed: int) -> None:
    """Seed numpy (jax keys are explicit; torch only used in tests/bench)."""
    np.random.seed(seed)
