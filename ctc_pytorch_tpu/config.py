"""Typed configuration for the whole pipeline.

One dataclass replaces the reference's three config generations (YAML attr-bag
with ``eval()`` at ``timit/steps/train_ctc.py:71-79,105-109``, INI ConfigParser
at ``my_863_corpus/steps/cnn_lstm_ctc.py:102-152``, and Kaldi ``.conf`` flag
files).  It is YAML-compatible with ``timit/conf/ctc_config.yaml`` key-for-key,
round-trips losslessly, never calls ``eval`` (layer tuples are parsed with
``ast.literal_eval``), and is stored whole inside checkpoints so a model can be
rebuilt from a checkpoint alone (the reference's checkpoint-as-contract
behaviour, ``timit/steps/test_ctc.py:38-60``).
"""

from __future__ import annotations

import ast
import configparser
import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, List, Optional, Tuple

try:
    import yaml
except ImportError:  # pragma: no cover - yaml is in the base image
    yaml = None

Pair = Tuple[int, int]


def _parse_pairs(value: Any) -> List[Pair]:
    """Parse ``"[(1, 32), (32, 32)]"`` into ``[(1, 32), (32, 32)]`` safely.

    The reference uses ``eval()`` for this (``timit/steps/train_ctc.py:105-109``);
    we use ``ast.literal_eval`` and normalise ints to pairs.
    """
    if value is None:
        return []
    if isinstance(value, str):
        value = value.strip()
        if value in ("", "None", "none", "null"):
            return []
        value = ast.literal_eval(value)
    if isinstance(value, tuple):
        value = [value]
    out = []
    for item in value:
        if isinstance(item, int):
            item = (item, item)
        out.append((int(item[0]), int(item[1])))
    return out


@dataclass
class CNNConfig:
    """The ``#CNN`` block of ``timit/conf/ctc_config.yaml:29-38``."""

    add_cnn: bool = False
    layers: int = 0
    channel: List[Pair] = field(default_factory=list)
    kernel_size: List[Pair] = field(default_factory=list)
    stride: List[Pair] = field(default_factory=list)
    padding: List[Pair] = field(default_factory=list)
    pooling: Optional[List[Pair]] = None
    batch_norm: bool = True
    activation_function: str = "relu"

    def pool_at(self, i: int) -> Optional[Pair]:
        """Layer ``i``'s pooling window, honouring per-layer ``None`` entries
        (the reference's layer tuples carry pooling per layer,
        ``model_ctc.py:46-57``)."""
        if not self.pooling:
            return None
        return self.pooling[i]

    def time_downsample(self) -> int:
        """Total stride along the time axis through the conv (+pool) stack."""
        ds = 1
        for i in range(self.layers):
            ds *= self.stride[i][0]
            pk = self.pool_at(i)
            if pk:
                ds *= pk[0]
        return ds

    def conv_out(self, i: int, t: int, f: int) -> Pair:
        """Layer ``i``'s conv output (t', f') — floor arithmetic, pre-pool
        (``model_ctc.py:111,116``).  The single source of truth for conv
        shape math (bench.py's FLOPs accounting reuses it)."""
        kt, kf = self.kernel_size[i]
        st, sf = self.stride[i]
        pt, pf = self.padding[i]
        return (t + 2 * pt - kt) // st + 1, (f + 2 * pf - kf) // sf + 1

    def output_time_len(self, t: int) -> int:
        """Frames out of the conv stack for ``t`` frames in (floor conv arith)."""
        for i in range(self.layers):
            t = self.conv_out(i, t, 0)[0]
            pk = self.pool_at(i)
            if pk:
                t = (t - pk[0]) // pk[0] + 1
        return t

    def output_freq_len(self, f: int) -> int:
        """Feature-axis size after the conv stack (``model_ctc.py:111,116``)."""
        for i in range(self.layers):
            f = self.conv_out(i, 0, f)[1]
            pk = self.pool_at(i)
            if pk:
                f = (f - pk[1]) // pk[1] + 1
        return f


@dataclass
class Config:
    """Flat config mirroring ``timit/conf/ctc_config.yaml`` keys."""

    # exp
    exp_name: str = "ctc_fbank_cnn"
    checkpoint_dir: str = "checkpoint/"

    # data
    vocab_file: str = "data/units"
    train_scp_path: str = "data/train/fbank.scp"
    train_lab_path: str = "data/train/phn_text"
    valid_scp_path: str = "data/dev/fbank.scp"
    valid_lab_path: str = "data/dev/phn_text"
    left_ctx: int = 0
    right_ctx: int = 2
    n_skip_frame: int = 2
    n_downsample: int = 2
    num_workers: int = 1
    shuffle_train: bool = True
    # upload the (bucket-padded) dataset to HBM once and gather batches
    # on device — kills per-step host->device transfer.  Works under a
    # data mesh too (bucket arrays replicated, gathers batch-sharded);
    # auto-disabled (loudly) when the estimated cache size would exceed
    # device_cache_max_gb, falling back to host streaming + prefetch
    device_cache: bool = True
    device_cache_max_gb: float = 6.0
    # when the device cache is disabled/doesn't fit: overlap H2D copies of
    # upcoming batches with compute (PrefetchLoader).  device_put must be
    # genuinely async for this to win — on tunneled/remote device
    # transports each put is a blocking RPC and prefetch measures SLOWER
    # than serial streaming (BENCH_EXTRA epoch_utts_per_sec_prefetch_nower
    # vs _nower); set False on such rigs
    host_prefetch: bool = True
    # with the device cache on: run each epoch as ONE jitted lax.scan per
    # bucket-shape group (gather + train step + metric accumulation all
    # on device), so the host dispatches O(buckets) calls per epoch
    # instead of O(batches) — removes the per-step dispatch latency that
    # bounds the epoch rate on high-RTT rigs.  Batch composition and
    # per-batch numerics are identical to the streaming path; the only
    # semantic difference is batch ORDER: batches are grouped by bucket
    # shape (within-group order preserved), so the optimizer visits
    # buckets in blocks rather than interleaved.  Off by default to keep
    # the reference's exact visiting order; the shipped recipes enable it
    # (measured 2.4x the streaming epoch rate on the tunneled v5e,
    # docs/KERNELS.md "Fused epochs").
    fused_epoch: bool = False
    # stage-4 twin of fused_epoch: decode the test set as one jitted scan
    # per bucket group over a DeviceCachedLoader (decode/fused.py) instead
    # of streaming host batches.  Applies to Greedy and BeamDevice on a
    # single device with feature inputs; falls back to streaming otherwise.
    # Decoded strings and scores are identical; only dispatch granularity
    # changes (see BENCH_EXTRA stage4_greedy_rtf_fused vs stage4_greedy_rtf).
    fused_decode: bool = True
    # fused_epoch dispatch granularity: "group" (one jitted call per
    # bucket group — the round-4 default) or "epoch" (the WHOLE epoch as
    # one jitted program: one dispatch + one result fetch per epoch, the
    # answer to per-group dispatch RTT on tunneled rigs; groups visit in
    # t_pad order and the per-group progress lines collapse to the epoch
    # summary).  Per-batch numerics identical in all three modes.
    fused_dispatch: str = "group"
    # fused_epoch variant: materialise each group's batches with one
    # vectorised take before the scan instead of per-step in-scan gathers.
    # Measured flat-to-slightly-negative on v5e (docs/KERNELS.md round-5
    # pregather A/B) — the in-scan gathers pipeline behind the RNN chain —
    # so it ships off; kept as a knob for rigs with different HBM behaviour.
    fused_pregather: bool = False
    feature_dim: int = 81
    output_class_dim: int = 39
    mel: bool = False
    feature_type: str = "fbank"

    # model
    rnn_input_size: int = 243
    rnn_hidden_size: int = 384
    rnn_layers: int = 4
    rnn_type: str = "lstm"  # accepts reference spellings "nn.LSTM" etc.
    bidirectional: bool = True
    batch_norm: bool = True
    drop_out: float = 0.2

    # cnn
    cnn: CNNConfig = field(default_factory=CNNConfig)

    # training
    use_gpu: bool = True  # kept for YAML compat; interpreted as "use accelerator"
    init_lr: float = 1e-3
    num_epoches: int = 500
    end_adjust_acc: float = 2.0
    lr_decay: float = 0.5
    batch_size: int = 8
    weight_decay: float = 5e-4
    seed: int = 1
    verbose_step: int = 50
    grad_clip: float = 0.0  # 863 recipe clips at 400 (cnn_lstm_ctc.py:52); 0 = off
    max_frames: int = 512  # static pad/bucket ceiling (XLA static shapes)
    max_label_len: int = 96
    num_buckets: int = 4
    # 'quantized': reference-dynamics batching (fully-shuffled composition,
    # T padded up to num_buckets static boundaries) — the accuracy-parity
    # default.  'bucket': length-homogeneous batches (least padding, peak
    # throughput; composition correlates with length, which measurably
    # costs PER at hard regimes).  num_buckets=0 = reference-exact padding.
    batch_mode: str = "quantized"
    dtype: str = "bfloat16"  # compute dtype for matmuls; params/loss stay fp32
    data_axis: str = "data"  # mesh axis name for data parallelism
    save_every: int = 0  # periodic durable checkpoint cadence (epochs); 0 = off
    remat: bool = False  # jax.checkpoint each RNN layer (memory for FLOPs)
    # BN statistics over valid frames only + zeroed padding planes, making
    # the train step independent of the padded length (the reference's BN
    # normalises padding too — model_ctc.py:29-32 — so its dynamics shift
    # with batch-max padding; see PARITY_RUN.md padding ladder).  With
    # bias-free RNNs this makes no-CNN training exactly padding-invariant,
    # so quantized/bucketed static shapes cost zero accuracy.
    # DEPRECATED alias for pad_dynamics: "valid" (kept for old configs).
    bn_mask_padding: bool = False
    # What train-time dynamics the padding region gets:
    #   'batchmax' (default): reference-EXACT emulation at static shapes —
    #     BN statistics stop at the batch's true max length (a traced
    #     scalar; the compiled shape stays the bucket boundary) and the
    #     region beyond it is zeroed, which bias-free RNNs carry as exact
    #     zero state (model_ctc.py:24-25 bias=False).  Training dynamics
    #     become bit-comparable to per-batch-max padding (num_buckets: 0)
    #     for ANY bucket count, removing the padding-overshoot PER cost
    #     the PARITY_RUN.md ladder measured (tests/test_pad_dynamics.py
    #     proves step-level equality).  Repeat-padded rows of ragged final
    #     batches are excluded from BN statistics, like the reference's
    #     genuinely-smaller final batch.
    #   'padded': BN normalises the full padded plane (the reference's own
    #     quirk applied to the bucket boundary — its dynamics then shift
    #     with padding overshoot; the pre-round-5 default).
    #   'valid': per-utterance masking — a cleaner estimator than the
    #     reference's, but NOT its dynamics (measured worse at hard
    #     regimes; PARITY_RUN.md §3 negative result).
    pad_dynamics: str = "batchmax"
    ctc_impl: str = "scan"  # 'scan' | 'pallas' CTC loss backend
    # fused Pallas RNN kernels for train+eval when the Mosaic tiling limits
    # allow (H % 128, 2B % 8 on real TPU); models/rnn.py silently falls back
    # to the lax.scan path otherwise
    use_pallas_rnn: bool = True
    profile: bool = False  # jax.profiler trace of the first training epoch

    # test
    test_scp_path: str = "data/test/fbank.scp"
    test_lab_path: str = "data/test/phn_text"
    decode_type: str = "Greedy"
    # north-star benchmark width (BASELINE.md config #3: beam=20 + bigram
    # LM; the reference's own default is 200, ref timit/utils/ctcDecoder.py:171)
    beam_width: int = 20
    beam_max_len: int = 96  # BeamDevice hypothesis capacity (tokens)
    # host Beam decode: use the C++ search (native/ctc_native.cpp) when the
    # shared library built; False forces the pure-python reference search —
    # the parity harness compares both against the torch reference
    beam_use_native: bool = True
    lm_alpha: float = 0.1
    lm_path: str = "data/lm_phone_bg.arpa"

    # 863-recipe keys (my_863_corpus/conf/*.conf sections [Data][Model][Training])
    dataset: str = "TIMIT"
    data_dir: str = "data"
    out_type: str = "phone"
    num_class: int = 0  # 863 configs carry the class count explicitly
    model_file: str = ""  # best-checkpoint path written back after training
    least_train_epoch: int = 0  # no LR adjustment before this epoch
    scheduler_mode: str = "loss"  # 'loss' (timit) | 'acc' (863)
    # 863-mode parity: after each train epoch, run a separate eval pass
    # over the TRAINING set and report its greedy accuracy ("cer on
    # training set", mislabeled in the reference —
    # my_863_corpus/steps/cnn_lstm_ctc.py:203-205); recorded in the
    # package as training_cer_results (acc*100, the reference's unit)
    dev_over_train: bool = False
    log_dir: str = ""  # rotating file logs when set (863 recipe)

    # ------------------------------------------------------------------
    @property
    def rnn_cell(self) -> str:
        """Normalise reference spellings ``nn.LSTM``/``nn.GRU``/``nn.RNN``."""
        t = self.rnn_type.lower()
        for name in ("lstm", "gru", "rnn"):
            if name in t:
                return name
        raise ValueError(f"unknown rnn_type: {self.rnn_type!r}")

    @property
    def spliced_dim(self) -> int:
        return self.feature_dim * (self.left_ctx + self.right_ctx + 1)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        cnn = d.pop("cnn")
        # pairs serialise as the reference's string form, e.g. "[(1, 32), (32, 32)]"
        for pk in ("channel", "kernel_size", "stride", "padding", "pooling"):
            v = cnn[pk]
            cnn[pk] = "None" if not v else str([tuple(p) for p in v])
        d.update({f"cnn_{k}" if k in d else k: v for k, v in cnn.items()})
        return d

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        raw = dict(raw)
        # 863 INI key aliases (my_863_corpus/steps/cnn_lstm_ctc.py:102-152)
        aliases = {"n_feats": "feature_dim"}
        raw = {aliases.get(k.strip(), k): v for k, v in raw.items()}
        field_names = {f.name for f in dataclasses.fields(cls)}
        cnn_names = {f.name for f in dataclasses.fields(CNNConfig)}
        cnn_kwargs: dict = {}
        kwargs: dict = {}
        unknown: list = []
        for key, value in raw.items():
            k = key.strip()
            if k.startswith("cnn_") and k[4:] in cnn_names:
                cnn_kwargs[k[4:]] = value
            elif k in ("add_cnn", "layers", "channel", "kernel_size", "stride",
                       "padding", "pooling", "activation_function"):
                cnn_kwargs[k] = value
            elif k in field_names:
                kwargs[k] = value
            else:
                # tolerated (the reference YAML carries stray keys) but
                # loudly: a typo like `epochs` for `num_epoches` would
                # otherwise silently train with the 500-epoch default
                unknown.append(k)
        if unknown:
            import warnings

            warnings.warn(
                f"config: ignoring unknown key(s) {unknown} — check for "
                "typos (e.g. `num_epoches`, not `epochs`)",
                stacklevel=2,
            )
        for pk in ("channel", "kernel_size", "stride", "padding"):
            if pk in cnn_kwargs:
                cnn_kwargs[pk] = _parse_pairs(cnn_kwargs[pk])
        if "pooling" in cnn_kwargs:
            p = _parse_pairs(cnn_kwargs["pooling"])
            cnn_kwargs["pooling"] = p if p else None
        if "batch_norm" in kwargs:
            cnn_kwargs.setdefault("batch_norm", kwargs["batch_norm"])
        cfg = cls(**kwargs)
        cfg.cnn = CNNConfig(**cnn_kwargs)
        return cfg

    # -- serialisation -------------------------------------------------
    def to_yaml(self, path: str | Path) -> None:
        d = self.to_dict()
        Path(path).write_text(yaml.safe_dump(d, sort_keys=False))

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))


def load_config(path: str | Path) -> Config:
    """Load YAML (timit-style) or INI (863-style) config files."""
    path = Path(path)
    text = path.read_text()
    if path.suffix in (".conf", ".ini") or text.lstrip().startswith("["):
        parser = configparser.ConfigParser()
        parser.read_string(text)
        raw: dict = {}
        for section in parser.sections():
            for key, value in parser.items(section):
                raw[key] = _coerce(value)
        return Config.from_dict(raw)
    raw = yaml.safe_load(text) or {}
    return Config.from_dict(raw)


def _coerce(value: str) -> Any:
    v = value.strip()
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v
