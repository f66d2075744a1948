"""MetricsLogger: JSONL/CSV durability across resumes."""

import csv
import json

from ctc_pytorch_tpu.train.metrics_log import MetricsLogger


def test_csv_resume_same_schema_appends(tmp_path):
    m1 = MetricsLogger(tmp_path)
    m1.log({"epoch": 1, "lr": 0.1, "train_loss": 2.0, "wall_minutes": 0.0})
    m2 = MetricsLogger(tmp_path)  # resumed process, same schema
    m2.log({"epoch": 2, "lr": 0.1, "train_loss": 1.5, "wall_minutes": 0.1})
    rows = list(csv.DictReader(open(tmp_path / "train_metrics.csv")))
    assert [r["epoch"] for r in rows] == ["1", "2"]
    assert rows[1]["train_loss"] == "1.5"


def test_csv_resume_schema_change_rotates(tmp_path):
    """Appending rows with a different column set under an old header
    silently corrupts every downstream read; a schema change must rotate
    the old file aside and start fresh (regression)."""
    m1 = MetricsLogger(tmp_path)
    m1.log({"epoch": 1, "lr": 0.1, "wall_minutes": 0.0})
    m2 = MetricsLogger(tmp_path)
    m2.log({"epoch": 2, "dev_acc": 0.5, "lr": 0.05, "wall_minutes": 0.1})
    rows = list(csv.DictReader(open(tmp_path / "train_metrics.csv")))
    assert len(rows) == 1 and rows[0]["dev_acc"] == "0.5"
    old = list(csv.DictReader(open(tmp_path / "train_metrics.1.csv")))
    assert len(old) == 1 and old[0]["epoch"] == "1"
    # the JSONL stream is append-only regardless
    recs = [json.loads(l) for l in open(tmp_path / "train_metrics.jsonl")]
    assert [r["epoch"] for r in recs] == [1, 2]
