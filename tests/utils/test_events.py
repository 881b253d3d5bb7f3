"""Events tracker: API surface of the reference ``_events/tracker.py`` with
a local, network-free sink (disabled by default)."""

import json

from lightly_train_tpu._events import tracker


def test_disabled_by_default(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "LIGHTLY_TRAIN_EVENTS_FILE", str(tmp_path / "events.jsonl")
    )
    monkeypatch.delenv("LIGHTLY_TRAIN_EVENTS_DISABLED", raising=False)
    tracker.track_training_started(
        task_type="ssl_pretraining", model="dinov2/vittest14",
        method="dinov2", batch_size=8, devices=1, steps=10,
    )
    assert not (tmp_path / "events.jsonl").exists()


def test_enabled_writes_local_jsonl(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "LIGHTLY_TRAIN_EVENTS_FILE", str(tmp_path / "events.jsonl")
    )
    monkeypatch.setenv("LIGHTLY_TRAIN_EVENTS_DISABLED", "0")
    monkeypatch.setenv(
        "LIGHTLY_TRAIN_CACHE_DIR", str(tmp_path / "cache")
    )
    tracker._last_event_time.clear()
    tracker.track_training_started(
        task_type="semantic_segmentation", model="dinov3/vits16-eomt",
        method="EoMTSemanticSegmentationTrainModel", batch_size=16,
        devices=8, steps=100,
    )
    tracker.track_inference_started(
        task_type="embedding", model="dinov2/vitb14", batch_size=128,
    )
    lines = (tmp_path / "events.jsonl").read_text().strip().splitlines()
    events = [json.loads(line) for line in lines]
    assert [e["event"] for e in events] == [
        "training_started", "inference_started",
    ]
    p = events[0]["properties"]
    assert p["model_name"] == "dinov3/vits16-eomt"
    assert p["steps"] == 100 and p["devices"] == 8
    assert "version" in p and "os" in p


def test_rate_limited_per_event_name(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "LIGHTLY_TRAIN_EVENTS_FILE", str(tmp_path / "events.jsonl")
    )
    monkeypatch.setenv("LIGHTLY_TRAIN_EVENTS_DISABLED", "0")
    monkeypatch.setenv("LIGHTLY_TRAIN_CACHE_DIR", str(tmp_path / "cache"))
    tracker._last_event_time.clear()
    for _ in range(5):
        tracker.track_event("spam", {"x": 1})
    lines = (tmp_path / "events.jsonl").read_text().strip().splitlines()
    assert len(lines) == 1
