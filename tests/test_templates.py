"""Training-script template rendering (reference:
``tests/templates/test_train_object_detection.py:25-50`` renders the jinja
template and checks the output is a runnable script)."""

import ast

import pytest

from lightly_train_tpu._templates import render_training_template


def test_render_coco_defaults_parses():
    script = render_training_template(
        task="object_detection",
        out="runs/det",
        model="dinov3/vits16-ltdetr",
        train_annotations="data/train.json",
        train_images="data/train",
    )
    tree = ast.parse(script)  # must be a valid python script
    assert "lightly_train_tpu.train_object_detection(" in script
    assert '"format": "coco"' in script
    # Unset optionals render as documented defaults, not as blanks.
    assert 'batch_size="auto"' in script
    assert 'steps="auto"' in script
    assert "checkpoint=" not in script  # kwarg omitted when not provided
    # Exactly one top-level expression: the train_* call.
    exprs = [n for n in tree.body if isinstance(n, ast.Expr)]
    assert len(exprs) == 1 and isinstance(exprs[0].value, ast.Call)


def test_render_yolo_with_val_and_numbers():
    script = render_training_template(
        task="object_detection",
        out="runs/det",
        model="ltdetrv2-s",
        data_format="yolo",
        num_classes=13,
        train_images="d/train/images",
        train_labels="d/train/labels",
        val_images="d/val/images",
        val_labels="d/val/labels",
        checkpoint="runs/pre/exported_models/exported_last",
        batch_size=64,
        steps=5000,
        learning_rate=2e-4,
    )
    ast.parse(script)
    assert '"num_classes": 13' in script
    assert "batch_size=64" in script
    assert "steps=5000" in script
    assert "learning_rate=0.0002" in script
    assert "exported_last" in script
    assert '"val"' in script


def test_unknown_task_lists_available():
    with pytest.raises(ValueError, match="object_detection"):
        render_training_template(task="nope")
