"""Training-script template rendering.

Rebuild of the reference's script templates
(``/root/reference/templates/train_object_detection.jinja2``): renders a
ready-to-run, commented fine-tuning script from a parameter dict — used by
docs tooling and quick-start generators.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

TEMPLATE_DIR = Path(__file__).resolve().parents[1] / "templates"


def render_training_template(task: str = "object_detection", **params: Any) -> str:
    """Render ``templates/train_<task>.jinja2`` with ``params``.

    The output is a complete python script (``ast``-parseable) calling the
    matching ``lightly_train_tpu.train_<task>`` entry point.
    """
    import jinja2

    path = TEMPLATE_DIR / f"train_{task}.jinja2"
    if not path.exists():
        available = sorted(
            p.stem.removeprefix("train_") for p in TEMPLATE_DIR.glob("train_*.jinja2")
        )
        raise ValueError(
            f"No template for task '{task}'. Available: {available}"
        )
    env = jinja2.Environment(undefined=jinja2.ChainableUndefined)
    return env.from_string(path.read_text()).render(**params)
