"""Orbax checkpointing: train state + exported inference artifact.

Rebuild of the reference two-tier artifact model (SURVEY.md §5.4):
- ``out/checkpoints/`` — full resumable train state (params, opt state,
  method state, step) written with Orbax (sharded + async-capable);
- ``out/exported_models/exported_last.*`` — inference artifact holding the
  backbone params + metadata (``model_name`` + init args), the analog of the
  reference's ``{model_class_path, model_init_args, state_dict}`` contract
  (``train_task.py:1858-1867``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from lightly_train_tpu._logging import get_logger

logger = get_logger("checkpoint")


class CheckpointManager:
    """Thin wrapper over Orbax CheckpointManager for train-state save/resume."""

    def __init__(self, ckpt_dir: Path, max_to_keep: int = 2):
        self.ckpt_dir = Path(ckpt_dir).resolve()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.ckpt_dir}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self) -> None:
        self._mgr.close()


def export_model(
    out_path: Path,
    model_name: str,
    backbone_params: Any,
    model_state: Optional[Dict[str, Any]] = None,
    extra_meta: Optional[Dict[str, Any]] = None,
    embed_head: Optional[Dict[str, Any]] = None,
) -> None:
    """Write the inference artifact: variables (orbax) + metadata JSON.

    ``model_state`` carries non-param collections (BatchNorm stats) so CNN
    backbones are inference-complete. Loaded by ``load_model``/``embed``/task
    fine-tuning as the pretrained backbone initialization. ``embed_head``
    (optional, with ``embed_dim`` in ``extra_meta``) stores the trained
    embedding projection as a sibling tree the ``embed`` command applies —
    the reference's two artifact parts, model vs embedding_model
    (``_commands/export.py`` part=).
    """
    out_path = Path(out_path).resolve()
    out_path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    variables = {"params": backbone_params, **(model_state or {})}
    variables = jax.device_get(variables)
    ckptr.save(out_path / "params", variables, force=True)
    if embed_head is not None:
        ckptr.save(out_path / "embed_head", jax.device_get(embed_head), force=True)
    ckptr.wait_until_finished()
    meta = {"model_name": model_name, "format_version": 1}
    if extra_meta:
        meta.update(extra_meta)
    (out_path / "metadata.json").write_text(json.dumps(meta, indent=2))
    logger.info("Exported model '%s' to %s", model_name, out_path)


def resolve_pretrained_source(
    checkpoint: str, model_name: str
) -> tuple[Dict[str, Any], str, Optional[Dict[str, Any]]]:
    """Resolve a user ``checkpoint`` argument to
    (variables, model_name, embed_head | None).

    Accepts an exported-artifact directory, a raw torch ``.pth``/``.pt``
    file (converted for ``model_name``), or the literal ``"auto"`` to fetch
    the model's registered public weights — the same contract on pretrain
    (further-pretraining init, reference ``_commands/train.py:134-141``)
    and on every ``train_*`` fine-tune entry point.

    ``variables`` is a flax variables dict ({"params": ..., possibly
    "batch_stats": ...}); an exported artifact overrides ``model_name``
    with the name it was exported under and carries its ``embed_dim``
    projection head when it was pretrained with one.
    """
    ckpt = checkpoint
    if ckpt == "auto":
        from lightly_train_tpu.models.pretrained_urls import fetch_pretrained

        ckpt = str(fetch_pretrained(model_name))
    path = Path(ckpt)
    if path.is_file():
        # Raw torch checkpoint (Meta / timm / torchvision naming).
        from lightly_train_tpu.models.convert import (
            load_torch_checkpoint_for_model,
        )

        return (
            load_torch_checkpoint_for_model(path, model_name),
            model_name,
            None,
        )
    artifact = load_exported_model(path)
    return (
        artifact["variables"],
        artifact["model_name"],
        artifact.get("embed_head"),
    )


def load_exported_model(path: Path) -> Dict[str, Any]:
    """Read an exported artifact: {model_name, variables, params, ...meta}.

    ``variables`` is the full flax variables dict ({"params": ..., possibly
    "batch_stats": ...}); ``params`` is kept as an alias of
    ``variables["params"]`` for flat consumers.
    """
    path = Path(path).resolve()
    meta = json.loads((path / "metadata.json").read_text())
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(path / "params")
    out = {**meta, "variables": variables, "params": variables["params"]}
    if (path / "embed_head").exists():
        out["embed_head"] = ckptr.restore(path / "embed_head")
    return out
