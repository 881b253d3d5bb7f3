"""``export`` command: export a trained backbone from a pretrain run.

Rebuild of ``src/lightly_train/_commands/export.py`` (171 LoC): reads the
pretrain output (checkpoint or already-exported artifact) and re-exports in
the requested format:

- ``package_default`` — the Orbax params + metadata artifact (native format);
- ``numpy_state_dict`` — flat ``{path: np.ndarray}`` .npz;
- ``torch_state_dict`` — flat torch ``.pt`` state dict (keys use '/'
  separators) for handing weights back to torch consumers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

from lightly_train_tpu._checkpoint.checkpoint import (
    export_model,
    load_exported_model,
)
from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._logging import get_logger, set_up_console_logging
from lightly_train_tpu.errors import ConfigError
from lightly_train_tpu.types import ModelFormat, ModelPart

logger = get_logger("export")


def flatten_params(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(flatten_params(v, f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


class ExportConfig(PydanticConfig):
    out: str
    checkpoint: str
    part: ModelPart = ModelPart.MODEL
    format: ModelFormat = ModelFormat.PACKAGE_DEFAULT


def export(out: str, checkpoint: str, **kwargs: Any) -> Path:
    config = pydantic_model_validate(
        ExportConfig, {"out": out, "checkpoint": checkpoint, **kwargs}
    )
    return export_from_config(config)


def export_from_config(config: ExportConfig) -> Path:
    set_up_console_logging()
    artifact = load_exported_model(Path(config.checkpoint))
    out_path = Path(config.out)
    embed_head = artifact.get("embed_head")
    if config.part == "embedding_model" and embed_head is None:
        raise ConfigError(
            "The checkpoint has no embedding head: pretrain with embed_dim= "
            "to train one, or export part='model' (reference export part=, "
            "_commands/export.py)."
        )
    # Flat per-leaf head entries for the numpy state dict (flax layout).
    head_flat = (
        {f"embed_head/{k}": v
         for k, v in flatten_params(embed_head["params"]["embed"]).items()}
        if config.part == "embedding_model"
        else {}
    )
    if config.format == "package_default":
        model_state = {
            k: v for k, v in artifact["variables"].items() if k != "params"
        }
        skip_meta = {"params", "variables", "embed_head", "model_name"}
        if config.part != "embedding_model":
            # The head is dropped, so the metadata must not claim one.
            skip_meta.add("embed_dim")
        export_model(
            out_path,
            artifact["model_name"],
            artifact["params"],
            model_state=model_state or None,
            extra_meta={
                k: v for k, v in artifact.items() if k not in skip_meta
            },
            embed_head=embed_head if config.part == "embedding_model" else None,
        )
        return out_path
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if config.format == "numpy_state_dict":
        flat = {**flatten_params(artifact["params"]), **head_flat}
        np.savez(out_path, **flat)
    else:
        import torch

        model_name = str(artifact.get("model_name", ""))
        params = artifact["params"]
        if (
            model_name.startswith(("dinov2/", "dinov3/"))
            and "convnext" not in model_name
            and "block0" in params
        ):
            # ViT backbones export with Meta torch naming so the state dict
            # loads directly into the reference's vendored modules
            # (reverse of the import converter).
            from lightly_train_tpu.models.convert import (
                convert_flax_vit_to_torch_state_dict,
            )

            depth = sum(
                1 for k in params if k.startswith("block") and k[5:].isdigit()
            )
            flat = convert_flax_vit_to_torch_state_dict(params, depth)
        else:
            flat = flatten_params(params)
        if config.part == "embedding_model":
            # torch consumers expect nn.Linear naming and (out, in) weight
            # layout, not the flax (in, out) kernel.
            head = embed_head["params"]["embed"]
            flat = {
                **flat,
                "embed_head.weight": np.asarray(head["kernel"]).T,
                "embed_head.bias": np.asarray(head["bias"]),
            }
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in flat.items()},
                   out_path)
    logger.info("Exported %s (%d tensors) to %s", config.format.value,
                len(flat), out_path)
    return out_path
