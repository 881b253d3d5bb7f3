"""``embed`` command: write embeddings for a directory of images.

Rebuild of ``src/lightly_train/_commands/embed.py:42`` + ``_embedding/``:
loads an exported pretrain artifact, runs batched inference over the dataset
on the mesh, and writes embeddings in ``csv`` | ``lightly_csv`` | ``torch``
format (torch format is an ``.npz`` here — the artifact consumers in this
framework are JAX/numpy; a ``.pt`` writer keeps reference compatibility when
torch is importable).
"""

from __future__ import annotations

import csv as csv_module
from pathlib import Path
from typing import Any, Dict, List, Literal, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from lightly_train_tpu._checkpoint.checkpoint import load_exported_model
from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._data import ImageDataset, list_image_files
from lightly_train_tpu._logging import get_logger, set_up_console_logging
from lightly_train_tpu.models.package_registry import get_wrapped_model
from lightly_train_tpu.parallel import get_default_mesh
from lightly_train_tpu.parallel.mesh import batch_sharding
from lightly_train_tpu.types import EmbeddingFormat

logger = get_logger("embed")


class EmbedConfig(PydanticConfig):
    out: str
    data: str
    checkpoint: str
    format: EmbeddingFormat = EmbeddingFormat.NPZ
    image_size: int = 224
    batch_size: int = 128
    precision: Literal["bf16", "fp32"] = "fp32"


def embed(out: str, data: str, checkpoint: str, **kwargs: Any) -> Path:
    config = pydantic_model_validate(
        EmbedConfig,
        {"out": out, "data": data, "checkpoint": checkpoint, **kwargs},
    )
    return embed_from_config(config)


def embed_from_config(config: EmbedConfig) -> Path:
    set_up_console_logging()
    artifact = load_exported_model(Path(config.checkpoint))
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    wrapped = get_wrapped_model(artifact["model_name"], dtype=dtype)
    from lightly_train_tpu._events import tracker

    tracker.track_inference_started(
        task_type="embedding", model=artifact["model_name"],
        batch_size=config.batch_size,
    )

    mesh = get_default_mesh()
    files = list_image_files(Path(config.data))
    dataset = ImageDataset(files, (config.image_size, config.image_size))

    variables = artifact["variables"]

    # Artifacts pretrained with embed_dim carry the trained projection head
    # as a sidecar; embeddings come out at the configured dimension
    # (reference EmbeddingModel, ``_models/embedding_model.py:22-80``).
    embed_head_vars = artifact.get("embed_head")
    embed_head = None
    if embed_head_vars is not None:
        from lightly_train_tpu.models.embedding import _EmbedHead

        embed_head = _EmbedHead(int(artifact["embed_dim"]), dtype=dtype)

    @jax.jit
    def forward(imgs: jax.Array) -> jax.Array:
        x = imgs.astype(dtype) / 255.0
        out_feats = wrapped.forward_features(variables, x, train=False)
        pooled = wrapped.forward_pool(out_feats)
        if embed_head is not None:
            pooled = embed_head.apply(embed_head_vars, pooled)
        return pooled.astype(jnp.float32)

    b_sharding = batch_sharding(mesh)
    embeddings: List[np.ndarray] = []
    bs = config.batch_size
    n = len(dataset)
    for start in range(0, n, bs):
        idx = list(range(start, min(start + bs, n)))
        batch = np.stack([dataset[i] for i in idx])
        pad = bs - len(idx)
        if pad:
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                    batch.dtype)])
        z = forward(jax.device_put(batch, b_sharding))
        embeddings.append(np.asarray(z)[: len(idx)])
    emb = np.concatenate(embeddings, axis=0)

    out_path = Path(config.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fmt = config.format
    if fmt in ("csv", "lightly_csv"):
        with open(out_path, "w", newline="") as f:
            writer = csv_module.writer(f)
            if fmt == "lightly_csv":
                writer.writerow(
                    ["filenames"] + [f"embedding_{i}" for i in range(emb.shape[1])]
                )
            for fn, row in zip(files, emb):
                writer.writerow([fn] + [f"{v:.8f}" for v in row])
    elif fmt == "torch":
        import torch

        torch.save(
            {"embeddings": torch.from_numpy(emb), "filenames": files}, out_path
        )
    else:
        np.savez(out_path, embeddings=emb, filenames=np.asarray(files))
    logger.info("Wrote %d embeddings (dim %d) to %s", len(files), emb.shape[1],
                out_path)
    return out_path
