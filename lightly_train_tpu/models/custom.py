"""Custom-model package: wrap any user Flax module as a backbone.

Rebuild of the reference custom package
(``src/lightly_train/_models/custom/custom_package.py:1-66``), which accepts
any user ``nn.Module`` implementing the feature-extraction protocol. Here a
user module qualifies if its ``__call__(images, ...)`` returns either

- a dict with a ``features`` (B, H, W, D) entry (``cls_token`` /
  ``patch_tokens`` optional — pooled/flattened views are derived), or
- a bare (B, H, W, D) feature map.

``get_wrapped_model`` (and therefore ``pretrain(model=...)`` /
``train_*(model=...)``) accept the module or a ready ``WrappedModel``
directly; ``feature_dim`` is inferred with ``jax.eval_shape`` (no real
compute), and optional ``train=``/``mask=`` kwargs are detected from the
call signature.
"""

from __future__ import annotations

import inspect
import itertools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightly_train_tpu.errors import ConfigError
from lightly_train_tpu.models.wrapper import WrappedModel

_counter = itertools.count()


class _CustomAdapter(nn.Module):
    """Normalizes a user module onto the WrappedModel output contract."""

    inner: nn.Module
    accepts_train: bool
    accepts_mask: bool

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        kwargs: Dict[str, Any] = {}
        if self.accepts_train:
            kwargs["train"] = train
        if self.accepts_mask:
            kwargs["mask"] = mask
        out = self.inner(images, **kwargs)
        if isinstance(out, dict):
            feats = out.get("features")
            if feats is None:
                raise ConfigError(
                    "Custom model dict output must contain a 'features' "
                    "(B, H, W, D) entry."
                )
            result = dict(out)
        else:
            if out.ndim != 4:
                raise ConfigError(
                    "Custom model must return (B, H, W, D) features or a "
                    f"dict with a 'features' entry; got shape {out.shape}."
                )
            feats = out
            result = {"features": feats}
        B, H, W, D = feats.shape
        result.setdefault("patch_tokens", feats.reshape(B, H * W, D))
        result.setdefault("cls_token", jnp.mean(feats, axis=(1, 2)))
        return result


def _call_signature_flags(module: nn.Module) -> Tuple[bool, bool]:
    try:
        params = inspect.signature(type(module).__call__).parameters
    except (TypeError, ValueError):
        return False, False
    return "train" in params, "mask" in params


def wrap_custom_module(
    module: nn.Module,
    name: Optional[str] = None,
    sample_hw: Tuple[int, int] = (64, 64),
) -> WrappedModel:
    """Wrap a user Flax module into a WrappedModel (feature dim inferred)."""
    accepts_train, accepts_mask = _call_signature_flags(module)
    adapter = _CustomAdapter(
        inner=module, accepts_train=accepts_train, accepts_mask=accepts_mask
    )

    def _shape_probe():
        sample = jnp.zeros((1, sample_hw[0], sample_hw[1], 3), jnp.float32)
        variables = adapter.init(
            {"params": jax.random.key(0), "droppath": jax.random.key(1)},
            sample,
            train=False,
        )
        return adapter.apply(variables, sample, train=False)

    try:
        out_shapes = jax.eval_shape(_shape_probe)
    except ConfigError:
        raise
    except Exception as e:  # noqa: BLE001 - surface as a config problem
        raise ConfigError(
            f"Custom model is not compatible with the backbone protocol: {e}"
        ) from e
    feature_dim = out_shapes["features"].shape[-1]
    model_name = name or f"custom/{type(module).__name__.lower()}{next(_counter)}"
    return WrappedModel(
        name=model_name,
        module=adapter,
        feature_dim=int(feature_dim),
        patch_size=None,
        architecture="conv",
        supports_mask=True,  # adapter always takes mask (forwarded if usable)
    )
