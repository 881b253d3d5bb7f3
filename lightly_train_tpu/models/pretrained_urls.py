"""Pretrained-checkpoint URL registry + verified fetch.

Rebuild of the reference's weight-download path: the reference maps model
names to public checkpoint URLs (Meta DINOv2:
``_models/dinov2_vit/dinov2_vit_src/configs/__init__.py:38-70``; DINOv3
distilled weights: ``_models/dinov3/dinov3_package.py:83-428``) and fetches
them into a per-user cache directory on first use.

This environment has no egress, so the fetch is gated: a clear error names
the URL and the local-path alternative (every converter accepts a local
``.pth``). ``fetch_pretrained`` itself is fully functional and tested via
``file://`` URLs, with optional sha256 verification and cache reuse.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.error
import urllib.request
from pathlib import Path
from typing import Dict, Optional

from lightly_train_tpu._env import Env
from lightly_train_tpu._logging import get_logger

logger = get_logger("pretrained")

# Public checkpoint URLs (same artifacts the reference downloads; the Meta
# DINOv2 set from dl.fbaipublicfiles.com, reference configs/__init__.py).
PRETRAINED_URLS: Dict[str, str] = {
    "dinov2/vits14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_reg4_pretrain.pth",
    "dinov2/vitb14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitb14/dinov2_vitb14_reg4_pretrain.pth",
    "dinov2/vitl14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitl14/dinov2_vitl14_reg4_pretrain.pth",
    "dinov2/vitg14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitg14/dinov2_vitg14_reg4_pretrain.pth",
    "dinov2/vits14-noreg": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_pretrain.pth",
    "dinov2/vitb14-noreg": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitb14/dinov2_vitb14_pretrain.pth",
}


def cache_dir() -> Path:
    d = Env.LIGHTLY_TRAIN_CACHE_DIR.value / "weights"
    d.mkdir(parents=True, exist_ok=True)
    return d


def fetch_pretrained(
    model_name: str,
    url: Optional[str] = None,
    sha256: Optional[str] = None,
    dest_dir: Optional[Path] = None,
) -> Path:
    """Download (or reuse from cache) the checkpoint for ``model_name``.

    Returns the local path. Raises a descriptive error when the model has
    no registered URL or the environment has no network egress.
    """
    url = url or PRETRAINED_URLS.get(model_name)
    if url is None:
        raise ValueError(
            f"No pretrained URL registered for '{model_name}'. Pass a local "
            "checkpoint path instead (converters accept raw torch .pth "
            "files), or register a URL in models/pretrained_urls.py."
        )
    dest_dir = dest_dir or cache_dir()
    dest = dest_dir / Path(url.split("?")[0]).name
    if dest.exists():
        if sha256 and _sha256(dest) != sha256:
            logger.warning("Cached %s fails checksum; re-downloading", dest)
            dest.unlink()
        else:
            return dest
    # Unique temp name: concurrent processes (multi-host pods sharing the
    # cache dir) must not interleave writes into one .part file; os.replace
    # makes the final publish atomic, last-writer-wins with identical bytes.
    tmp = dest.with_suffix(f"{dest.suffix}.{os.getpid()}.part")
    try:
        with urllib.request.urlopen(url, timeout=60) as r, open(
            tmp, "wb"
        ) as f:
            shutil.copyfileobj(r, f)
    except urllib.error.HTTPError as e:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"Download of {url} failed with HTTP {e.code} {e.reason}. The "
            "URL may have moved; pass a local checkpoint path "
            "(checkpoint=...) instead."
        ) from e
    except Exception as e:  # URLError, IncompleteRead, timeout, disk...
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"Could not download {url} ({type(e).__name__}: {e}). If this "
            "environment has no network egress, download the file elsewhere "
            "and pass its local path (checkpoint=...) — the converter "
            "accepts the raw .pth."
        ) from e
    if sha256 and _sha256(tmp) != sha256:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(f"Checksum mismatch for {url}")
    os.replace(tmp, dest)
    logger.info("Downloaded %s -> %s", url, dest)
    return dest


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
