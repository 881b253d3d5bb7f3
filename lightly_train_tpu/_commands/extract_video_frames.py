"""``extract_video_frames``: parallel ffmpeg frame extraction.

Rebuild of ``src/lightly_train/_commands/extract_video_frames.py:54``:
one ffmpeg subprocess per video (thread pool), frames written as JPEGs into
``out/<video_stem>/``; configurable fps filter and quality.
"""

from __future__ import annotations

import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, List, Optional

from lightly_train_tpu._configs.config import PydanticConfig
from lightly_train_tpu._configs.validate import pydantic_model_validate
from lightly_train_tpu._logging import get_logger, set_up_console_logging
from lightly_train_tpu.errors import ConfigError, DatasetError

logger = get_logger("video")

VIDEO_EXTENSIONS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v", ".mpg"}


class ExtractVideoFramesConfig(PydanticConfig):
    out: str
    data: str
    frame_filename_format: str = "%09d.jpg"
    fps: Optional[float] = None
    quality: int = 2  # ffmpeg -q:v (2 = high)
    num_workers: int = 4


def extract_video_frames(out: str, data: str, **kwargs: Any) -> Path:
    config = pydantic_model_validate(
        ExtractVideoFramesConfig, {"out": out, "data": data, **kwargs}
    )
    set_up_console_logging()
    if shutil.which("ffmpeg") is None:
        raise ConfigError(
            "ffmpeg is not installed; extract_video_frames requires it."
        )
    data_dir = Path(config.data)
    videos: List[Path] = sorted(
        p for p in data_dir.rglob("*")
        if p.suffix.lower() in VIDEO_EXTENSIONS and p.is_file()
    )
    if not videos:
        raise DatasetError(f"No videos found under {data_dir}")
    out_dir = Path(config.out)

    def extract(video: Path) -> int:
        frame_dir = out_dir / video.stem
        frame_dir.mkdir(parents=True, exist_ok=True)
        cmd = ["ffmpeg", "-y", "-i", str(video), "-q:v", str(config.quality)]
        if config.fps is not None:
            cmd += ["-vf", f"fps={config.fps}"]
        cmd += [str(frame_dir / config.frame_filename_format)]
        result = subprocess.run(cmd, capture_output=True)
        if result.returncode != 0:
            raise RuntimeError(
                f"ffmpeg failed for {video}: {result.stderr.decode()[-500:]}"
            )
        return len(list(frame_dir.iterdir()))

    with ThreadPoolExecutor(max_workers=config.num_workers) as pool:
        counts = list(pool.map(extract, videos))
    logger.info(
        "Extracted %d frames from %d videos into %s",
        sum(counts), len(videos), out_dir,
    )
    return out_dir
