"""CLI: ``python -m lightly_train_tpu <command> key=value ...``.

Rebuild of ``src/lightly_train/_cli.py:398-537``: OmegaConf-style dotted
``key=value`` overrides parsed into the same pydantic configs as the Python
API. Commands: pretrain, embed, export, list_models, list_methods (+ train
as a deprecated alias of pretrain).
"""

from __future__ import annotations

import json
import sys
from typing import Any, Dict, List


def _parse_value(raw: str) -> Any:
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def parse_cli_overrides(argv: List[str]) -> Dict[str, Any]:
    """Parse ``a.b=1 c="x"`` into a nested dict."""
    out: Dict[str, Any] = {}
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(
                f"Invalid argument '{arg}'; expected key=value (dotted keys ok)."
            )
        key, raw = arg.split("=", 1)
        value = _parse_value(raw)
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise SystemExit(f"Conflicting CLI key '{key}'.")
        node[parts[-1]] = value
    return out


_HELP = """\
lightly-train-tpu — TPU-native vision pretraining & fine-tuning

Usage: python -m lightly_train_tpu <command> [key=value ...]

Commands:
  pretrain              Pretrain a model (out=... data=... model=... method=...)
  train                 Deprecated alias of pretrain
  embed                 Write embeddings (out=... data=... checkpoint=...)
  export                Export a trained model (out=... checkpoint=... format=...)
  export_stablehlo      Export a deployment artifact (out=... checkpoint=...)
  export_savedmodel     Export a TF SavedModel via jax2tf (out=... checkpoint=...)
  export_onnx           Export an ONNX model (out=... checkpoint=... precision=fp32|fp16)
  predict_semantic_segmentation
                        Autolabel a directory (out=... data=... checkpoint=...)
  benchmark_object_detection
                        Latency/mAP harness (checkpoint=...)
  extract_video_frames  ffmpeg frame extraction (out=... data=...)
  evaluate_knn          kNN eval of a backbone (data=... checkpoint=...)
  list_models           List available models
  list_methods          List available pretraining methods
"""


def main(argv: List[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(_HELP)
        return 0
    command, rest = argv[0], argv[1:]
    if command == "list_models":
        from lightly_train_tpu import list_models

        print("\n".join(list_models()))
        return 0
    if command == "list_methods":
        from lightly_train_tpu import list_methods

        print("\n".join(list_methods()))
        return 0
    overrides = parse_cli_overrides(rest)
    if command in ("pretrain", "train"):
        from lightly_train_tpu._commands.train import pretrain

        if command == "train":
            print("WARNING: 'train' is deprecated; use 'pretrain'.",
                  file=sys.stderr)
        pretrain(**overrides)
        return 0
    if command == "embed":
        from lightly_train_tpu._commands.embed import embed

        embed(**overrides)
        return 0
    if command == "export":
        from lightly_train_tpu._commands.export import export

        export(**overrides)
        return 0
    if command == "export_stablehlo":
        from lightly_train_tpu._commands.export_task import export_stablehlo

        export_stablehlo(**overrides)
        return 0
    if command == "export_savedmodel":
        from lightly_train_tpu._commands.export_task import export_savedmodel

        export_savedmodel(**overrides)
        return 0
    if command == "export_onnx":
        from lightly_train_tpu._commands.export_task import export_onnx

        export_onnx(**overrides)
        return 0
    if command == "predict_semantic_segmentation":
        from lightly_train_tpu._commands.predict_task import (
            predict_semantic_segmentation,
        )

        predict_semantic_segmentation(**overrides)
        return 0
    if command == "benchmark_object_detection":
        from lightly_train_tpu._commands.benchmark_task import (
            benchmark_object_detection,
        )

        print(json.dumps(benchmark_object_detection(**overrides), indent=2))
        return 0
    if command == "extract_video_frames":
        from lightly_train_tpu._commands.extract_video_frames import (
            extract_video_frames,
        )

        extract_video_frames(**overrides)
        return 0
    if command == "evaluate_knn":
        from lightly_train_tpu._commands.eval_knn import evaluate_knn

        print(json.dumps(evaluate_knn(**overrides)))
        return 0
    print(f"Unknown command '{command}'.\n\n{_HELP}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
