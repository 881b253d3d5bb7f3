"""Task model zoo: reference checkpoint registry + conversion-on-load.

Rebuild of the reference's downloadable-model registry
(``_task_models/task_model_helpers.py:46-289`` + the ``ModelAlias``
registrations in each task family's ``config.py``): every zoo name maps to
{checkpoint filename, sha256, family}. ``resolve_zoo_checkpoint`` downloads
(or reuses from cache, sha256-verified) and ``load_model_from_torch_zoo``
converts the torch checkpoint into this package's task models on the fly:

- EoMT semantic / instance / panoptic checkpoints convert exactly
  (``models/convert.convert_torch_eomt_state_dict`` — the trunk is
  parameter-isomorphic, trajectory-parity-tested);
- Depth-Anything checkpoints convert via
  ``tasks.depth_anything.convert_depth_anything_state_dict``;
- LT-DETR detection / instance-segmentation checkpoints convert exactly for
  every backbone family (ECViT, DINOv3 ViT + DINOSTAs, DINOv3 ConvNeXt,
  legacy DINOv2): the encoder/decoder are parameter-isomorphic since r4 and
  ``tasks/detection/convert.py`` maps both the D-FINE and RT-DETRv2 decoder
  layouts;
- PicoDet checkpoints convert via ``tasks/detection/picodet.py``'s
  converter.

URLs point at the reference's public bucket; ``file://`` URLs work for
air-gapped round trips (tests/tasks/test_task_zoo.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

from lightly_train_tpu.errors import CheckpointError

# The reference's public checkpoint bucket (task_model_helpers.py:46-48).
ZOO_BASE_URL = "https://lightly-train-checkpoints.s3.us-east-1.amazonaws.com/"

# name -> (checkpoint filename or absolute URL, sha256, family)
TASK_ZOO: Dict[str, Tuple[str, str, str]] = {
    "dinov2/dav2-metric-small-hypersim": (
        "dinov2_dav2_metric_small_hypersim_260629_d5957701.pt",
        "d59577016e01635c285fac76f44685d7a0878545e0b8d560da45c0cf4d058548",
        "depth_estimation",
    ),
    "dinov2/dav2-relative-small": (
        "dinov2_dav2_relative_small_260629_bb09402a.pt",
        "bb09402aca18dab407707254967b7a1b3cec3dc3707777697ce6101db15d6172",
        "depth_estimation",
    ),
    "dinov2/dav3-metric-large": (
        "dinov2_dav3_metric_large_260629_6fd208f2.pt",
        "6fd208f22eaccf9007e9e67fb9cad95cc47016c8d00bc74c7fe69ec34185c06b",
        "depth_estimation",
    ),
    "dinov2/dav3-metric-small": (
        "dinov2_dav3_metric_small_260713_96a7cd93.pt",
        "96a7cd93ea7175b49bf83f061c76e1e61a807358552b79b5da62f4139b9e862a",
        "depth_estimation",
    ),
    "dinov2/dav3-relative-large": (
        "dinov2_dav3_relative_large_260629_9c2e9320.pt",
        "9c2e932085843bbd960e16bc80917b6591e99fc6fd3907ded7bda68d35368e49",
        "depth_estimation",
    ),
    "dinov2/dav3-relative-small": (
        "dinov2_dav3_relative_small_260710_dcc2463f.pt",
        "dcc2463f7fa07606cb1352236889e636a10cc3db64ec31a227a20cc88ce6c21d",
        "depth_estimation",
    ),
    "dinov2/vits14-noreg-ltdetr-coco": (
        "dinov2_vits14_noreg_ltdetr_coco_251218_4e1f523d.pt",
        "4e1f523db68c94516ee5b35a91f24267657af474bea58b52a7f7e51ec2d8f717",
        "object_detection",
    ),
    "dinov3/convnext-base-ltdetr-coco": (
        "dinov3_convnext_base_ltdetr_coco_251218_836adb6b.pt",
        "836adb6b5122665a24b6da3ee1720b9f3d0fc3c30cee44cfbd98dcb79fe0809a",
        "object_detection",
    ),
    "dinov3/convnext-large-ltdetr-coco": (
        "dinov3_convnext_large_ltdetr_coco_251218_03fe6750.pt",
        "03fe6750392daf3ecd32bbab3f144bd5c4d6cdc8bd75635f9e1c5e296e7dd8b0",
        "object_detection",
    ),
    "dinov3/convnext-small-ltdetr-coco": (
        "dinov3_convnext_small_ltdetr_coco_251218_8f7109ab.pt",
        "8f7109ab406aa92791e4e4ca6249ab9a863734795676c81b91dbd4cc4b1ef387",
        "object_detection",
    ),
    "dinov3/convnext-tiny-ltdetr-coco": (
        "dinov3_convnext_tiny_ltdetr_coco_251218_35bbc4fb.pt",
        "35bbc4fbec3bb9fa113a33f1013abaab1952edf3335f98624b5914812d63d26c",
        "object_detection",
    ),
    "dinov3/dav3-metric-tiny": (
        "dinov3_dav3_metric_tiny_260716_111dd31c.pt",
        "111dd31cd8d19caaaaeca92ba109e5f01f6ff02293386e0c42e30d035ec590a2",
        "depth_estimation",
    ),
    "dinov3/dav3-metric-tiny-plus": (
        "dinov3_dav3_metric_tiny_plus_260714_c7b1e414.pt",
        "c7b1e4143d63c73eb0bbdf40e3d94d77f1cc4af027fe223fdeb6f97256d7f964",
        "depth_estimation",
    ),
    "dinov3/dav3-relative-tiny": (
        "dinov3_dav3_relative_tiny_260714_90a26f4b.pt",
        "90a26f4bfadc24d30192094c3f4dc52852c70a7f15ceec95b9d303cec3ea1647",
        "depth_estimation",
    ),
    "dinov3/dav3-relative-tiny-plus": (
        "dinov3_dav3_relative_tiny_plus_260713_5bff49b8.pt",
        "5bff49b8b07810cd0b6f1551a5be85538a2eab1d0aaf9f2a34ab3bb2124a48d0",
        "depth_estimation",
    ),
    "dinov3/vitb16-eomt-ade20k": (
        "dinov3_eomt/lightlytrain_dinov3_eomt_vitb16_autolabel_sun397.pt",
        "400f7a1b42a7b67babf253d6aade0be334173d70e7351a01159698ac2d2335ca",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitb16-eomt-cityscapes": (
        "dinov3_eomt/lightlytrain_dinov3_eomt_vitb16_cityscapes.pt",
        "e78e6b1f372ac15c860f64445d8265fd5e9d60271509e106a92b7162096c9560",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitb16-eomt-coco": (
        "dinov3_vitb16_eomt_coco_260105_92de5e05.pt",
        "92de5e0550f51647e201eef3537a35a8bba75b4e41323b9a7df3c54e6ab400b9",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitb16-eomt-inst-coco": (
        "/dinov3_eomt/dinov3_vitb16_eomt_inst_coco.pt",
        "a57b5e7afd5cd64422d74d400f30693f80f96fa63184960250fb0878afd3c7f6",
        "instance_segmentation_eomt",
    ),
    "dinov3/vitb16-eomt-panoptic-coco": (
        "dinov3_vitb16_eomt_panoptic_coco_251209_05948298.pt",
        "0594829822a23935079c35304f3bd1c7fede802114bc1a699780df693f2dea6c",
        "panoptic_segmentation_eomt",
    ),
    "dinov3/vitb32-eomt-coco": (
        "dinov3_vitb32_eomt_coco_260106_62cf509e.pt",
        "62cf509e156257347274837087592f27743ba51722c4949bec90688859cc6b6a",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitl16-eomt-ade20k": (
        "dinov3_eomt/lightlytrain_dinov3_eomt_vitl16_ade20k.pt",
        "eb31183c70edd4df8923cba54ce2eefa517ae328cf3caf0106d2795e34382f8f",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitl16-eomt-cityscapes": (
        "dinov3_eomt/lightlytrain_dinov3_eomt_vitl16_cityscapes.pt",
        "3f397e6ca0af4555adb1da9efa489b734e35fbeac15b4c18e408c63922b41f6c",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitl16-eomt-coco": (
        "dinov3_vitl16_eomt_coco_260105_6169fdd8.pt",
        "6169fdd8edf7d4648c45c6aa1d09b9a4e917ba51dcbd36acf8fbf04a25d1e516",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitl16-eomt-inst-coco": (
        "/dinov3_eomt/dinov3_vitl16_eomt_inst_coco.pt",
        "1aac5ac16dcbc1a12cc6f8d4541bea5e7940937a49f0b1dcea7394956b6e46e5",
        "instance_segmentation_eomt",
    ),
    "dinov3/vitl16-eomt-panoptic-coco": (
        "dinov3_vitl16_eomt_panoptic_coco_251209_e0c1e6ae.pt",
        "e0c1e6aeb245dbe6fd8735ffea48b81978b66b1a320533498de4375c18ad4368",
        "panoptic_segmentation_eomt",
    ),
    "dinov3/vitl16-eomt-panoptic-coco-1280": (
        "dinov3_vitl16_eomt_panoptic_coco_1280_251209_3da0b210.pt",
        "3da0b21000bba3747bcb3e4ac4ee1e38641614022281f4b710d7442c643182f2",
        "panoptic_segmentation_eomt",
    ),
    "dinov3/vitl32-eomt-coco": (
        "dinov3_vitl32_eomt_coco_260106_f51348fb.pt",
        "f51348fb4c794889ae35b8d9e2cfe383b42e09e975d2854f2e96fed155edd7d9",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vits16-eomt-ade20k": (
        "dinov3_eomt/lightlytrain_dinov3_eomt_vits16_autolabel_sun397.pt",
        "f9f002e5adff875e0a97a3b310c26fe5e10c26d69af4e830a4a67aa7dda330aa",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vits16-eomt-cityscapes": (
        "dinov3_eomt/lightlytrain_dinov3_eomt_vits16_cityscapes.pt",
        "ef7d54eac202bb0a6707fd7115b689a748d032037eccaa3a6891b57b83f18b7e",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vits16-eomt-coco": (
        "dinov3_vits16_eomt_coco_260105_11be50b5.pt",
        "11be50b578251c974b1fdb413c76e2cd7cfe1e154f6118556bd87477ea205d5a",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vits16-eomt-inst-coco": (
        "/dinov3_eomt/dinov3_vits16_eomt_inst_coco.pt",
        "b54dafb12d550958cc5c9818b061fba0d8b819423581d02080221d0199e1cc37",
        "instance_segmentation_eomt",
    ),
    "dinov3/vits16-eomt-panoptic-coco": (
        "dinov3_vits16_eomt_panoptic_coco_251219_89e8a64f.pt",
        "89e8a64fb601c509df76d09ed6ddb6789e080147cadcff9700cf5792dfc20167",
        "panoptic_segmentation_eomt",
    ),
    "dinov3/vits16-ltdetr-coco": (
        "dinov3_vits16_ltdetr_coco_251218_4812416b.pt",
        "4812416b861a80f305889cf1408775044c8b05f1baf9be45cd4b1d0edd5d4532",
        "object_detection",
    ),
    "dinov3/vits32-eomt-coco": (
        "dinov3_vits32_eomt_coco_260106_06595b53.pt",
        "06595b53b0ee63032e8f7882a2d1e877c84b996c8313727a6694abf42e871d05",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitt16-eomt-coco": (
        "dinov3_vitt16_eomt_coco_260106_104e563e.pt",
        "104e563ebcd8b7d2842db5f0cc6f8d0e67f1607a063ab818725e9af6f6fe7c27",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitt16-eomt-inst-coco": (
        "dinov3_vitt16_eomt_inst_coco_260109_45e0aff8.pt",
        "45e0aff8c5c8054a3240fcbc368b4e7f87e8066c1e100e3ef9d9c60c7d949a17",
        "instance_segmentation_eomt",
    ),
    "dinov3/vitt16-eomt-panoptic-coco": (
        "dinov3_vitt16_eomt_panoptic_coco_260113_770c0a1f.pt",
        "770c0a1f024b9a78a6669d44968e2ab15b6d812839ce0c28732889ec5370ceea",
        "panoptic_segmentation_eomt",
    ),
    "dinov3/vitt16-ltdetr-coco": (
        "dinov3_vitt16_ltdetr_coco_251218_dfd34210.pt",
        "dfd34210a1a3375793d149a55d9b49e6e8b783458bdd4cd76fd28fa2d61dbb37",
        "object_detection",
    ),
    "dinov3/vitt16plus-eomt-coco": (
        "dinov3_vitt16plus_eomt_coco_260106_68339a7d.pt",
        "68339a7d5baa0dd6fdd88660410939eb78fc8a8c9332145b9b8ac91a2291950b",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitt16plus-eomt-inst-coco": (
        "dinov3_vitt16plus_eomt_inst_coco_260109_0e20aa05.pt",
        "0e20aa05ef15003d7d9462400d32ecc671e7a8d256ae061d42dd4f8978feb621",
        "instance_segmentation_eomt",
    ),
    "dinov3/vitt16plus-eomt-panoptic-coco": (
        "dinov3_vitt16plus_eomt_panoptic_coco_260113_25765911.pt",
        "25765911e4ebc6d735f385e8350a1c9924b4ccf08657d3868fbaa95ff4cc64e9",
        "panoptic_segmentation_eomt",
    ),
    "dinov3/vitt16plus-ltdetr-coco": (
        "dinov3_vitt16plus_ltdetr_coco_251218_af499c82.pt",
        "af499c825436013098a77a028ff5cf08dbf31118f4d68b15eefa6fdd9635f5d2",
        "object_detection",
    ),
    "dinov3/vitt32-eomt-coco": (
        "dinov3_vitt32_eomt_coco_260106_3ce75c95.pt",
        "3ce75c958aa0d31e3ac14d0bc1e0ca34ccb5b9ab5b141ec40c7f83c1950a2186",
        "semantic_segmentation_eomt",
    ),
    "dinov3/vitt32plus-eomt-coco": (
        "dinov3_vitt32plus_eomt_coco_260106_68e19609.pt",
        "68e196093301bc8a4e73005cebe1cccca75f5c14e58e732d1d9c555ea44e2088",
        "semantic_segmentation_eomt",
    ),
    "edgecrafter/ecvits-ltdetr-coco": (
        "edgecrafter_ecvits_ltdetr_coco_260720_62ff87cd.pt",
        "62ff87cd792c87e00f53da0c62ae91a63927e0ce2088c5cf018edffa513ccb6c",
        "object_detection",
    ),
    "edgecrafter/ecvits-ltdetr-seg-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvits_ltdetr_seg_coco_260721_601b9d8b.pt",
        "601b9d8b51d73105ad11feae0dfc4d8d085a12d0afac3f991e7d83f9f493d58b",
        "instance_segmentation_ltdetr",
    ),
    "edgecrafter/ecvitsplus-ltdetr-seg-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvitsplus_ltdetr_seg_coco_260721_d55b16f4.pt",
        "d55b16f48f05f18e6dd03e3c5c2a3894d0bdeaf468dc80280a727edf5086edcd",
        "instance_segmentation_ltdetr",
    ),
    "edgecrafter/ecvitt-ltdetr-coco": (
        "edgecrafter_ecvitt_ltdetr_coco_260624_f8aefe49.pt",
        "f8aefe499be1579c55bfcb288f623399ea5f4efef0c5a5f00960663efeda4f49",
        "object_detection",
    ),
    "edgecrafter/ecvitt-ltdetr-seg-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvitt_ltdetr_seg_coco_260721_5c7e0089.pt",
        "5c7e00895e10a5b8a14cb9ad1c164232a16af302719fd7a2f7de241264155c15",
        "instance_segmentation_ltdetr",
    ),
    "edgecrafter/ecvittplus-ltdetr-coco": (
        "edgecrafter_ecvittplus_ltdetr_coco_260720_723357e9.pt",
        "723357e921c77f8041f44875f5edce8645412ccc5d13fb7dca93271d525c1641",
        "object_detection",
    ),
    "edgecrafter/ecvittplus-ltdetr-seg-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvittplus_ltdetr_seg_coco_260722_4527278b.pt",
        "4527278b7e1d819fecbf72fb90554f665a506f178ef30b32f22c227107970384",
        "instance_segmentation_ltdetr",
    ),
    "ltdetrv2-l-coco": (
        "edgecrafter_ecvits_ltdetr_coco_260720_62ff87cd.pt",
        "62ff87cd792c87e00f53da0c62ae91a63927e0ce2088c5cf018edffa513ccb6c",
        "object_detection",
    ),
    "ltdetrv2-m-coco": (
        "edgecrafter_ecvittplus_ltdetr_coco_260720_723357e9.pt",
        "723357e921c77f8041f44875f5edce8645412ccc5d13fb7dca93271d525c1641",
        "object_detection",
    ),
    "ltdetrv2-s-coco": (
        "edgecrafter_ecvitt_ltdetr_coco_260624_f8aefe49.pt",
        "f8aefe499be1579c55bfcb288f623399ea5f4efef0c5a5f00960663efeda4f49",
        "object_detection",
    ),
    "ltdetrv2-seg-l-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvits_ltdetr_seg_coco_260721_601b9d8b.pt",
        "601b9d8b51d73105ad11feae0dfc4d8d085a12d0afac3f991e7d83f9f493d58b",
        "instance_segmentation_ltdetr",
    ),
    "ltdetrv2-seg-m-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvittplus_ltdetr_seg_coco_260722_4527278b.pt",
        "4527278b7e1d819fecbf72fb90554f665a506f178ef30b32f22c227107970384",
        "instance_segmentation_ltdetr",
    ),
    "ltdetrv2-seg-s-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvitt_ltdetr_seg_coco_260721_5c7e0089.pt",
        "5c7e00895e10a5b8a14cb9ad1c164232a16af302719fd7a2f7de241264155c15",
        "instance_segmentation_ltdetr",
    ),
    "ltdetrv2-seg-x-coco": (
        "ecvit_ltdetrv2_seg_coco/edgecrafter_ecvitsplus_ltdetr_seg_coco_260721_d55b16f4.pt",
        "d55b16f48f05f18e6dd03e3c5c2a3894d0bdeaf468dc80280a727edf5086edcd",
        "instance_segmentation_ltdetr",
    ),
    "picodet-l-coco": (
        "picodet_l_coco_640_260303_b1a16990.pt",
        "b1a16990fe4f86fe60aefb2dcb4bf97ead9cc616f6c14ce4638aa2b838351fff",
        "object_detection_picodet",
    ),
    "picodet-s-coco": (
        "picodet_s_coco_416_260303_23022a45.pt",
        "23022a456b2583246288041762a1a66d8d59820d5e775912cb4eb366d3a0cd68",
        "object_detection_picodet",
    ),
}


def resolve_zoo_checkpoint(name: str) -> Path:
    """Download (or reuse, sha256-verified) the zoo checkpoint for ``name``.

    Mirrors ``task_model_helpers.download_checkpoint:203-249``; the network
    fetch itself reuses the backbone checkpoint downloader
    (``models/pretrained_urls.fetch_pretrained``), so ``file://`` URLs and
    the shared cache-dir semantics apply.
    """
    from lightly_train_tpu.models.pretrained_urls import fetch_pretrained

    if name not in TASK_ZOO:
        raise CheckpointError(
            f"'{name}' is neither a local artifact path nor a known model-zoo "
            f"name. Known zoo names: {sorted(TASK_ZOO)[:8]}... "
            f"({len(TASK_ZOO)} total)."
        )
    url, sha256, _family = TASK_ZOO[name]
    if "://" not in url:
        url = ZOO_BASE_URL + url
    return fetch_pretrained(name, url=url, sha256=sha256)


_EOMT_FAMILIES = {
    "semantic_segmentation_eomt": "semantic_segmentation",
    "instance_segmentation_eomt": "instance_segmentation",
    "panoptic_segmentation_eomt": "panoptic_segmentation",
}


def load_model_from_torch_zoo(name: str, ckpt_path: Path, image_size: int):
    """torch zoo checkpoint -> LoadedTaskModel (conversion on load).

    The checkpoint layout is the reference exporter's
    (``init_model_from_checkpoint``, ``task_model_helpers.py:252-281``):
    ``{model_class_path, model_init_args, train_model}`` with state-dict keys
    prefixed ``model.``.
    """
    import torch

    from lightly_train_tpu.tasks.model_io import LoadedTaskModel

    _url, _sha, family = TASK_ZOO[name]
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    init_args = dict(ckpt.get("model_init_args", {}))
    state = {
        k[len("model."):]: v
        for k, v in ckpt.get("train_model", {}).items()
        if k.startswith("model.")
    }

    if family in _EOMT_FAMILIES:
        return _load_eomt(name, family, init_args, state, image_size)
    if family == "depth_estimation":
        return _load_depth(name, init_args, ckpt, state, image_size)
    if family == "object_detection":
        return _load_ltdetr(name, init_args, state, with_masks=False)
    if family == "instance_segmentation_ltdetr":
        return _load_ltdetr(name, init_args, state, with_masks=True)
    if family == "object_detection_picodet":
        return _load_picodet(name, init_args, state)
    raise CheckpointError(
        f"Zoo checkpoint '{name}' downloaded and verified, but its family "
        f"'{family}' has no registered loader."
    )


def _backbone_cfg_from_name(model_name: str):
    """'dinov3/vits16-eomt-coco' -> the registered dinov3 backbone name."""
    base = model_name.split("-")[0]  # dinov3/vits16
    return base


def _load_eomt(name, family, init_args, state, image_size):
    import jax

    from lightly_train_tpu.models.convert import (
        convert_torch_eomt_state_dict,
    )
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.model_io import (
        LoadedTaskModel,
        _build_train_model,
    )

    task = _EOMT_FAMILIES[family]
    backbone_name = _backbone_cfg_from_name(
        init_args.get("model_name", name)
    )
    classes = init_args.get("classes", {})
    task_args: Dict[str, Any] = {
        "num_classes": len(classes) if classes else 150,
        "num_queries": init_args.get("num_queries", 100),
        "num_joint_blocks": init_args.get("num_joint_blocks"),
    }
    if family == "instance_segmentation_eomt":
        task_args["num_queries"] = init_args.get("num_queries", 200)
    train_model = _build_train_model(task, "eomt", backbone_name, task_args)
    depth = train_model.cfg.depth
    params = convert_torch_eomt_state_dict(state, depth)
    variables = {"params": {"backbone": params}}
    # structural check against a fresh init tree
    import jax.numpy as jnp

    # EoMT init touches only batch["images"] (the trunk builds every param).
    sample = {
        "images": jnp.zeros((1, image_size, image_size, 3)),
        "masks": jnp.zeros((1, image_size, image_size), jnp.int32),
    }
    init_params, _ = train_model.init(jax.random.key(0), sample)
    got = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    want = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(
            init_params["backbone"]
        )[0]
    }
    if got != want:
        raise CheckpointError(
            f"Converted '{name}' does not match the task model's parameter "
            f"tree (missing: {sorted(want - got)[:4]}; "
            f"extra: {sorted(got - want)[:4]})."
        )
    return LoadedTaskModel(
        train_model=train_model, variables=variables, task=task,
        image_size=image_size,
    )


# ---------------------------------------------------------------------------
# LT-DETR zoo loading (detection + instance segmentation)
# ---------------------------------------------------------------------------

# Reference registry presets (``ltdetr_object_detection/config.py`` +
# ``ltdetr_instance_segmentation/config.py``). Keyed by the shape class;
# values are ObjectDetectionArgs overrides.
_VIT_TINY = dict(
    d_model=192, enc_dim_feedforward=512, expansion=0.34, csp_blocks=2,
    num_decoder_layers=4, dim_feedforward=512, num_points=(3, 6, 3),
)
_VIT_TINY_PLUS = dict(
    d_model=256, enc_dim_feedforward=512, expansion=0.67, csp_blocks=3,
    num_decoder_layers=4, dim_feedforward=512, num_points=(3, 6, 3),
)
_VIT_SMALL = dict(
    d_model=224, enc_dim_feedforward=896, expansion=1.0, csp_blocks=3,
    num_decoder_layers=4, dim_feedforward=1792, num_points=(3, 6, 3),
)
_CNN = dict(
    d_model=256, enc_d_model=384, enc_dim_feedforward=2048, expansion=1.0,
    csp_blocks=3, num_decoder_layers=6, dim_feedforward=1024,
    num_points=(4, 4, 4),
)

# repo backbone name -> (args preset, decoder kind)
_LTDETR_BACKBONE_PRESETS: Dict[str, Tuple[Dict[str, Any], str]] = {
    "ecvit/ecvitt": (_VIT_TINY, "dfine"),
    "ecvit/ecvittplus": (_VIT_TINY_PLUS, "dfine"),
    "ecvit/ecvits": (_VIT_TINY_PLUS, "dfine"),
    "ecvit/ecvitsplus": (_VIT_TINY_PLUS, "dfine"),
    "dinov3/vitt16": (_VIT_TINY, "rtdetrv2"),
    "dinov3/vitt16plus": (_VIT_TINY_PLUS, "rtdetrv2"),
    "dinov3/vits16": (_VIT_SMALL, "rtdetrv2"),
    "dinov3/convnext-tiny": (_CNN, "rtdetrv2"),
    "dinov3/convnext-small": (_CNN, "rtdetrv2"),
    "dinov3/convnext-base": (_CNN, "rtdetrv2"),
    "dinov3/convnext-large": (_CNN, "rtdetrv2"),
    # Legacy DINOv2 ViT-S/14 no-registers preset: stride-14 uniform taps,
    # no STA stem, upsample=False encoder (``config.py`` DINOv2ViTSmall
    # NoRegistersLegacy).
    "dinov2/vits14": (
        dict(_CNN, enc_d_model=384, use_sta=False, upsample=False,
             interaction_indexes=(5, 8, 11)),
        "rtdetrv2",
    ),
}


def _ltdetr_backbone_from_name(name: str, init_args: Dict[str, Any]) -> str:
    """Zoo/checkpoint model name -> repo backbone registry name."""
    base = str(init_args.get("model_name", name))
    # e.g. "edgecrafter/ecvitt-ltdetr[-coco]" / "dinov3/vits16-ltdetr-coco"
    base = base.split("-ltdetr")[0]
    aliases = {
        # ltdetrv2-{s,m,l,x} aliases resolve to EdgeCrafter backbones
        # (``config.py:1103-1210``).
        "ltdetrv2-s": "ecvit/ecvitt",
        "ltdetrv2-m": "ecvit/ecvittplus",
        "ltdetrv2-l": "ecvit/ecvits",
        "ltdetrv2-x": "ecvit/ecvitsplus",
        "ltdetrv2-seg-s": "ecvit/ecvitt",
        "ltdetrv2-seg-m": "ecvit/ecvittplus",
        "ltdetrv2-seg-l": "ecvit/ecvits",
        "ltdetrv2-seg-x": "ecvit/ecvitsplus",
    }
    for alias, backbone in aliases.items():
        if base.startswith(alias):
            return backbone
    base = base.replace("edgecrafter/", "ecvit/")
    if base.startswith("dinov2/vits14"):
        return "dinov2/vits14"
    return base


def _load_ltdetr(name: str, init_args: Dict[str, Any], state, with_masks: bool):
    import jax
    import jax.numpy as jnp

    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.models.vit import VisionTransformer
    from lightly_train_tpu.tasks.detection.convert import (
        convert_torch_convnext_ltdetr_state_dict,
        convert_torch_ecvit_ltdetr_state_dict,
        convert_torch_ecseg_mask_head_state_dict,
        convert_torch_ltdetr_state_dict,
    )
    from lightly_train_tpu.tasks.model_io import LoadedTaskModel

    backbone_name = _ltdetr_backbone_from_name(name, init_args)
    if backbone_name not in _LTDETR_BACKBONE_PRESETS:
        raise CheckpointError(
            f"Zoo checkpoint '{name}': no LT-DETR preset registered for "
            f"backbone '{backbone_name}'."
        )
    preset, decoder_kind = _LTDETR_BACKBONE_PRESETS[backbone_name]
    classes = init_args.get("classes", {})
    img = init_args.get("image_size", (640, 640))
    if isinstance(img, int):
        img = (img, img)
    image_size = int(img[0])

    wrapped = get_wrapped_model(backbone_name)
    task_args: Dict[str, Any] = dict(preset)
    task_args["num_classes"] = len(classes) if classes else 80
    task_args["decoder"] = decoder_kind
    # 300 is the reference preset; the fixture tests override it to the
    # anchor count so encoder top-k has no discrete tie boundary
    # (ltdetr_traj_harness.py uses the same device).
    task_args["num_queries"] = int(init_args.get("num_queries", 300))

    if with_masks:
        from lightly_train_tpu.tasks.detection.ltdetr_seg import (
            InstanceSegmentationLTDETRArgs,
            LTDETRInstanceSegmentationTrainModel,
        )

        args = InstanceSegmentationLTDETRArgs(
            mask_head_arch="edgecrafter", **task_args
        )
        train_model = LTDETRInstanceSegmentationTrainModel(wrapped, args)
        task = "instance_segmentation"
    else:
        from lightly_train_tpu.tasks.detection.ltdetr import (
            ObjectDetectionArgs,
            ObjectDetectionTrainModel,
        )

        args = ObjectDetectionArgs(**task_args)
        train_model = ObjectDetectionTrainModel(wrapped, args)
        task = "object_detection"

    csp = task_args["csp_blocks"]
    if backbone_name.startswith("ecvit/"):
        params, stats, mask_head = convert_torch_ecvit_ltdetr_state_dict(
            state, csp_blocks=csp, with_mask_head=with_masks
        )
    elif backbone_name.startswith("dinov3/convnext"):
        params, stats = convert_torch_convnext_ltdetr_state_dict(
            state, csp_blocks=csp
        )
        mask_head = None
    else:  # ViT + DINOSTAs path (dinov3 ViTs, legacy dinov2)
        params, stats = convert_torch_ltdetr_state_dict(
            state, csp_blocks=csp
        )
        mask_head = (
            convert_torch_ecseg_mask_head_state_dict(state)
            if with_masks
            else None
        )

    full_params: Dict[str, Any] = {"backbone": params}
    if with_masks:
        if mask_head is None:
            mask_head = convert_torch_ecseg_mask_head_state_dict(state)
        full_params["mask_head"] = mask_head
    variables: Dict[str, Any] = {"params": full_params}
    if stats:
        variables["batch_stats"] = stats

    # Structural check against a fresh init at a small (shape-independent)
    # resolution: every converted leaf must exist with the same path.
    probe = 128
    sample = {
        "images": jnp.zeros((1, probe, probe, 3), jnp.float32),
    }
    init_params, init_state = train_model.init(jax.random.key(0), sample)

    def _paths(tree):
        return {
            jax.tree_util.keystr(p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got_s = _paths(stats or {})
    want_s = _paths((init_state or {}).get("batch_stats", {}))
    if got_s != want_s:
        raise CheckpointError(
            f"Converted '{name}' batch_stats do not match the task model "
            f"(missing: {sorted(set(want_s) - set(got_s))[:4]}; "
            f"extra: {sorted(set(got_s) - set(want_s))[:4]})."
        )
    got, want = _paths(full_params), _paths(init_params)
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        shapes = [
            f"{k}: {got[k]} != {want[k]}"
            for k in set(got) & set(want)
            if got[k] != want[k]
        ]
        raise CheckpointError(
            f"Converted '{name}' does not match the task model's parameter "
            f"tree (missing: {missing[:4]}; extra: {extra[:4]}; "
            f"shape mismatches: {shapes[:4]})."
        )
    return LoadedTaskModel(
        train_model=train_model, variables=variables, task=task,
        image_size=image_size,
    )


def _load_picodet(name: str, init_args: Dict[str, Any], state):
    from lightly_train_tpu.tasks.detection.picodet import (
        load_torch_picodet_zoo,
    )

    return load_torch_picodet_zoo(name, init_args, state)


class DepthPredictor:
    """``load_model`` adapter for depth zoo checkpoints: ``predict(image)``
    -> {"depth": (H, W) float32} like the reference DAv3 TaskModel."""

    task = "depth_estimation"

    def __init__(self, model, params, image_size):
        self.model = model
        self.params = params
        self.image_size = image_size

    def predict(self, image, focal=None):
        import numpy as np
        from PIL import Image

        import jax.numpy as jnp

        from lightly_train_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD

        if not hasattr(image, "shape"):
            with Image.open(image) as im:
                image = np.asarray(im.convert("RGB"))
        orig_hw = image.shape[:2]
        size = self.model.config.get("image_size", self.image_size)
        im = Image.fromarray(image.astype(np.uint8)).resize(
            (size, size), Image.BILINEAR
        )
        arr = np.asarray(im, np.float32) / 255.0
        arr = (arr - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        depth = self.model.predict(
            self.params, jnp.asarray(arr[None], jnp.float32), focal=focal
        )[0]
        depth = np.asarray(
            Image.fromarray(depth).resize(
                (orig_hw[1], orig_hw[0]), Image.BILINEAR
            )
        )
        return {"depth": depth}


def _load_depth(name, init_args, ckpt, state, image_size):
    from lightly_train_tpu.tasks.depth_anything import (
        DepthAnythingModel,
        convert_depth_anything_state_dict,
    )

    model = DepthAnythingModel.build(name)
    sd = state if state else (ckpt.get("model") or ckpt)
    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()
    }
    params = convert_depth_anything_state_dict(sd, model)
    return DepthPredictor(model, params, image_size)
