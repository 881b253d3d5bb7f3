"""EoMT instance + panoptic segmentation tests."""

import json

import numpy as np
import pytest

import lightly_train_tpu as lt

TASK_ARGS = {"num_queries": 8, "num_joint_blocks": 1, "max_instances": 8}
RUN_KW = dict(steps=2, batch_size=8, image_size=32, precision="fp32",
              num_workers=2, log_every=1, val_every=2)


@pytest.fixture
def coco_instance(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / split
        d.mkdir()
        images, annotations = [], []
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
            images.append({"id": i, "file_name": f"{i}.png",
                           "width": 40, "height": 40})
            annotations.append({
                "id": i * 2, "image_id": i, "category_id": 1,
                "segmentation": [[5, 5, 20, 5, 20, 20, 5, 20]],
                "bbox": [5, 5, 15, 15], "area": 225,
            })
            annotations.append({
                "id": i * 2 + 1, "image_id": i, "category_id": 2,
                "segmentation": [[25, 25, 38, 25, 38, 38, 25, 38]],
                "bbox": [25, 25, 13, 13], "area": 169,
            })
        (d / "ann.json").write_text(json.dumps({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        }))
    return tmp_path


def test_coco_instance_dataset(coco_instance):
    from lightly_train_tpu.tasks.eomt_instance_panoptic import (
        COCOInstanceSegmentationDataset,
    )

    ds = COCOInstanceSegmentationDataset(
        coco_instance / "train", coco_instance / "train" / "ann.json",
        image_hw=(32, 32), max_instances=8,
    )
    item = ds[0]
    assert item["seg_valid"].sum() == 2
    assert set(np.unique(item["seg_map"])) <= {0, 1, 255}
    assert (item["seg_map"] == 0).sum() > 0  # first polygon rasterized


def test_instance_segmentation_end_to_end(tmp_path, coco_instance):
    state, val = lt.train_instance_segmentation(
        out=str(tmp_path / "out"),
        data={
            "train": {"images": str(coco_instance / "train"),
                      "annotations": str(coco_instance / "train" / "ann.json")},
            "val": {"images": str(coco_instance / "val"),
                    "annotations": str(coco_instance / "val" / "ann.json")},
        },
        model="dinov3/vittest16",
        task_args=TASK_ARGS,
        **RUN_KW,
    )
    assert int(state.step) == 2
    assert "val_mask_map" in val
    # load_model round-trip (instance artifacts previously raised
    # UnknownTaskError) + predict postprocess at original resolution.
    model = lt.load_model(
        str(tmp_path / "out" / "exported_models" / "exported_last"),
        image_size=32,
    )
    out = model.predict(
        np.zeros((40, 40, 3), np.uint8)
    )
    assert out["masks"].shape[1:] == (40, 40)
    assert "scores" in out and "labels" in out


@pytest.fixture
def coco_panoptic(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / split
        (d / "images").mkdir(parents=True)
        (d / "panoptic").mkdir()
        images, annotations = [], []
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(d / "images" / f"{i}.png")
            pan = np.zeros((40, 40, 3), np.uint8)
            pan[:20, :, 0] = 1  # segment id 1
            pan[20:, :, 0] = 2  # segment id 2
            Image.fromarray(pan).save(d / "panoptic" / f"{i}.png")
            images.append({"id": i, "file_name": f"{i}.png",
                           "width": 40, "height": 40})
            annotations.append({
                "image_id": i, "file_name": f"{i}.png",
                "segments_info": [
                    {"id": 1, "category_id": 1},
                    {"id": 2, "category_id": 2},
                ],
            })
        (d / "ann.json").write_text(json.dumps({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "sky"}, {"id": 2, "name": "road"}],
        }))
    return tmp_path


def test_panoptic_end_to_end(tmp_path, coco_panoptic):
    state, val = lt.train_panoptic_segmentation(
        out=str(tmp_path / "out"),
        data={
            "train": {"images": str(coco_panoptic / "train" / "images"),
                      "panoptic": str(coco_panoptic / "train" / "panoptic"),
                      "annotations": str(coco_panoptic / "train" / "ann.json")},
            "val": {"images": str(coco_panoptic / "val" / "images"),
                    "panoptic": str(coco_panoptic / "val" / "panoptic"),
                    "annotations": str(coco_panoptic / "val" / "ann.json")},
        },
        model="dinov3/vittest16",
        task_args=TASK_ARGS,
        **RUN_KW,
    )
    assert int(state.step) == 2
    assert "val_pq" in val and 0.0 <= val["val_pq"] <= 1.0
    model = lt.load_model(
        str(tmp_path / "out" / "exported_models" / "exported_last"),
        image_size=32,
    )
    out = model.predict(np.zeros((40, 40, 3), np.uint8))
    assert out["segment_map"].shape == (40, 40)


def test_ltdetr_instance_segmentation_end_to_end(tmp_path, coco_instance):
    state, val = lt.train_instance_segmentation(
        out=str(tmp_path / "out_ltdetr"),
        data={
            "train": {"images": str(coco_instance / "train"),
                      "annotations": str(coco_instance / "train" / "ann.json")},
            "val": {"images": str(coco_instance / "val"),
                    "annotations": str(coco_instance / "val" / "ann.json")},
        },
        model="dinov3/vittest16-ltdetr",
        task_args={"num_queries": 8, "num_decoder_layers": 1, "d_model": 32,
                   "num_heads": 2, "dim_feedforward": 64, "max_instances": 8,
                   "mask_dim": 16, "max_detections": 8},
        **RUN_KW,
    )
    assert int(state.step) == 2
    assert "val_mask_map" in val
    model = lt.load_model(
        str(tmp_path / "out_ltdetr" / "exported_models" / "exported_last"),
        image_size=32,
    )
    out = model.predict(np.zeros((40, 40, 3), np.uint8))
    assert out["masks"].shape[1:] == (40, 40)
    assert out["boxes"].shape[-1] == 4  # detection head included


def test_ltdetr_seg_bn_backbone_mask_head():
    """Regression: the mask head once re-ran the trunk with params-only
    variables — an ECViT (BatchNorm) backbone crashed with
    ScopeCollectionNotFound (ViT backbones masked the bug). The mask head
    now reuses the sown trunk features; this drives the BN config through
    eval predict and deploy-fused predict and checks they agree."""
    import jax
    import jax.numpy as jnp

    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.detection.ltdetr_seg import (
        InstanceSegmentationLTDETRArgs,
        LTDETRInstanceSegmentationTrainModel,
    )

    model = LTDETRInstanceSegmentationTrainModel(
        get_wrapped_model("ecvit/ecvittest", dtype=jnp.float32),
        InstanceSegmentationLTDETRArgs(
            num_queries=8, num_decoder_layers=1, d_model=32, num_heads=2,
            dim_feedforward=64, max_detections=4, mask_dim=16,
        ),
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32
    )
    params, state = model.init(jax.random.key(0), {"images": x})
    assert "batch_stats" in state  # the regression needs a BN backbone
    variables = {"params": params, **state}
    eval_out = jax.tree_util.tree_leaves(model.predict(variables, x))
    deploy, deploy_vars = model.convert_to_deploy(variables)
    deploy_out = jax.tree_util.tree_leaves(deploy.predict(deploy_vars, x))
    for a, b in zip(eval_out, deploy_out):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-5, rtol=1e-4,
        )


def test_decode_rle_uncompressed():
    from lightly_train_tpu.tasks.eomt_instance_panoptic import decode_rle

    # 3x3 mask, column-major runs: 2 zeros, 4 ones, 3 zeros.
    m = decode_rle({"size": [3, 3], "counts": [2, 4, 3]})
    assert m.shape == (3, 3)
    assert m.sum() == 4
    # Column-major: positions 2,3,4,5 in F-order.
    flat = m.T.reshape(-1)
    np.testing.assert_array_equal(
        flat, [0, 0, 1, 1, 1, 1, 0, 0, 0]
    )


def test_decode_rle_compressed_roundtrip():
    from lightly_train_tpu.tasks.eomt_instance_panoptic import (
        _decode_rle_counts, decode_rle,
    )

    # Encode [2, 4, 3] with the pycocotools scheme (values then deltas).
    def encode(counts):
        out = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (
                    (x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10))
                )
                if more:
                    c |= 0x20
                out.append(chr(c + 48))
        return "".join(out)

    counts = [2, 4, 3, 5, 1, 12]
    assert _decode_rle_counts(encode(counts)) == counts
    m = decode_rle({"size": [9, 3], "counts": encode(counts)})
    assert m.sum() == 4 + 5 + 12  # odd-index runs are foreground


@pytest.fixture
def yolo_instance(tmp_path):
    """YOLO-seg layout: images/ + labels/*.txt with normalized polygons."""
    import numpy as np
    from PIL import Image

    root = tmp_path / "yolo"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 256, size=(60, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "images" / f"im_{i}.png")
        # Two instances: a triangle (class 0) and a square (class 1).
        lines = [
            "0 0.1 0.1 0.5 0.1 0.3 0.5",
            "1 0.6 0.6 0.9 0.6 0.9 0.9 0.6 0.9",
        ]
        if i == 3:  # degenerate polygon (< 3 points) must be skipped
            lines.append("0 0.2 0.2 0.3 0.3")
        (root / "labels" / f"im_{i}.txt").write_text("\n".join(lines))
    return root


def test_yolo_instance_dataset(yolo_instance):
    from lightly_train_tpu.tasks.eomt_instance_panoptic import (
        NO_SEGMENT,
        YOLOInstanceSegmentationDataset,
    )

    ds = YOLOInstanceSegmentationDataset(
        yolo_instance / "images", yolo_instance / "labels",
        num_classes=2, image_hw=(64, 64), max_instances=8,
    )
    assert len(ds) == 6
    item = ds[0]
    assert item["images"].shape == (64, 64, 3)
    assert item["seg_valid"][:2].all() and not item["seg_valid"][2:].any()
    assert set(np.unique(item["seg_map"])) <= {0, 1, NO_SEGMENT}
    assert item["seg_labels"][0] == 0 and item["seg_labels"][1] == 1
    # Slot 1 (the square) covers roughly (0.3*0.3) of the image.
    frac = (item["seg_map"] == 1).mean()
    assert 0.05 < frac < 0.15
    # Degenerate polygon skipped: image 3 still has exactly 2 valid slots.
    assert ds[3]["seg_valid"].sum() == 2


def test_yolo_instance_end_to_end(tmp_path, yolo_instance):
    import lightly_train_tpu as lt

    state, metrics = lt.train_instance_segmentation(
        out=str(tmp_path / "out"),
        data={
            "format": "yolo",
            "num_classes": 2,
            "train": {"images": str(yolo_instance / "images"),
                      "labels": str(yolo_instance / "labels")},
        },
        model="dinov3/vittest16-eomt",
        steps=2,
        batch_size=2,
        image_size=32,
        task_args={"num_queries": 8, "max_instances": 8, "num_points": 256},
        precision="fp32",
        log_every=1,
    )
    assert int(state.step) == 2


def test_coco_instance_iscrowd_excluded(tmp_path, coco_instance):
    import json as _json
    from pathlib import Path

    from lightly_train_tpu.tasks.eomt_instance_panoptic import (
        COCOInstanceSegmentationDataset,
    )

    images_dir = coco_instance / "train"
    ann_path = images_dir / "ann.json"
    ann = _json.loads(Path(ann_path).read_text())
    n_before = len(ann["annotations"])
    ann["annotations"][0]["iscrowd"] = 1
    crowd_path = tmp_path / "crowd.json"
    crowd_path.write_text(_json.dumps(ann))
    ds = COCOInstanceSegmentationDataset(
        images_dir, crowd_path, image_hw=(32, 32), max_instances=8
    )
    total_valid = sum(int(ds[i]["seg_valid"].sum()) for i in range(len(ds)))
    ds_all = COCOInstanceSegmentationDataset(
        images_dir, ann_path, image_hw=(32, 32), max_instances=8
    )
    total_all = sum(
        int(ds_all[i]["seg_valid"].sum()) for i in range(len(ds_all))
    )
    assert total_valid == total_all - 1
