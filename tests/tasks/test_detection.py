"""LT-DETR detection tests: box math, criterion, mAP, end-to-end train."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_train_tpu.tasks.detection.box_utils import (
    box_iou, cxcywh_to_xyxy, generalized_box_iou, xyxy_to_cxcywh,
)
from lightly_train_tpu.tasks.detection.metrics import compute_map


def test_box_conversions_roundtrip():
    boxes = jnp.asarray([[0.5, 0.5, 0.2, 0.4]])
    xyxy = cxcywh_to_xyxy(boxes)
    np.testing.assert_allclose(np.asarray(xyxy), [[0.4, 0.3, 0.6, 0.7]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(xyxy_to_cxcywh(xyxy)), np.asarray(boxes), atol=1e-6)


def test_iou_and_giou():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 3.0, 3.0]])
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou, [[1.0, 0.0]], atol=1e-6)
    giou = np.asarray(generalized_box_iou(a, b))
    assert giou[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert giou[0, 1] < 0  # disjoint boxes penalized


def test_compute_map_perfect_predictions():
    t = [{"boxes": np.array([[0., 0., 10., 10.]]), "labels": np.array([1])}]
    p = [{"boxes": np.array([[0., 0., 10., 10.]]), "scores": np.array([0.9]),
          "labels": np.array([1])}]
    out = compute_map(p, t)
    assert out["map"] > 0.9
    bad = [{"boxes": np.array([[50., 50., 60., 60.]]),
            "scores": np.array([0.9]), "labels": np.array([1])}]
    assert compute_map(bad, t)["map"] == 0.0


def test_detection_criterion_grads():
    from lightly_train_tpu.tasks.detection.criterion import detection_criterion

    B, Q, K, C = 2, 8, 4, 5
    key = jax.random.key(0)
    logits = jax.random.normal(key, (B, Q, C + 1))
    boxes = jax.nn.sigmoid(jax.random.normal(jax.random.key(1), (B, Q, 4)))
    tgt_labels = jnp.zeros((B, K), jnp.int32)
    tgt_boxes = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.2, 0.2]), (B, K, 4))
    tgt_valid = jnp.zeros((B, K), bool).at[:, 0].set(True)

    def lw(lb):
        l, b = lb
        loss, _ = detection_criterion([(l, b)], tgt_labels, tgt_boxes, tgt_valid)
        return loss

    loss, grads = jax.value_and_grad(lw)((logits, boxes))
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads[0]).max()) > 0
    assert float(jnp.abs(grads[1]).max()) > 0


@pytest.fixture
def yolo_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
            ).save(tmp_path / split / "images" / f"{i}.png")
            (tmp_path / split / "labels" / f"{i}.txt").write_text(
                "0 0.5 0.5 0.4 0.4\n1 0.25 0.25 0.2 0.2\n"
            )
    return tmp_path


def test_yolo_dataset_parsing(yolo_dataset):
    from lightly_train_tpu.tasks.detection.data import YOLOObjectDetectionDataset

    ds = YOLOObjectDetectionDataset(
        yolo_dataset / "train" / "images", yolo_dataset / "train" / "labels",
        image_hw=(32, 32), max_boxes=10,
    )
    item = ds[0]
    assert item["images"].shape == (32, 32, 3)
    assert item["box_valid"].sum() == 2
    np.testing.assert_allclose(item["boxes"][0], [0.5, 0.5, 0.4, 0.4])


def test_detection_end_to_end_training(tmp_path, yolo_dataset):
    import lightly_train_tpu as lt

    state, val = lt.train_object_detection(
        out=str(tmp_path / "out"),
        data={
            "format": "yolo",
            "train": {"images": str(yolo_dataset / "train" / "images"),
                      "labels": str(yolo_dataset / "train" / "labels")},
            "val": {"images": str(yolo_dataset / "val" / "images"),
                    "labels": str(yolo_dataset / "val" / "labels")},
            "num_classes": 2,
        },
        model="dinov3/vittest16",
        task_args={"num_queries": 16, "num_decoder_layers": 1,
                   "d_model": 32, "num_heads": 2, "dim_feedforward": 64,
                   "max_detections": 16},
        steps=2, batch_size=8, image_size=32, precision="fp32",
        num_workers=2, log_every=1, val_every=2,
    )
    assert int(state.step) == 2
    assert "val_map" in val and 0.0 <= val["val_map"] <= 1.0
    assert state.ema_params is not None  # detection uses EMA


def test_picodet_end_to_end(tmp_path, yolo_dataset):
    import lightly_train_tpu as lt

    state, val = lt.train_object_detection(
        out=str(tmp_path / "out_pico"),
        data={
            "format": "yolo",
            "train": {"images": str(yolo_dataset / "train" / "images"),
                      "labels": str(yolo_dataset / "train" / "labels")},
            "val": {"images": str(yolo_dataset / "val" / "images"),
                    "labels": str(yolo_dataset / "val" / "labels")},
            "num_classes": 2,
        },
        model="picodet-s",
        task_args={"model_size": "test", "max_detections": 8},
        steps=2, batch_size=8, image_size=64, precision="fp32",
        num_workers=2, log_every=1, val_every=2,
    )
    assert int(state.step) == 2
    assert "val_map" in val
    assert state.ema_params is not None


def test_denoising_queries_training(tmp_path, yolo_dataset):
    import lightly_train_tpu as lt

    state, val = lt.train_object_detection(
        out=str(tmp_path / "out_dn"),
        data={
            "format": "yolo",
            "train": {"images": str(yolo_dataset / "train" / "images"),
                      "labels": str(yolo_dataset / "train" / "labels")},
            "val": {"images": str(yolo_dataset / "val" / "images"),
                    "labels": str(yolo_dataset / "val" / "labels")},
            "num_classes": 2,
        },
        model="dinov3/vittest16",
        task_args={"num_queries": 16, "num_decoder_layers": 1,
                   "d_model": 32, "num_heads": 2, "dim_feedforward": 64,
                   "max_detections": 16, "dn_groups": 2},
        steps=2, batch_size=8, image_size=32, precision="fp32",
        num_workers=2, log_every=1, val_every=2,
    )
    assert int(state.step) == 2
    assert "val_map" in val


def test_dn_mask_isolates_groups():
    """Denoising self-attn mask: matching sees no dn, dn groups isolated."""
    import jax
    import jax.numpy as jnp
    from lightly_train_tpu.tasks.detection.components import (
        DETRDecoder, DetrConfig,
    )

    cfg = DetrConfig(d_model=32, num_heads=2, num_queries=4,
                     num_decoder_layers=1, dim_feedforward=32, num_classes=3)
    dec = DETRDecoder(cfg)
    levels = [jnp.zeros((1, s, s, 32)) for s in (8, 4, 2)]
    dn_labels = jnp.zeros((1, 4), jnp.int32)  # 2 groups x group_size 2
    dn_boxes = jnp.full((1, 4, 4), 0.5)
    variables = dec.init(
        {"params": jax.random.key(0)}, levels, False,
        dn_labels=dn_labels, dn_boxes=dn_boxes, dn_group_size=2,
    )
    outputs = dec.apply(
        variables, levels, False, dn_labels=dn_labels, dn_boxes=dn_boxes,
        dn_group_size=2,
    )
    # Decoder levels carry dn + matching slots; encoder level only matching.
    assert outputs[0][0].shape[1] == 4
    assert outputs[1][0].shape[1] == 8


def test_dfine_and_rtdetrv2_decoders(tmp_path, yolo_dataset):
    import lightly_train_tpu as lt

    for decoder in ("dfine", "rtdetrv2"):
        state, _ = lt.train_object_detection(
            out=str(tmp_path / f"out_{decoder}"),
            data={"format": "yolo",
                  "train": {"images": str(yolo_dataset / "train" / "images"),
                            "labels": str(yolo_dataset / "train" / "labels")},
                  "num_classes": 2},
            model="dinov3/vittest16",
            task_args={"num_queries": 8, "num_decoder_layers": 1,
                       "d_model": 32, "num_heads": 2, "dim_feedforward": 64,
                       "max_detections": 8, "dn_groups": 0,
                       "decoder": decoder},
            steps=1, batch_size=8, image_size=32, precision="fp32",
            num_workers=2,
        )
        assert int(state.step) == 1


def test_simota_assignment_matches_reference_semantics():
    """simota_assign == a direct numpy port of the reference's per-gt
    dynamic-k matching (``sim_ota_assigner.py:136-420``), up to cost ties."""
    import numpy as np
    from lightly_train_tpu.tasks.detection.picodet import (
        _iou_xyxy, simota_assign,
    )

    rng = np.random.default_rng(0)
    N, K, C = 60, 5, 7
    pts = rng.uniform(4, 60, (N, 2)).astype(np.float32)
    strides = np.full((N,), 8.0, np.float32)
    scores = rng.uniform(0.01, 0.99, (N, C)).astype(np.float32)
    cxy = rng.uniform(10, 54, (K, 2))
    wh = rng.uniform(12, 40, (K, 2))
    gt = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
    gt_labels = rng.integers(0, C, (K,))
    gt_valid = np.array([True, True, True, True, False])
    # Predicted boxes: jittered copies of gts assigned round-robin.
    dec = gt[np.arange(N) % K] + rng.normal(0, 3, (N, 4)).astype(np.float32)
    dec = np.stack([
        np.minimum(dec[:, 0], dec[:, 2] - 1), np.minimum(dec[:, 1], dec[:, 3] - 1),
        np.maximum(dec[:, 2], dec[:, 0] + 1), np.maximum(dec[:, 3], dec[:, 1] + 1),
    ], 1)

    is_pos, assigned, pair_iou = jax.tree.map(
        np.asarray,
        simota_assign(
            jnp.asarray(scores), jnp.asarray(pts), jnp.asarray(strides),
            jnp.asarray(dec), jnp.asarray(gt), jnp.asarray(gt_labels),
            jnp.asarray(gt_valid), 2.5, 10, 6.0, 1.0,
        ),
    )

    # --- numpy reference port (loops, dynamic shapes) ---
    INF = 1e8
    px, py = pts[:, 0], pts[:, 1]
    in_gt = ((px[:, None] > gt[None, :, 0]) & (px[:, None] < gt[None, :, 2])
             & (py[:, None] > gt[None, :, 1]) & (py[:, None] < gt[None, :, 3]))
    cxg, cyg = (gt[:, 0] + gt[:, 2]) / 2, (gt[:, 1] + gt[:, 3]) / 2
    r = 2.5 * strides[:, None]
    in_c = ((px[:, None] > cxg[None] - r) & (px[:, None] < cxg[None] + r)
            & (py[:, None] > cyg[None] - r) & (py[:, None] < cyg[None] + r))
    gv = gt_valid[None, :]
    cand = (in_gt | in_c) & gv
    strong = in_gt & in_c & gv
    valid = cand.any(1)
    iou = np.asarray(_iou_xyxy(jnp.asarray(dec), jnp.asarray(gt)))

    def giou_cost(d, g):
        ap = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
        ag = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
        lt = np.maximum(d[:, None, :2], g[None, :, :2])
        rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
        whp = np.clip(rb - lt, 0, None)
        inter = whp[..., 0] * whp[..., 1]
        union = ap[:, None] + ag[None] - inter
        elt = np.minimum(d[:, None, :2], g[None, :, :2])
        erb = np.maximum(d[:, None, 2:], g[None, :, 2:])
        ew = np.clip(erb - elt, 0, None)
        enc = ew[..., 0] * ew[..., 1]
        return 1 - (inter / union - (enc - union) / enc)

    # VFL cost: full (N, K, C) materialization, reference formula.
    alpha, gamma = 0.75, 2.0
    p = np.clip(scores, 1e-7, 1 - 1e-7)
    vflc = np.zeros((N, K))
    for k in range(K):
        tgt = np.zeros((N, C))
        tgt[:, gt_labels[k]] = iou[:, k]
        fw = tgt * (tgt > 0) + alpha * np.abs(p - tgt) ** gamma * (tgt <= 0)
        bce = -(tgt * np.log(p) + (1 - tgt) * np.log(1 - p))
        vflc[:, k] = (bce * fw).sum(1)
    cost = vflc + 6.0 * giou_cost(dec, gt) + (~strong) * INF + (~valid)[:, None] * INF

    iou_v = np.where(valid[:, None] & gv, iou, 0.0)
    dyn = np.clip(np.floor(np.sort(iou_v, 0)[::-1][:10].sum(0)).astype(int), 1, 10)
    M = np.zeros((N, K), bool)
    for k in range(K):
        order = np.argsort(cost[:, k])[: dyn[k]]
        ok = cost[order, k] < INF / 2
        M[order[ok], k] = True
    # conflicts -> cheapest gt
    for n in np.where(M.sum(1) > 1)[0]:
        best = np.argmin(np.where(M[n], cost[n], np.inf))
        M[n] = False
        M[n, best] = True
    ref_pos = M.any(1)
    ref_assigned = np.where(ref_pos, M.argmax(1), 0)

    assert (is_pos == ref_pos).all()
    assert (assigned[is_pos] == ref_assigned[ref_pos]).all()
    # no positives on the invalid gt slot
    assert not np.any(assigned[is_pos] == 4)
    np.testing.assert_allclose(
        pair_iou[is_pos], iou[np.where(is_pos)[0], assigned[is_pos]], rtol=1e-5
    )


def test_integral_decode_expectation():
    from lightly_train_tpu.tasks.detection.picodet import integral_decode

    # A peaked one-hot distribution decodes to its bin index.
    reg_max = 7
    logits = jnp.full((3, 4 * (reg_max + 1)), -20.0)
    logits = logits.at[:, 2].set(20.0)        # side 0 -> bin 2
    logits = logits.at[:, (reg_max + 1) + 5].set(20.0)   # side 1 -> bin 5
    logits = logits.at[:, 2 * (reg_max + 1) + 0].set(20.0)
    logits = logits.at[:, 3 * (reg_max + 1) + 7].set(20.0)
    out = integral_decode(logits, reg_max)
    np.testing.assert_allclose(out, np.tile([2, 5, 0, 7], (3, 1)), atol=1e-4)


def test_repvgg_deploy_fusion_parity():
    """fuse_repvgg deploy params reproduce the two-branch eval forward
    exactly (``hybrid_encoder.py:76-108`` convert_to_deploy)."""
    from lightly_train_tpu.models.package_registry import get_wrapped_model
    from lightly_train_tpu.tasks.detection.ltdetr import (
        ObjectDetectionArgs, ObjectDetectionTrainModel,
    )

    wrapped = get_wrapped_model("torchvision/resnettest")
    args = ObjectDetectionArgs(
        num_classes=3, num_queries=8, num_decoder_layers=1, d_model=32,
        num_heads=2, dim_feedforward=64, max_detections=8,
    )
    model = ObjectDetectionTrainModel(wrapped, args)
    rng = jax.random.key(0)
    images = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    params, model_state = model.init(rng, {"images": images})
    variables = {"params": params, **model_state}

    # Perturb BN running stats so the fold is non-trivial.
    import jax.numpy as _jnp
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree.map(
            lambda x: x + 0.05, variables["batch_stats"]
        )

    boxes, scores, labels = model.predict(variables, images)
    deploy_model, deploy_vars = model.convert_to_deploy(variables)
    dboxes, dscores, dlabels = deploy_model.predict(deploy_vars, images)

    np.testing.assert_allclose(np.asarray(scores), np.asarray(dscores),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(dboxes),
                               atol=1e-5, rtol=1e-4)
    assert (np.asarray(labels) == np.asarray(dlabels)).all()

    # The deploy tree really is fused: RepVgg bottleneck entries hold a
    # single biased conv (no conv1/conv2 two-branch leaves remain).
    flat = jax.tree_util.tree_leaves_with_path(deploy_vars["params"])
    paths = ["/".join(str(k) for k in p) for p, _ in flat]
    assert not any("bottlenecks" in p and "conv1" in p for p in paths)
    assert any("bottlenecks" in p and "bias" in p for p in paths)


def test_ltdetrv2_zoo_name_resolves(tmp_path, yolo_dataset):
    """ltdetrv2-* zoo names train with their EdgeCrafter ECViT backbone
    (reference config.py:1111-1207); _ltdetrv2-test uses the tiny size."""
    import lightly_train_tpu as lt

    state, val = lt.train_object_detection(
        out=str(tmp_path / "out_zoo"),
        data={
            "format": "yolo",
            "train": {"images": str(yolo_dataset / "train" / "images"),
                      "labels": str(yolo_dataset / "train" / "labels")},
            "val": {"images": str(yolo_dataset / "val" / "images"),
                    "labels": str(yolo_dataset / "val" / "labels")},
            "num_classes": 2,
        },
        model="_ltdetrv2-test",
        task_args={"num_queries": 16, "num_decoder_layers": 1,
                   "d_model": 32, "num_heads": 2, "dim_feedforward": 64,
                   "max_detections": 16},
        steps=1, batch_size=8, image_size=32, precision="fp32",
        num_workers=0, log_every=1, val_every=1,
    )
    assert int(state.step) == 1
    assert "val_map" in val


def test_coco_skip_if_annotations_missing(tmp_path):
    """Reference data knob: missing image files are skipped by default and
    raise when skip_if_annotations_missing=False."""
    import json

    import numpy as np
    from PIL import Image

    from lightly_train_tpu.errors import DatasetError
    from lightly_train_tpu.tasks.detection.data import (
        COCOObjectDetectionDataset,
    )

    (tmp_path / "img").mkdir()
    Image.fromarray(
        np.zeros((32, 32, 3), np.uint8)
    ).save(tmp_path / "img" / "a.jpg")
    ann = {
        "categories": [{"id": 1, "name": "thing"}],
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 32, "height": 32},
            {"id": 2, "file_name": "missing.jpg", "width": 32, "height": 32},
        ],
        "annotations": [
            {"image_id": 1, "bbox": [1, 1, 10, 10], "category_id": 1},
        ],
    }
    (tmp_path / "ann.json").write_text(json.dumps(ann))

    ds = COCOObjectDetectionDataset(
        tmp_path / "img", tmp_path / "ann.json", (32, 32)
    )
    assert len(ds) == 1  # default: skip the missing file

    import pytest

    with pytest.raises(DatasetError, match="missing"):
        COCOObjectDetectionDataset(
            tmp_path / "img", tmp_path / "ann.json", (32, 32),
            skip_if_annotations_missing=False,
        )


def test_yolo_nested_labels_layout(tmp_path):
    """Standard nested YOLO layout (images/train/a.jpg ->
    labels/train/a.txt) must find its labels; a labels dir matching no
    image must raise instead of silently training on background."""
    from PIL import Image

    from lightly_train_tpu.errors import DatasetError
    from lightly_train_tpu.tasks.detection.data import (
        YOLOObjectDetectionDataset,
    )

    rng = np.random.default_rng(0)
    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    Image.fromarray(
        rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    ).save(tmp_path / "images" / "train" / "a.png")
    (tmp_path / "labels" / "train" / "a.txt").write_text(
        "1 0.5 0.5 0.4 0.4\n"
    )
    ds = YOLOObjectDetectionDataset(
        tmp_path / "images", tmp_path / "labels", (32, 32)
    )
    item = ds[0]
    assert item["box_valid"].sum() == 1 and item["labels"][0] == 1

    (tmp_path / "empty_labels").mkdir()
    with pytest.raises(DatasetError, match="background"):
        YOLOObjectDetectionDataset(
            tmp_path / "images", tmp_path / "empty_labels", (32, 32)
        )


def test_yolo_out_of_range_class_raises(tmp_path):
    from PIL import Image

    from lightly_train_tpu.errors import DatasetError
    from lightly_train_tpu.tasks.detection.data import (
        YOLOObjectDetectionDataset,
    )

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        tmp_path / "images" / "a.png"
    )
    (tmp_path / "labels" / "a.txt").write_text("7 0.5 0.5 0.2 0.2\n")
    ds = YOLOObjectDetectionDataset(
        tmp_path / "images", tmp_path / "labels", (16, 16),
        class_names=["x", "y"],
    )
    with pytest.raises(DatasetError, match="class id 7"):
        ds[0]


def test_coco_ignores_iscrowd_and_rejects_unknown_category(tmp_path):
    import json as _json

    from PIL import Image

    from lightly_train_tpu.errors import DatasetError
    from lightly_train_tpu.tasks.detection.data import (
        COCOObjectDetectionDataset,
    )

    (tmp_path / "imgs").mkdir()
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(
        tmp_path / "imgs" / "a.png"
    )
    base = {
        "images": [{"id": 1, "file_name": "a.png", "width": 20, "height": 20}],
        "categories": [{"id": 5, "name": "thing"}],
    }
    ann = dict(base, annotations=[
        {"id": 1, "image_id": 1, "category_id": 5,
         "bbox": [2, 2, 6, 6], "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 5,
         "bbox": [0, 0, 20, 20], "iscrowd": 1},
    ])
    (tmp_path / "ann.json").write_text(_json.dumps(ann))
    ds = COCOObjectDetectionDataset(
        tmp_path / "imgs", tmp_path / "ann.json", (20, 20)
    )
    assert ds[0]["box_valid"].sum() == 1  # crowd region ignored

    bad = dict(base, annotations=[
        {"id": 3, "image_id": 1, "category_id": 99, "bbox": [1, 1, 2, 2]},
    ])
    (tmp_path / "bad.json").write_text(_json.dumps(bad))
    with pytest.raises(DatasetError, match="category_id 99"):
        COCOObjectDetectionDataset(
            tmp_path / "imgs", tmp_path / "bad.json", (20, 20)
        )


def test_map_matches_best_unmatched_gt():
    """COCO protocol: a detection whose argmax GT is taken must match the
    best remaining GT above threshold, not count as FP."""
    from lightly_train_tpu.tasks.detection.metrics import compute_map

    # Two overlapping GTs; det1 takes GT0; det2 overlaps GT0 more but must
    # fall through to GT1 (IoU ~0.6 >= 0.5).
    targets = [{
        "boxes": np.asarray([[0, 0, 10, 10], [0, 0, 8, 10]], np.float32),
        "labels": np.asarray([0, 0], np.int32),
    }]
    predictions = [{
        "boxes": np.asarray([[0, 0, 10, 10], [0, 0, 9, 10]], np.float32),
        "scores": np.asarray([0.9, 0.8], np.float32),
        "labels": np.asarray([0, 0], np.int32),
    }]
    out = compute_map(
        predictions, targets, iou_thresholds=np.asarray([0.5])
    )
    assert out["map50"] == pytest.approx(1.0)  # both GTs recalled


def test_shared_transform_flips_boxes_with_images():
    """Regression: the shared hflip mirrored detection images but left the
    cxcywh boxes (and seg_map) untouched — half the batches trained on
    mirrored supervision."""
    import jax

    from lightly_train_tpu._commands.train_task import _device_train_transform

    B, H = 4, 16
    images = np.zeros((B, H, H, 3), np.uint8)
    images[:, :, : H // 2] = 255  # left half bright
    boxes = np.tile(np.asarray([[0.2, 0.5, 0.1, 0.2]], np.float32), (B, 1))
    seg_map = np.zeros((B, H, H), np.int32)
    seg_map[:, :, : H // 2] = 1
    batch = {
        "images": jnp.asarray(images),
        "boxes": jnp.asarray(boxes)[:, None, :].repeat(2, 1),
        "seg_map": jnp.asarray(seg_map),
    }
    out = _device_train_transform(
        batch, jax.random.key(0), hflip_prob=1.0, dtype=jnp.float32
    )
    # Image mirrored: bright half moved right; box cx mirrored with it.
    img = np.asarray(out["images"])
    assert img[0, 0, 0].mean() < img[0, 0, -1].mean()
    got = np.asarray(out["boxes"])
    np.testing.assert_allclose(got[..., 0], 0.8)
    np.testing.assert_allclose(
        got[..., 1:], np.broadcast_to(boxes[0, 1:], got[..., 1:].shape)
    )
    assert (np.asarray(out["seg_map"])[0, :, -1] == 1).all()


def test_task_loader_resume_continues_stream():
    from lightly_train_tpu._data.task_loader import TaskTrainLoader
    from lightly_train_tpu.parallel.mesh import MeshConfig

    class _DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"images": np.full((2, 2, 3), i, np.uint8)}

    mesh = MeshConfig().build()
    full = TaskTrainLoader(_DS(), 4, mesh, seed=3)
    resumed = TaskTrainLoader(_DS(), 4, mesh, seed=3, start_step=3)
    want = [next(s) for s in [full._indices()] * 6][3:]
    got_stream = resumed._indices()
    got = [next(got_stream) for _ in range(3)]
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
