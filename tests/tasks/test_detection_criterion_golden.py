"""Detection criterion golden parity vs the actual reference DFINECriterion.

Identical synthetic multi-level predictions (final + aux decoder layers with
D-FINE corner distributions, pre level, encoder level) and targets are fed
to BOTH the reference criterion (``object_detection_components/
dfine_criterion.py`` + ``matcher.py``, imported as the oracle) and the
rebuild's ``detection_criterion``; the total losses must agree to fp32
precision. This pins the entire loss surface: focal matching costs, VFL
normalization, GO-union indices across levels, the exact W(n)-bin FGL
targets (``bbox2distance``/``translate_gt``), and the DDF distillation
weighting.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

B, Q, C, L_DEC = 2, 12, 5, 3
REG_MAX = 32
K = 4  # padded target slots (images have 4 and 2 real targets)


def _synthetic(seed=0):
    rng = np.random.default_rng(seed)
    anchors = np.concatenate([
        rng.random((B, Q, 2), dtype=np.float32) * 0.6 + 0.2,
        rng.random((B, Q, 2), dtype=np.float32) * 0.2 + 0.08,
    ], -1)
    levels = []
    corners = []
    from lightly_train_tpu.tasks.detection.dfine_utils import (
        distance2bbox,
        integral,
        weighting_function,
    )

    import jax.numpy as jnp

    project = weighting_function(REG_MAX)
    for _ in range(L_DEC):
        c = (rng.standard_normal((B, Q, 4, REG_MAX + 1)) * 0.5).astype(
            np.float32
        )
        boxes = np.asarray(
            distance2bbox(jnp.asarray(anchors), integral(jnp.asarray(c),
                          project))
        )
        boxes = np.clip(boxes, 0.01, 1.0).astype(np.float32)
        logits = rng.standard_normal((B, Q, C)).astype(np.float32)
        corners.append(c)
        levels.append((logits, boxes))
    enc = (
        rng.standard_normal((B, Q, C)).astype(np.float32),
        np.concatenate([
            rng.random((B, Q, 2), dtype=np.float32) * 0.6 + 0.2,
            rng.random((B, Q, 2), dtype=np.float32) * 0.2 + 0.05,
        ], -1),
    )
    pre = (
        rng.standard_normal((B, Q, C)).astype(np.float32),
        np.clip(anchors + rng.standard_normal(anchors.shape).astype(
            np.float32
        ) * 0.01, 0.01, 1.0),
    )
    n_tgts = [4, 2]
    tgt_boxes = np.zeros((B, K, 4), np.float32)
    tgt_labels = np.zeros((B, K), np.int64)
    tgt_valid = np.zeros((B, K), bool)
    for b, n in enumerate(n_tgts):
        tgt_boxes[b, :n] = np.concatenate([
            rng.random((n, 2)) * 0.6 + 0.2, rng.random((n, 2)) * 0.2 + 0.05
        ], -1)
        tgt_labels[b, :n] = rng.integers(0, C, n)
        tgt_valid[b, :n] = True
    return anchors, levels, corners, enc, pre, (
        tgt_boxes, tgt_labels, tgt_valid, n_tgts
    )


def _reference_total(anchors, levels, corners, enc, pre, targets):
    from ref_mount import mount_reference_tasks

    mount_reference_tasks()
    import torch

    from lightly_train._task_models.object_detection_components.dfine_criterion import (  # noqa: E501
        DFINECriterion,
    )
    from lightly_train._task_models.object_detection_components.matcher import (  # noqa: E501
        HungarianMatcher,
    )

    tgt_boxes, tgt_labels, tgt_valid, n_tgts = targets
    matcher = HungarianMatcher(
        weight_dict={"cost_class": 2.0, "cost_bbox": 5.0, "cost_giou": 2.0},
        use_focal_loss=True, alpha=0.25, gamma=2.0,
    )
    criterion = DFINECriterion(
        matcher=matcher,
        weight_dict={"loss_vfl": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0,
                     "loss_fgl": 0.15, "loss_ddf": 1.5},
        losses=["vfl", "boxes", "local"],
        alpha=0.75, gamma=2.0, num_classes=C, reg_max=REG_MAX,
    )
    t = torch.from_numpy
    up = torch.tensor([0.5])
    reg_scale = torch.tensor([4.0])
    fin_logits, fin_boxes = levels[-1]
    out = {
        "pred_logits": t(fin_logits), "pred_boxes": t(fin_boxes),
        "pred_corners": t(corners[-1].reshape(B, Q, -1)),
        "ref_points": t(anchors), "up": up, "reg_scale": reg_scale,
        "aux_outputs": [
            {
                "pred_logits": t(levels[i][0]),
                "pred_boxes": t(levels[i][1]),
                "pred_corners": t(corners[i].reshape(B, Q, -1)),
                "ref_points": t(anchors),
                "teacher_corners": t(corners[-1].reshape(B, Q, -1)),
                "teacher_logits": t(fin_logits),
            }
            for i in range(L_DEC - 1)
        ],
        "pre_outputs": {
            "pred_logits": t(pre[0]), "pred_boxes": t(pre[1])
        },
        "enc_aux_outputs": [
            {"pred_logits": t(enc[0]), "pred_boxes": t(enc[1])}
        ],
        "enc_meta": {"class_agnostic": False},
    }
    tgts = [
        {"labels": t(tgt_labels[b, :n]), "boxes": t(tgt_boxes[b, :n])}
        for b, n in enumerate(n_tgts)
    ]
    with torch.no_grad():
        loss_dict = criterion(outputs=out, targets=tgts, world_size=1)
    return float(sum(loss_dict.values())), {
        k: float(v) for k, v in loss_dict.items()
    }


def _rebuild_total(anchors, levels, corners, enc, pre, targets):
    import jax.numpy as jnp

    from lightly_train_tpu.tasks.detection.criterion import (
        detection_criterion,
    )

    tgt_boxes, tgt_labels, tgt_valid, _ = targets
    # rebuild logits carry a trailing unused column (C+1 layout)
    pad = lambda lg: jnp.asarray(
        np.concatenate([lg, np.zeros((B, Q, 1), np.float32)], -1)
    )
    outputs = [
        (pad(enc[0]), jnp.asarray(enc[1])),
        (pad(pre[0]), jnp.asarray(pre[1])),
    ] + [
        (pad(lg), jnp.asarray(bx)) for lg, bx in levels
    ]
    dists = [None, None] + [
        (jnp.asarray(c), jnp.asarray(anchors)) for c in corners
    ]
    total, metrics = detection_criterion(
        outputs, jnp.asarray(tgt_labels.astype(np.int32)),
        jnp.asarray(tgt_boxes), jnp.asarray(tgt_valid), dists=dists,
    )
    return float(total), metrics


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_detection_criterion_matches_reference(seed, monkeypatch):
    monkeypatch.setenv("LIGHTLY_TRAIN_MATCHER", "hungarian")
    data = _synthetic(seed)
    ref_total, ref_dict = _reference_total(*data)
    got_total, _ = _rebuild_total(*data)
    assert got_total == pytest.approx(ref_total, rel=2e-5), (
        got_total, ref_total, ref_dict
    )
