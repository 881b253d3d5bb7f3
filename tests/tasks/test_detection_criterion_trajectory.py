"""Detection criterion TRAJECTORY parity vs the reference DFINECriterion.

Beyond value equality (test_detection_criterion_golden.py), this trains two
converter-identical toy detection heads — torch stepped by the ACTUAL
reference criterion + AdamW, flax by the rebuild's ``detection_criterion`` +
optax AdamW — on identical fixed features and targets for N steps. Per-step
losses must track within fp32 noise, which verifies the GRADIENTS of every
loss component (VFL focal weights, GO-matched L1/GIoU through the box
sanitization clamp, the W(n)-bin FGL, the DDF distillation) and the
optimizer coupling, not just the forward values.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

B, Q, C = 2, 10, 5
D = 16          # feature dim
REG_MAX = 32
L_DEC = 2
K = 3
LR = 2e-3
WD = 1e-4
STEPS = 10


def _fixed_data(seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((B, Q, D)).astype(np.float32)
    anchors = np.concatenate([
        rng.random((B, Q, 2), dtype=np.float32) * 0.6 + 0.2,
        rng.random((B, Q, 2), dtype=np.float32) * 0.2 + 0.08,
    ], -1)
    n_tgts = [3, 2]
    tgt_boxes = np.zeros((B, K, 4), np.float32)
    tgt_labels = np.zeros((B, K), np.int64)
    tgt_valid = np.zeros((B, K), bool)
    for b, n in enumerate(n_tgts):
        tgt_boxes[b, :n] = np.concatenate([
            rng.random((n, 2)) * 0.6 + 0.2, rng.random((n, 2)) * 0.2 + 0.05
        ], -1)
        tgt_labels[b, :n] = rng.integers(0, C, n)
        tgt_valid[b, :n] = True
    # head weights: per decoder level (logits, corners); plus enc + pre
    heads = {}
    for i in range(L_DEC):
        heads[f"cls{i}"] = (rng.standard_normal((D, C)) * 0.1).astype(
            np.float32
        )
        heads[f"crn{i}"] = (
            rng.standard_normal((D, 4 * (REG_MAX + 1))) * 0.05
        ).astype(np.float32)
    heads["enc_cls"] = (rng.standard_normal((D, C)) * 0.1).astype(np.float32)
    heads["pre_cls"] = (rng.standard_normal((D, C)) * 0.1).astype(np.float32)
    heads["pre_box"] = (rng.standard_normal((D, 4)) * 0.1).astype(np.float32)
    return feats, anchors, heads, (tgt_boxes, tgt_labels, tgt_valid, n_tgts)


@pytest.mark.long_running
def test_criterion_trajectory_matches_reference(monkeypatch):
    monkeypatch.setenv("LIGHTLY_TRAIN_MATCHER", "hungarian")
    feats_np, anchors_np, heads_np, targets = _fixed_data()
    tgt_boxes, tgt_labels, tgt_valid, n_tgts = targets

    # ---------------- torch side (reference criterion) ----------------
    from ref_mount import mount_reference_tasks

    mount_reference_tasks()
    import torch

    from lightly_train._task_models.object_detection_components.dfine_criterion import (  # noqa: E501
        DFINECriterion,
    )
    from lightly_train._task_models.object_detection_components.dfine_utils import (  # noqa: E501
        distance2bbox as t_d2b,
        weighting_function as t_wf,
    )
    from lightly_train._task_models.object_detection_components.matcher import (  # noqa: E501
        HungarianMatcher,
    )

    t = torch.from_numpy
    params_t = {
        k: torch.nn.Parameter(t(v.copy())) for k, v in heads_np.items()
    }
    opt_t = torch.optim.AdamW(params_t.values(), lr=LR, weight_decay=WD)
    criterion = DFINECriterion(
        matcher=HungarianMatcher(
            weight_dict={"cost_class": 2.0, "cost_bbox": 5.0,
                         "cost_giou": 2.0},
            use_focal_loss=True, alpha=0.25, gamma=2.0,
        ),
        weight_dict={"loss_vfl": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0,
                     "loss_fgl": 0.15, "loss_ddf": 1.5},
        losses=["vfl", "boxes", "local"],
        alpha=0.75, gamma=2.0, num_classes=C, reg_max=REG_MAX,
    )
    feats_t = t(feats_np)
    anchors_t = t(anchors_np)
    up = torch.tensor([0.5])
    reg_scale = torch.tensor([4.0])
    project_t = t_wf(REG_MAX, up, reg_scale)
    tgts_t = [
        {"labels": t(tgt_labels[b, :n]), "boxes": t(tgt_boxes[b, :n])}
        for b, n in enumerate(n_tgts)
    ]

    def torch_step():
        logits, corners, boxes = [], [], []
        accum = None
        for i in range(L_DEC):
            logits.append(feats_t @ params_t[f"cls{i}"])
            c = (feats_t @ params_t[f"crn{i}"]).reshape(B, Q, 4, REG_MAX + 1)
            accum = c if accum is None else c + accum
            corners.append(accum)
            prob = torch.softmax(accum.reshape(-1, REG_MAX + 1), dim=-1)
            dist = (prob @ project_t).reshape(B, Q, 4)
            boxes.append(t_d2b(anchors_t, dist, reg_scale))
        enc_logits = feats_t @ params_t["enc_cls"]
        pre_logits = feats_t @ params_t["pre_cls"]
        pre_boxes = torch.sigmoid(feats_t @ params_t["pre_box"])
        out = {
            "pred_logits": logits[-1], "pred_boxes": boxes[-1],
            "pred_corners": corners[-1].reshape(B, Q, -1),
            "ref_points": anchors_t, "up": up, "reg_scale": reg_scale,
            "aux_outputs": [
                {
                    "pred_logits": logits[i], "pred_boxes": boxes[i],
                    "pred_corners": corners[i].reshape(B, Q, -1),
                    "ref_points": anchors_t,
                    "teacher_corners": corners[-1].reshape(B, Q, -1),
                    "teacher_logits": logits[-1],
                }
                for i in range(L_DEC - 1)
            ],
            "pre_outputs": {
                "pred_logits": pre_logits, "pred_boxes": pre_boxes
            },
            "enc_aux_outputs": [
                {"pred_logits": enc_logits, "pred_boxes": anchors_t + 0.0}
            ],
            "enc_meta": {"class_agnostic": False},
        }
        loss_dict = criterion(outputs=out, targets=tgts_t, world_size=1)
        loss = sum(loss_dict.values())
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        return float(loss.detach())

    # ---------------- flax side (rebuild criterion) ----------------
    import jax
    import jax.numpy as jnp
    import optax

    from lightly_train_tpu.tasks.detection.criterion import (
        detection_criterion,
    )
    from lightly_train_tpu.tasks.detection.dfine_utils import (
        distance2bbox,
        integral,
        weighting_function,
    )

    params_f = {k: jnp.asarray(v.copy()) for k, v in heads_np.items()}
    opt_f = optax.adamw(LR, weight_decay=WD)
    opt_state = opt_f.init(params_f)
    feats_f = jnp.asarray(feats_np)
    anchors_f = jnp.asarray(anchors_np)
    project = weighting_function(REG_MAX)
    tl = jnp.asarray(tgt_labels.astype(np.int32))
    tb = jnp.asarray(tgt_boxes)
    tv = jnp.asarray(tgt_valid)

    def flax_loss(p):
        pad = lambda lg: jnp.concatenate(
            [lg, jnp.zeros((B, Q, 1), jnp.float32)], -1
        )
        logits, corners, boxes = [], [], []
        accum = None
        for i in range(L_DEC):
            logits.append(feats_f @ p[f"cls{i}"])
            c = (feats_f @ p[f"crn{i}"]).reshape(B, Q, 4, REG_MAX + 1)
            accum = c if accum is None else c + accum
            corners.append(accum)
            boxes.append(
                distance2bbox(anchors_f, integral(accum, project))
            )
        outputs = [
            (pad(feats_f @ p["enc_cls"]), anchors_f),
            (pad(feats_f @ p["pre_cls"]),
             jax.nn.sigmoid(feats_f @ p["pre_box"])),
        ] + [(pad(lg), bx) for lg, bx in zip(logits, boxes)]
        dists = [None, None] + [(c, anchors_f) for c in corners]
        total, _ = detection_criterion(outputs, tl, tb, tv, dists=dists)
        return total

    records = []
    for s in range(STEPS):
        t_loss = torch_step()
        f_loss, grads = jax.value_and_grad(flax_loss)(params_f)
        updates, opt_state = opt_f.update(grads, opt_state, params_f)
        params_f = optax.apply_updates(params_f, updates)
        records.append((s, t_loss, float(f_loss)))

    rels = [abs(a - b) / abs(a) for _, a, b in records]
    assert max(rels) < 5e-4, records
