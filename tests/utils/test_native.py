"""Native C++ pre/post-processing: build + parity vs numpy/JAX."""

import numpy as np
import pytest

from lightly_train_tpu.utils import native


def test_native_library_builds():
    assert native.native_available(), "g++ build of liblt_native.so failed"


def test_preprocess_parity_native_vs_numpy():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    out_native = native.preprocess_image(img, (32, 32))
    # Force the numpy fallback for comparison.
    lib, native._lib = native._lib, None
    native._lib_failed = True
    out_numpy = native.preprocess_image(img, (32, 32))
    native._lib, native._lib_failed = lib, False
    assert out_native.shape == (3, 32, 32)
    np.testing.assert_allclose(out_native, out_numpy, atol=1e-5)


def test_postprocess_detections_parity():
    rng = np.random.default_rng(1)
    Q, C = 16, 5
    logits = rng.normal(size=(Q, C)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(Q, 4)).astype(np.float32)
    bn, sn, ln = native.postprocess_detections(logits, boxes, (100, 200),
                                               top_k=10)
    lib, native._lib = native._lib, None
    native._lib_failed = True
    bf, sf, lf = native.postprocess_detections(logits, boxes, (100, 200),
                                               top_k=10)
    native._lib, native._lib_failed = lib, False
    np.testing.assert_allclose(sn, sf, atol=1e-6)
    np.testing.assert_array_equal(ln, lf)
    np.testing.assert_allclose(bn, bf, atol=1e-4)


def test_postprocess_detections_matches_jax_decode():
    """Numerics match ObjectDetectionTrainModel._decode (top-k + xyxy)."""
    import jax.numpy as jnp

    from lightly_train_tpu.tasks.detection.box_utils import cxcywh_to_xyxy

    rng = np.random.default_rng(2)
    Q, C = 8, 3
    logits = rng.normal(size=(Q, C)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(Q, 4)).astype(np.float32)
    bn, sn, ln = native.postprocess_detections(
        logits, boxes, (1, 1), top_k=Q * C
    )
    scores = 1 / (1 + np.exp(-logits))
    flat = scores.reshape(-1)
    order = np.argsort(-flat)
    np.testing.assert_allclose(sn, flat[order], atol=1e-6)
    q = order // C
    expected = np.asarray(cxcywh_to_xyxy(jnp.asarray(boxes[q])))
    np.testing.assert_allclose(bn, expected, atol=1e-5)


def test_postprocess_semantic_argmax():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(10, 12, 4)).astype(np.float32)
    out = native.postprocess_semantic(logits)
    np.testing.assert_array_equal(out, np.argmax(logits, axis=-1))


def test_score_threshold_cut():
    logits = np.full((4, 2), -10.0, np.float32)
    logits[0, 0] = 10.0
    boxes = np.full((4, 4), 0.5, np.float32)
    b, s, l = native.postprocess_detections(
        logits, boxes, (10, 10), top_k=8, score_threshold=0.5
    )
    assert len(s) == 1 and l[0] == 0
