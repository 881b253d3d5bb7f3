"""Deployment export backends (ONNX codec + jaxpr compiler + evaluator).

Layout mirrors the reference's ``src/lightly_train/_export/`` package.
"""
