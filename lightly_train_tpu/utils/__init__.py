from lightly_train_tpu.utils import knn, native

__all__ = ["knn", "native"]
