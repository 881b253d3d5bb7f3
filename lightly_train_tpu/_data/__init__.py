from lightly_train_tpu._data.image_dataset import (
    ImageDataset,
    decode_image,
    list_image_files,
)
from lightly_train_tpu._data.loader import PretrainLoader, SyntheticLoader
from lightly_train_tpu._data.memory_mapped_sequence import (
    MemoryMappedSequence,
    write_items_to_file,
)

__all__ = [
    "ImageDataset",
    "MemoryMappedSequence",
    "PretrainLoader",
    "SyntheticLoader",
    "decode_image",
    "list_image_files",
    "write_items_to_file",
]
