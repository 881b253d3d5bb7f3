"""Pretrain an embedding model and write embeddings for a directory.

Mirrors the reference ``embed_dim`` workflow (``lightly_train.pretrain``
+ ``lightly_train.embed``): a trainable projection joins the backbone
during SSL pretraining, the exported artifact carries it as a sidecar,
and ``embed`` produces embeddings at the configured dimension. The
embedding head can also be handed to torch consumers via
``export(part="embedding_model")``.
"""

import lightly_train_tpu as lt

if __name__ == "__main__":
    lt.pretrain(
        out="runs/embedder",
        data="datasets/my_images",
        model="dinov2/vits14",
        method="simclr",
        embed_dim=128,                      # embedding dimension to train
        batch_size=512,
    )
    lt.embed(
        out="runs/embedder/embeddings.csv",
        data="datasets/my_images",
        checkpoint="runs/embedder/exported_models/exported_last",
        format=lt.EmbeddingFormat.LIGHTLY_CSV,
    )
    lt.export(
        out="runs/embedder/embedding_model.pt",
        checkpoint="runs/embedder/exported_models/exported_last",
        format=lt.ModelFormat.TORCH_STATE_DICT,
        part=lt.ModelPart.EMBEDDING_MODEL,
    )
