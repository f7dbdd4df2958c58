"""Model zoo (ref: src/models/ — SURVEY.md §3 L4).

Pure-functional JAX: every model is an ``init(key, cfg) -> params`` pytree
plus an ``apply(params, inputs) -> outputs`` function. No module framework —
explicit pytrees keep sharding annotations, checkpointing, and the PyTorch
weight importer (train/importer.py) transparent.

    nn.py           layer library (dense, norms, conv3d, embeddings)
    gru.py          GRU cell/stack, bidirectional, PyTorch-equation compatible
    frontend3d.py   LCANet-style 3D-CNN visual frontend (+highway)
    attention.py    Bahdanau-attention GRU decoder (ref: AttnDecoder path)
    transformer.py  transformer encoder-decoder (ref: nn.Transformer path)
    lipreader.py    composed flagship models + losses (CTC / attention / hybrid)
"""
