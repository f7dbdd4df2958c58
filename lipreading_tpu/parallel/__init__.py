"""Parallelism: mesh construction + sharding specs (BASELINE config 5).

The reference is single-process/single-GPU (SURVEY.md §3 parallelism table);
all distribution here is TPU-native: declare a Mesh + NamedShardings, jit the
train step, and let the XLA SPMD partitioner emit psum/all-gather over ICI.
No communication code exists in this package by design.

Sequence/context parallelism (SURVEY.md §6 stretch item): clips here are
cue-length (tens-hundreds of frames) so the time axis fits one chip; if clip
length ever grows, the TPU-idiomatic extension is sharding T over a mesh
axis with blockwise/ring attention over ICI neighbors in the transformer
encoder — the Mesh/NamedSharding plumbing in mesh.py already carries the
extra axis.
"""

from lipreading_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
