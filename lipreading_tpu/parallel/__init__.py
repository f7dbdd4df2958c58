"""Parallelism: mesh construction + sharding specs (BASELINE config 5).

The reference is single-process/single-GPU (SURVEY.md §3 parallelism table);
all distribution here is TPU-native: declare a Mesh + NamedShardings, jit the
train step, and let the XLA SPMD partitioner emit psum/all-gather over ICI.
No communication code exists in this package by design.
"""

from lipreading_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
