"""Parallelism: mesh construction + sharding specs (BASELINE config 5).

The reference is single-process/single-GPU (SURVEY.md §3 parallelism table);
all distribution here is TPU-native: declare a Mesh + NamedShardings, jit the
train step, and let the XLA SPMD partitioner emit psum/all-gather over ICI.
No communication code exists in this package by design.

Sequence/context parallelism (SURVEY.md §6 stretch item): clips here are
cue-length (tens-hundreds of frames) so the time axis fits one chip; for
long clips, ring.py implements the TPU-idiomatic extension — the time axis
shards over the ``model`` mesh axis and the transformer encoder's
self-attention streams k/v blocks around the ICI ring (jax.lax.ppermute)
with an exact online-softmax accumulator (ring_encoder_apply; equivalence
with the unsharded encoder is test-pinned on the CPU mesh, tests/test_ring.py).
"""

from lipreading_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
