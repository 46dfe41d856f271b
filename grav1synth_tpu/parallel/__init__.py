"""Device meshes, frame/GOP sharding, and collectives.

The reference is a single-threaded CLI (SURVEY §2 P1/P2); this layer is
the TPU-native replacement: data parallelism over frames/GOPs on a
`jax.sharding.Mesh`, with per-shard statistics exchanged via XLA
collectives and grain tables merged associatively on host.
"""

from .mesh import (
    frame_shards,
    make_mesh,
    pad_batch,
    sharded_apply,
    sharded_apply_with_stats,
)

__all__ = [
    "frame_shards",
    "make_mesh",
    "pad_batch",
    "sharded_apply",
    "sharded_apply_with_stats",
]
