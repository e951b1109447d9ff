from .mesh import (
    ShardedGramian,
    default_mesh,
    replicate,
    shard_rows,
    sharded_cg,
    sharded_gramian_matvec,
)
