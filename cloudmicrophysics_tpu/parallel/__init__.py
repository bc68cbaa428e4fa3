"""Device-mesh parallelism (column data parallelism)."""

from .comms import (
    column_mesh,
    column_sharding,
    initialize_distributed,
    replicated,
    shard_columns,
)
