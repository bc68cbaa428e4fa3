"""Communication / sharding layer.

The reference has no internal parallelism — its ecosystem delegates to
ClimaComms (MPI context + device abstraction; see SURVEY.md §2.5). The
TPU-native equivalent is a device mesh + GSPMD sharding:

* microphysics is vertical-column-local, so the only meaningful axis is
  the horizontal ``columns`` axis — pure data parallelism with **zero**
  cross-chip communication in the hot loop (no halos: sedimentation is a
  within-column stencil);
* diagnostics reductions (`psum` over columns) ride ICI;
* multi-host initialization mirrors ClimaComms' "context + device" shape.

Mirrors the usage in ``/root/reference/test/gpu_tests.jl:3-4`` and the
ClimaComms dev guide (``docs/dev-guides/AGENTS.md:51``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "initialize_distributed",
    "column_mesh",
    "column_sharding",
    "replicated",
    "shard_columns",
]

COLUMN_AXIS = "columns"


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (``jax.distributed.initialize``).

    No-op on a single host; call once at program start on pod slices.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process / already-initialized environments
        pass


def column_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over all (or the given) devices along ``columns``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (COLUMN_AXIS,))


def column_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (column) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(COLUMN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (e.g. for scalars / parameters)."""
    return NamedSharding(mesh, PartitionSpec())


def shard_columns(tree, mesh: Mesh):
    """Place every array leaf with its leading axis sharded over columns."""
    sh = column_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
