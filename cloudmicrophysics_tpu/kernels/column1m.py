"""Fused 1M column step as a single Pallas TPU kernel.

The XLA-jitted :func:`cloudmicrophysics_tpu.models.column.step_column_1m`
already fuses well (it is HBM-bandwidth-bound); this kernel makes the
blocking explicit — each grid step streams a ``(block_cols, nlev)`` tile
of all seven prognostic fields through VMEM and applies the *same* jnp
physics functions to the tile, writing the stepped state back. Columns
are independent except for the vertical sedimentation shift, which stays
inside the tile (the level axis is never split).

Useful as (a) the template for hand-fused kernels where XLA's fusion
breaks down, and (b) a pinned lower bound on achievable fusion: one HBM
read + one write per field per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..models.column import ColumnState, step_column_1m

__all__ = ["step_column_1m_pallas"]

_FIELDS = ColumnState._fields  # (rho, T, q_tot, q_lcl, q_icl, q_rai, q_sno)


def _kernel(*refs, mp, tps, tv, dt, dz, mode, nsub, sediment_cloud):
    ins, outs = refs[: len(_FIELDS)], refs[len(_FIELDS):]
    state = ColumnState(*(r[...] for r in ins))
    new = step_column_1m(state, mp, tps, tv, dt, dz, mode=mode, nsub=nsub,
                         sediment_cloud=sediment_cloud)
    for ref, val in zip(outs, new):
        ref[...] = val


def step_column_1m_pallas(state: ColumnState, mp, tps, tv, dt, dz,
                          mode: str = "instantaneous", nsub: int = 1,
                          sediment_cloud: bool = True,
                          block_cols: int = 256,
                          interpret: bool = False) -> ColumnState:
    """Pallas-blocked version of ``step_column_1m`` (same signature +
    ``block_cols``/``interpret``). ``ncol`` must be a multiple of
    ``block_cols``; pass ``interpret=True`` to run on CPU for testing."""
    ncol, nlev = state.rho.shape
    if ncol % block_cols:
        raise ValueError(
            f"ncol={ncol} not a multiple of block_cols={block_cols}")
    dtype = state.rho.dtype
    spec = pl.BlockSpec((block_cols, nlev), lambda i: (i, 0))

    kernel = functools.partial(
        _kernel, mp=mp, tps=tps, tv=tv, dt=dt, dz=dz, mode=mode, nsub=nsub,
        sediment_cloud=sediment_cloud)
    out = pl.pallas_call(
        kernel,
        grid=(ncol // block_cols,),
        in_specs=[spec] * len(_FIELDS),
        out_specs=[spec] * len(_FIELDS),
        out_shape=[jax.ShapeDtypeStruct((ncol, nlev), dtype)] * len(_FIELDS),
        interpret=interpret,
    )(*state)
    return ColumnState(*out)
