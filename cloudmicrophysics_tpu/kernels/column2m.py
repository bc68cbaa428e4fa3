"""Fused 2M warm-rain column step as a Pallas TPU kernel.

Same construction as :mod:`.column1m`: each grid step streams a
``(block_cols, nlev)`` tile of the seven 2M prognostic fields through
VMEM and applies :func:`~cloudmicrophysics_tpu.models.column.step_column_2m`
unchanged, so numerics match the XLA path by construction.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl

from ..models.column import ColumnState2M, step_column_2m

__all__ = ["step_column_2m_pallas"]

_FIELDS = ColumnState2M._fields


def _kernel(*refs, mp, tps, dt, dz):
    ins, outs = refs[: len(_FIELDS)], refs[len(_FIELDS):]
    state = ColumnState2M(*(r[...] for r in ins))
    new = step_column_2m(state, mp, tps, dt, dz)
    for ref, val in zip(outs, new):
        ref[...] = val


def step_column_2m_pallas(state: ColumnState2M, mp, tps, dt, dz,
                          block_cols: int = 256,
                          interpret: bool = False) -> ColumnState2M:
    ncol, nlev = state.rho.shape
    if ncol % block_cols:
        raise ValueError(
            f"ncol={ncol} not a multiple of block_cols={block_cols}")
    dtype = state.rho.dtype
    spec = pl.BlockSpec((block_cols, nlev), lambda i: (i, 0))
    kernel = functools.partial(_kernel, mp=mp, tps=tps, dt=dt, dz=dz)
    out = pl.pallas_call(
        kernel,
        grid=(ncol // block_cols,),
        in_specs=[spec] * len(_FIELDS),
        out_specs=[spec] * len(_FIELDS),
        out_shape=[jax.ShapeDtypeStruct((ncol, nlev), dtype)] * len(_FIELDS),
        interpret=interpret,
    )(*state)
    return ColumnState2M(*out)
