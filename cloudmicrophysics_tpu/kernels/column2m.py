"""Fused 2M warm-rain column step as a Pallas TPU kernel.

Same construction as :mod:`.column1m`: each grid step streams a
``(block_cols, nlev)`` tile of the seven 2M prognostic fields through
VMEM and applies :func:`~cloudmicrophysics_tpu.models.column.step_column_2m`
unchanged, so numerics match the XLA path by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..models.column import ColumnState2M, step_column_2m

__all__ = ["step_column_2m_pallas", "pack_state_2m", "unpack_state_2m",
           "step_column_2m_pallas_packed"]

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


def pack_state_2m(state: ColumnState2M):
    """Stack the 7 prognostic 2M fields into one ``(7, ncol, nlev)`` HBM
    buffer — one DMA stream per grid step instead of 14 (same
    structure-of-arrays trick as :func:`.column1m.pack_state`)."""
    return jnp.stack(list(state), axis=0)


def unpack_state_2m(packed) -> ColumnState2M:
    """Inverse of :func:`pack_state_2m`."""
    return ColumnState2M(*(packed[k] for k in range(len(_FIELDS))))


def _kernel_packed(*refs, mp, tps, dt, dz, has_affine):
    if has_affine:
        scale_ref, bias_ref = refs[:2]
        refs = refs[2:]
    in_ref, out_ref = refs
    state = ColumnState2M(*(in_ref[k] for k in range(len(_FIELDS))))
    if has_affine:
        state = state._replace(
            q_tot=state.q_tot * scale_ref[0, 0] + bias_ref[0, 0])
    new = step_column_2m(state, mp, tps, dt, dz)
    for k, val in enumerate(new):
        out_ref[k] = val


def step_column_2m_pallas_packed(packed, mp, tps, dt, dz,
                                 block_cols: int = 128,
                                 interpret: bool = False,
                                 q_tot_affine=None):
    """Packed-state variant of :func:`step_column_2m_pallas`: state is a
    single ``(7, ncol, nlev)`` array (see :func:`pack_state_2m`), maps to
    a like-shaped output. ``q_tot_affine``: optional ``(scale, bias)``
    scalars applied to ``q_tot`` on load inside the kernel (bit-fresh
    bench inputs without an extra HBM pass, as in the 1M kernel)."""
    nf, ncol, nlev = packed.shape
    assert nf == len(_FIELDS), packed.shape
    if ncol % block_cols:
        raise ValueError(
            f"ncol={ncol} not a multiple of block_cols={block_cols}")
    spec = pl.BlockSpec((nf, block_cols, nlev), lambda i: (0, i, 0))
    kernel = functools.partial(_kernel_packed, mp=mp, tps=tps, dt=dt, dz=dz,
                               has_affine=q_tot_affine is not None)
    in_specs = [spec]
    operands = [packed]
    if q_tot_affine is not None:
        scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0))
        in_specs = [scalar_spec, scalar_spec] + in_specs
        scale, bias = q_tot_affine
        operands = [jnp.full((1, 1), scale, packed.dtype),
                    jnp.full((1, 1), bias, packed.dtype)] + operands
    return pl.pallas_call(
        kernel,
        grid=(ncol // block_cols,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, packed.dtype),
        interpret=interpret,
    )(*operands)
