"""Fused 2M + P3 ice column step as a Pallas TPU kernel.

Same construction as :mod:`.column1m` / :mod:`.column2m`: each grid step
streams a ``(block_cols, nlev)`` tile of the eleven prognostic fields (plus
the previous step's ``log lambda`` for warm-starting the shape solver)
through VMEM and applies
:func:`~cloudmicrophysics_tpu.models.column.step_column_p3` unchanged, so
numerics match the XLA path by construction. This is the third BASELINE
kernel (reference ``test/gpu_performance.jl:238-259`` measures the P3
``log lambda`` + self-collection kernel; here the whole 2M+P3 step — shape
solve, collision integrals, nucleation budgets, and sedimentation — is one
fused pass over the tile, keeping every intermediate in VMEM).

Unlike the 1M/2M kernels, the P3 parameter containers hold small *array*
tables (Gauss–Legendre nodes/weights, Chen2022 coefficient tables). Pallas
requires array constants to be explicit kernel operands, so the parameter
pytree is split: array leaves ride in as broadcast (grid-invariant) inputs
and are re-inserted into the pytree inside the kernel; scalar leaves stay
closed over (they compile to immediates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..models.column import ColumnStateP3, step_column_p3
from ..utils.special import raw_special_functions

__all__ = ["step_column_p3_pallas"]

_FIELDS = ColumnStateP3._fields
_N = len(_FIELDS)


def _split_array_leaves(tree):
    """Split a pytree into (treedef, scalar-leaves-with-holes, arrays).

    Array-valued leaves (ndim >= 1) are replaced by ``None`` placeholders
    and returned separately so they can be threaded through ``pallas_call``
    as operands.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    holes, positions, arrays = list(leaves), [], []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, (jax.Array, np.ndarray)) and leaf.ndim >= 1:
            positions.append(i)
            arrays.append(jnp.asarray(leaf))
            holes[i] = None
    return treedef, holes, positions, arrays


def _kernel(*refs, treedef, holes, positions, n_params, warm_start,
            dt, dz):
    n_state = _N + (1 if warm_start else 0)
    state_refs = refs[:_N]
    guess_ref = refs[_N] if warm_start else None
    param_refs = refs[n_state: n_state + n_params]
    out_refs = refs[n_state + n_params:]

    leaves = list(holes)
    for pos, ref in zip(positions, param_refs):
        leaves[pos] = ref[...]
    mp, tps = jax.tree_util.tree_unflatten(treedef, leaves)

    state = ColumnStateP3(*(r[...] for r in state_refs))
    guess = guess_ref[...] if warm_start else None
    new, loglam = step_column_p3(state, mp, tps, dt, dz, guess)
    for ref, val in zip(out_refs[:_N], new):
        ref[...] = val
    out_refs[_N][...] = loglam


def step_column_p3_pallas(state: ColumnStateP3, mp, tps, dt, dz,
                          loglambda_guess=None,
                          block_cols: int = 128,
                          interpret: bool = False):
    """Returns ``(new_state, loglambda)`` like :func:`step_column_p3`."""
    ncol, nlev = state.rho.shape
    if ncol % block_cols:
        raise ValueError(
            f"ncol={ncol} not a multiple of block_cols={block_cols}")
    dtype = state.rho.dtype
    spec = pl.BlockSpec((block_cols, nlev), lambda i: (i, 0))
    warm_start = loglambda_guess is not None

    treedef, holes, positions, arrays = _split_array_leaves((mp, tps))
    # grid-invariant parameter tables: full-array blocks at a fixed origin
    param_specs = [
        pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd)
        for a in arrays
    ]

    kernel = functools.partial(
        _kernel, treedef=treedef, holes=holes, positions=positions,
        n_params=len(arrays), warm_start=warm_start, dt=dt, dz=dz)
    inputs = tuple(state) + ((loglambda_guess,) if warm_start else ()) \
        + tuple(arrays)
    # raw special functions: Mosaic cannot lower custom_jvp_call with
    # symbolic_zeros, and the kernel is forward-only
    with raw_special_functions():
        out = pl.pallas_call(
            kernel,
            grid=(ncol // block_cols,),
            in_specs=[spec] * (_N + (1 if warm_start else 0)) + param_specs,
            out_specs=[spec] * (_N + 1),
            out_shape=[jax.ShapeDtypeStruct((ncol, nlev), dtype)] * (_N + 1),
            interpret=interpret,
        )(*inputs)
    return ColumnStateP3(*out[:_N]), out[_N]
