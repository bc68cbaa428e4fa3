"""Column model driver (L6): ``(ncol, nlev)`` arrays + sedimentation.

The reference library is pointwise; the host model applies terminal
velocities in an upwind vertical flux (see
``/root/reference/test/gpu_clima_core_test.jl:34-40`` mimicking the
ClimaAtmos use). This module supplies that host-model role TPU-natively:

* state is a pytree of HBM-resident ``(ncol, nlev)`` arrays;
* all process rates are one fused elementwise pass (BMT-1M);
* sedimentation is a first-order upwind donor-cell flux — a per-column
  *shift*, not a scan: level k receives the flux from level k+1 above, so
  the whole update is ``roll`` + elementwise, which XLA fuses with the
  process kernel. Zero cross-column communication; columns shard freely
  over the device mesh (pure data parallelism, SURVEY.md §2.5).

Convention: level index k increases upward (k = 0 is the surface);
hydrometeors fall toward k = 0. The flux through the bottom interface is
the surface precipitation rate diagnostic.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from ..ops import m1 as CM1
from ..ops import noneq as CMNonEq
from ..parameters.m1 import Microphysics1MParams
from ..parameters.terminal_velocity import TerminalVelocityParams
from ..parameters.thermodynamics import ThermodynamicsParameters
from ..ops.states import MicroState, ThermoState
from . import tendencies as BMT

__all__ = ["ColumnState", "sedimentation_tendency", "step_column_1m",
           "surface_precip_rate"]


class ColumnState(NamedTuple):
    """Prognostic column state; every field is ``(ncol, nlev)``."""

    rho: Array     # air density [kg/m^3] (held fixed)
    T: Array       # temperature [K]
    q_tot: Array
    q_lcl: Array
    q_icl: Array
    q_rai: Array
    q_sno: Array


def sedimentation_tendency(rho, q, w, dz):
    """Upwind donor-cell sedimentation: ``dq/dt = (F_in - F_out)/(rho dz)``
    with ``F_k = rho_k w_k q_k`` falling downward (toward k = 0).

    The incoming flux at level k is the outgoing flux of level k+1; the top
    level has no inflow. Implemented as a shift along the level axis —
    elementwise + static slice, fully fusable.
    """
    F = rho * w * q  # downward mass flux [kg/m^2/s]
    # inflow: flux from the level above (k+1); top gets zero
    F_in = jnp.concatenate(
        [F[..., 1:], jnp.zeros_like(F[..., :1])], axis=-1)
    return (F_in - F) / (rho * dz)


def surface_precip_rate(state: ColumnState, mp: Microphysics1MParams,
                        tv: TerminalVelocityParams):
    """Surface rain + snow flux [kg/m^2/s] (positive down)."""
    q_rai0 = state.q_rai[..., 0]
    q_sno0 = state.q_sno[..., 0]
    rho0 = state.rho[..., 0]
    w_rai = CM1.terminal_velocity(
        mp.precip.rain, mp.terminal_velocity.rain, rho0, q_rai0)
    w_sno = CM1.terminal_velocity(
        mp.precip.snow, mp.terminal_velocity.snow, rho0, q_sno0)
    return rho0 * (w_rai * q_rai0 + w_sno * q_sno0)


def step_column_1m(
    state: ColumnState,
    mp: Microphysics1MParams,
    tps: ThermodynamicsParameters,
    tv: TerminalVelocityParams,
    dt,
    dz,
    mode: str = "instantaneous",
    nsub: int = 1,
    sediment_cloud: bool = True,
) -> ColumnState:
    """One explicit Euler step: fused process rates + sedimentation.

    Everything is one jit-able function of the column state — the natural
    unit for Pallas fusion and for pjit sharding over the column axis.
    """
    rates = BMT.bulk_tendencies_1m(
        mp, tps, state.rho, state.T,
        state.q_tot, state.q_lcl, state.q_icl, state.q_rai, state.q_sno,
        mode=mode, dt=dt, nsub=nsub,
    )

    # terminal velocities for sedimentation (per reference
    # src/parameters/TerminalVelocity.jl:356-366 usage table)
    w_rai = CM1.terminal_velocity(
        mp.precip.rain, mp.terminal_velocity.rain, state.rho, state.q_rai)
    w_sno = CM1.terminal_velocity(
        mp.precip.snow, mp.terminal_velocity.snow, state.rho, state.q_sno)

    sed_rai = sedimentation_tendency(state.rho, state.q_rai, w_rai, dz)
    sed_sno = sedimentation_tendency(state.rho, state.q_sno, w_sno, dz)

    if sediment_cloud:
        w_lcl = CMNonEq.terminal_velocity(
            mp.cloud.liquid, tv.stokes, state.rho, state.q_lcl)
        w_icl = CMNonEq.terminal_velocity(
            mp.cloud.ice, tv.chen2022.small_ice, state.rho, state.q_icl)
        sed_lcl = sedimentation_tendency(state.rho, state.q_lcl, w_lcl, dz)
        sed_icl = sedimentation_tendency(state.rho, state.q_icl, w_icl, dz)
    else:
        sed_lcl = sed_icl = jnp.zeros_like(state.q_lcl)

    q_lcl = state.q_lcl + dt * (rates.dq_lcl_dt + sed_lcl)
    q_icl = state.q_icl + dt * (rates.dq_icl_dt + sed_icl)
    q_rai = state.q_rai + dt * (rates.dq_rai_dt + sed_rai)
    q_sno = state.q_sno + dt * (rates.dq_sno_dt + sed_sno)

    # latent heating from phase changes (vapor <-> condensate terms only
    # enter via the aggregated cloud tendencies here; full energy coupling
    # lives in the host model)
    Lv_over_cp = tps.LH_v0 / tps.cp_d
    Ls_over_cp = tps.LH_s0 / tps.cp_d
    T_new = state.T + dt * (
        Lv_over_cp * (rates.dq_lcl_dt + rates.dq_rai_dt)
        + Ls_over_cp * (rates.dq_icl_dt + rates.dq_sno_dt)
    )

    # total water loses what falls out (sedimentation of all species)
    q_tot = state.q_tot + dt * (sed_lcl + sed_icl + sed_rai + sed_sno)

    clamp = lambda q: jnp.maximum(q, jnp.zeros_like(q))
    return ColumnState(
        rho=state.rho, T=T_new, q_tot=clamp(q_tot),
        q_lcl=clamp(q_lcl), q_icl=clamp(q_icl),
        q_rai=clamp(q_rai), q_sno=clamp(q_sno),
    )
