"""State containers shared by the scheme modules.

The reference passes per-cell state as named tuples ``micro = (; q_tot,
q_lcl, q_icl, q_rai, q_sno)`` and ``thermo = (; rho, T)`` (see
``src/BulkMicrophysicsTendencies.jl:141-217``). Here they are typed
NamedTuples (JAX pytrees), holding arrays of any shared shape — the whole
library is elementwise over them.
"""

from __future__ import annotations

from typing import NamedTuple

from jax import Array


class MicroState(NamedTuple):
    """Specific contents [kg/kg]: total, cloud liquid, cloud ice, rain, snow."""

    q_tot: Array
    q_lcl: Array
    q_icl: Array
    q_rai: Array
    q_sno: Array


class ThermoState(NamedTuple):
    """Air density [kg/m^3] and temperature [K]."""

    rho: Array
    T: Array


class MicroState2M(NamedTuple):
    """2-moment prognostics: specific contents [kg/kg] + number
    concentrations [1/kg]."""

    q_tot: Array
    q_lcl: Array
    q_rai: Array
    n_lcl: Array
    n_rai: Array
