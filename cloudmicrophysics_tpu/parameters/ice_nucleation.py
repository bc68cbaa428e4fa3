"""Ice nucleation parameters.

Reference: ``/root/reference/src/parameters/IceNucleation.jl``. Populated
incrementally; Frostenberg2023 first (needed by the NonEq
TemperatureDependent ice-formation timescale).
"""

from __future__ import annotations

import math

from ..utils.param import paramclass


@paramclass
class Frostenberg2023:
    """INP concentration distribution vs temperature (Frostenberg et al. 2023,
    doi:10.5194/acp-23-10883-2023; reference
    src/parameters/IceNucleation.jl:178-200).

    At the defaults ``a = b = 1`` the mean log-INPC reduces to the marine
    dataset curve ``log((-T_celsius/10)^9)``.
    """

    sigma: float = 1.37     # standard deviation of log(INPC)
    a: float = 1.0
    b: float = 1.0
    T_freeze: float = 273.15

    @property
    def log_a(self) -> float:
        return math.log(self.a)


@paramclass
class Mohler2006:
    """Deposition nucleation on dust (Mohler et al. 2006;
    reference src/parameters/IceNucleation.jl:13-40)."""

    Sᵢ_max: float = 1.35    # max ice saturation ratio
    T_thr: float = 250.0    # threshold temperature [K]


@paramclass
class Koop2000:
    """Homogeneous ice nucleation rate (Koop et al. 2000;
    reference src/parameters/IceNucleation.jl:42-90)."""

    delta_a_w_min: float = 0.26
    delta_a_w_max: float = 0.34
    # cubic fit log10(J) = c1 + c2 da + c3 da^2 + c4 da^3 [1/cm3/s]
    c1: float = -906.7
    c2: float = 8502.0
    c3: float = -26924.0
    c4: float = 29180.0
    # linear fit coefficients
    linear_c1: float = -10.54758
    linear_c2: float = 242.4979


@paramclass
class MorrisonMilbrandt2014:
    """P3-style het/dep nucleation parameters (reference
    src/parameters/IceNucleation.jl:92-140)."""

    c1: float = 0.005       # Cooper curve coefficient [1/L]
    c2: float = 0.304       # Cooper curve exponent [1/K]
    T0: float = 273.15      # reference temperature [K]
    het_a: float = 0.65     # Barklie-Gokhale a [1/K]
    het_B: float = 2e-4     # Bigg 1953 B [1/cm3/s]


@paramclass
class RainFreezing:
    """Bigg 1953 immersion freezing of rain (Barklie & Gokhale coefficients;
    callable rate ``rf(T) = het_B exp(het_a (T0 - T))`` [1/m3/s]
    (reference src/parameters/IceNucleation.jl:142-176)."""

    het_a: float = 0.65     # [1/K]
    het_B: float = 2e-4 * 1e6  # converted [1/m^3/s]
    T0: float = 273.15

    def rate(self, T):
        import jax.numpy as jnp

        return self.het_B * jnp.exp(self.het_a * (self.T0 - T))
