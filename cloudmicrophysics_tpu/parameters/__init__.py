"""Parameter layer (L1): frozen paramclasses with host-side precompute."""

from .common import (
    AirProperties,
    Microphysics0MParams,
    Parameters0M,
    WaterProperties,
    microphysics_0m_params,
)
from .terminal_velocity import (
    Blk1MVelType,
    Blk1MVelTypeRain,
    Blk1MVelTypeSnow,
    Chen2022VelType,
    Chen2022VelTypeLargeIce,
    Chen2022VelTypeRain,
    Chen2022VelTypeSmallIce,
    SB2006VelType,
    StokesRegimeVelType,
    TerminalVelocityParams,
    blk1m_vel_type,
    chen2022_vel_type,
    terminal_velocity_params,
)
from .thermodynamics import ThermodynamicsParameters
from . import aerosol, aerosol_species, config, ice_nucleation, m1, m2, modal_nucleation, p3
from .ice_nucleation import Frostenberg2023, ice_nucleation_parameters
from .m1 import Microphysics1MParams, microphysics_1m_params
from .m2 import Microphysics2MParams, microphysics_2m_params, sb2006
from .modal_nucleation import (
    H2SO4NucleationParameters,
    MixedNucleationParameters,
    OrganicNucleationParameters,
)
from .p3 import P3IceParams, ParametersP3, p3_ice_params, parameters_p3
from .config import (
    aerosol_activation_params_from_overrides,
    calibrated_overrides,
    calibrated_toml_path,
    load_toml_overrides,
    microphysics_1m_params_from_overrides,
    microphysics_2m_params_from_overrides,
    sb2006_from_overrides,
)
