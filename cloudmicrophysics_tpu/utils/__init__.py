"""Numerics utilities (L0): special functions, quadrature, distributions,
parameter-struct machinery."""

from . import distributions, param, quadrature, special
from .param import paramclass, replace, static_field
from .special import (
    clamp_to_nonneg,
    eps_numerics,
    eps_numerics_2M_M,
    eps_numerics_2M_N,
    eps_numerics_P3_B,
    fac,
    float_dtype,
    gamma_inc,
    gamma_inc_inv,
    logsumexp,
    regularised_ratio,
    rime_density,
    rime_mass_fraction,
    sgs_weight_function,
)
from .quadrature import (
    ChebyshevGauss,
    GaussLegendre,
    build_quadrature,
    default_quadrature,
    integrate,
    integrate_segments,
)
from .show import field_units, show_params
from .artifacts import AIDA_ice_nucleation, ArtifactMissingError, artifacts_dir
