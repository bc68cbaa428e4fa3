"""Combinatorial smoke test over the 13-slot 1M option selection
(reference src/parameters/Microphysics1MOptions.jl:257-287): every
alternative value of every slot must build, jit, and produce finite
tendencies — the XLA analog of the reference's per-singleton dispatch
compiling for every option type."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_1m
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters,
    microphysics_1m_params,
)

TPS = ThermodynamicsParameters()

# slot -> alternative (non-default) values; None disables the process
ALTERNATIVES = {
    "cloud_liquid_formation": [None],
    "cloud_ice_formation": ["TemperatureDependent", None],
    "cloud_ice_melt": [None],
    "rain_autoconversion": ["PrescribedNd", None],
    "snow_autoconversion": ["WithSupersaturation", None],
    "rain_condensation_evaporation": [None],
    "snow_deposition_sublimation": ["SublimationOnly", None],
    "snow_melt": [None],
    "cloud_liquid_rain_accretion": [None],
    "cloud_liquid_snow_accretion": [None],
    "cloud_ice_rain_accretion": [None],
    "cloud_ice_snow_accretion": [None],
    "rain_snow_accretion": [None],
}


def _finite_tendencies(mp):
    F = jnp.float64
    out = jax.jit(
        lambda: bulk_tendencies_1m(mp, TPS, F(1.1), F(272.0), F(6e-3),
                                   F(1e-3), F(2e-4), F(5e-4), F(2e-4)))()
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    return out


@pytest.mark.parametrize(
    "slot,value",
    [(s, v) for s, vals in ALTERNATIVES.items() for v in vals])
def test_each_option_variant(slot, value):
    mp = microphysics_1m_params(**{slot: value})
    out = _finite_tendencies(mp)
    if value is None:
        # disabling a process must not disable everything
        total = sum(float(jnp.abs(v)) for v in jax.tree_util.tree_leaves(out))
        assert total > 0


def test_all_disabled_is_all_zero():
    mp = microphysics_1m_params(**{s: None for s in ALTERNATIVES})
    out = _finite_tendencies(mp)
    for v in jax.tree_util.tree_leaves(out):
        assert float(jnp.abs(v)) == 0.0
