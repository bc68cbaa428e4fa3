"""Aerosol-formation nucleation tests, ported from
/root/reference/test/nucleation_unit_tests.jl (golden values, rtol 1e-5)."""

import jax.numpy as jnp
import numpy as np

from cloudmicrophysics_tpu.ops import nucleation as NUC
from cloudmicrophysics_tpu.parameters.modal_nucleation import (
    H2SO4NucleationParameters,
    MixedNucleationParameters,
    OrganicNucleationParameters,
)

F = jnp.float64


def test_h2so4_binary_neutral_golden():
    params = H2SO4NucleationParameters()
    concentrations = 10 ** np.arange(6, 9.01, 0.5)
    rates = [0.004530231195176104, 0.4299078411040382, 40.79720082267248,
             3871.5544026624943, 367401.0272892414, 3.4865457336815596e7,
             3.308646478955847e9]
    for c, r in zip(concentrations, rates):
        b, t = NUC.h2so4_nucleation_rate(
            F(c * 1e6), F(0.0), F(0.0), F(208.0), params)
        np.testing.assert_allclose((float(b) + float(t)) * 1e-6, r,
                                   rtol=1e-5)


def test_organic_golden():
    params = OrganicNucleationParameters()
    concentrations = 10 ** np.arange(6, 8.51, 0.5)
    rates = [7.778131746328608e-6, 0.0024180450482058588, 0.0400097,
             0.35954428147126755, 2.944798579681883, 24.176443961969532]
    for c, r in zip(concentrations, rates):
        out = NUC.organic_nucleation_rate_hom_prescribed(F(0.0), F(c), params)
        np.testing.assert_allclose(float(out) * 1e-6, r, rtol=1e-5)


def test_mixed_golden():
    params = MixedNucleationParameters()
    concentrations = 10 ** np.arange(5.8, 8.51, 0.25)
    rates = [0.00697371914560178, 0.012401221168017876, 0.022052836262425032,
             0.03921610465843014, 0.06973719145601781, 0.12401221168017874,
             0.22052836262425027, 0.39216104658430134, 0.697371914560178,
             1.24012211680179, 2.2052836262425073]
    for c, r in zip(concentrations, rates):
        out = NUC.organic_and_h2so4_nucleation_rate_bioOxOrg_prescribed(
            F(2.6e6), F(c), params)
        np.testing.assert_allclose(float(out) * 1e6, r, rtol=1e-5)


def test_apparent_nucleation_rate():
    # Lehtinen 2007: apparent rate at larger diameter is reduced
    J = NUC.apparent_nucleation_rate(
        F(10.0), F(100.0), F(2.0), F(1e-4), F(5e-4))
    assert 0 < float(J) < 100.0


def test_monoterpene_pathways_finite():
    org = OrganicNucleationParameters()
    mix = MixedNucleationParameters()
    r1 = NUC.organic_nucleation_rate(
        F(1e6), F(1e15), F(1e18), F(1e12), F(288.0), F(1e-3), org)
    r2 = NUC.organic_and_h2so4_nucleation_rate(
        F(1e12), F(1e15), F(1e12), F(288.0), F(1e-3), mix)
    assert np.isfinite(float(r1)) and float(r1) >= 0
    assert np.isfinite(float(r2)) and float(r2) >= 0
