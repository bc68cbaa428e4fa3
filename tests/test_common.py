"""Common helpers, distribution tools, quadrature, and ventilation
(reference test/common_functions_tests.jl, test/DistributionTools_tests.jl,
test/ventilation_tests.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.ops import common as CO
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.parameters import (
    AirProperties, ThermodynamicsParameters, chen2022_vel_type,
    parameters_p3)
from cloudmicrophysics_tpu.parameters.aerosol_species import (
    H2SO4SolutionParameters)
from cloudmicrophysics_tpu.utils import distributions as DT
from cloudmicrophysics_tpu.utils.quadrature import (
    ChebyshevGauss, GaussLegendre, build_quadrature, integrate,
    integrate_segments)


class TestLogisticFunctions:
    """reference test/common_functions_tests.jl:9-30"""

    def test_logistic_function(self):
        assert CO.logistic_function(-1.0, 1.0, 2.0) == 0.0
        assert CO.logistic_function(0.0, 1.0, 2.0) == 0.0
        assert CO.logistic_function(1.0, 1.0, 2.0) == 0.5
        assert np.isclose(CO.logistic_function(2.0, 1.0, 2.0), 0.9525,
                          atol=1e-4)
        assert CO.logistic_function(1.0, 0.0, 2.0) == 1.0
        assert CO.logistic_function(0.0, 0.0, 2.0) == 0.0

    def test_logistic_function_integral(self):
        assert CO.logistic_function_integral(-1.0, 1.0, 2.0) == 0.0
        assert CO.logistic_function_integral(0.0, 1.0, 2.0) == 0.0
        assert np.isclose(CO.logistic_function_integral(1.0, 1.0, 2.0),
                          0.3115, atol=1e-4)
        assert np.isclose(CO.logistic_function_integral(3.0, 1.0, 2.0),
                          2.0, atol=1e-2)
        assert CO.logistic_function_integral(1.0, 0.0, 2.0) == 1.0
        assert CO.logistic_function_integral(0.0, 0.0, 2.0) == 0.0


class TestWaterActivity:
    """reference test/common_functions_tests.jl:32-118"""

    def test_h2so4_vapor_pressure_monotone_in_T(self, dtype):
        prs = H2SO4SolutionParameters()
        x = jnp.asarray(0.1, dtype)
        p_warm = CO.H2SO4_soln_saturation_vapor_pressure(
            prs, x, jnp.asarray(225.0, dtype))
        p_cold = CO.H2SO4_soln_saturation_vapor_pressure(
            prs, x, jnp.asarray(200.0, dtype))
        assert p_warm > p_cold

    def test_a_w_xT(self, dtype):
        tps = ThermodynamicsParameters()
        prs = H2SO4SolutionParameters()
        T_warm, T_cold = jnp.asarray(229.2, dtype), jnp.asarray(228.8, dtype)
        for x in (0.1, 0.06):
            x = jnp.asarray(x, dtype)
            assert CO.a_w_xT(prs, tps, x, T_cold) < CO.a_w_xT(
                prs, tps, x, T_warm)
        for T in (T_warm, T_cold):
            assert CO.a_w_xT(prs, tps, jnp.asarray(0.1, dtype), T) \
                < CO.a_w_xT(prs, tps, jnp.asarray(0.06, dtype), T)

    def test_a_w_eT(self, dtype):
        tps = ThermodynamicsParameters()
        e_high, e_low = jnp.asarray(1088.0, dtype), jnp.asarray(544.0, dtype)
        T_warm, T_cold = jnp.asarray(285.0, dtype), jnp.asarray(251.0, dtype)
        assert CO.a_w_eT(tps, e_low, T_cold) > CO.a_w_eT(tps, e_high, T_warm)
        for T in (T_warm, T_cold):
            assert CO.a_w_eT(tps, e_low, T) < CO.a_w_eT(tps, e_high, T)

    def test_a_w_ice_monotone(self, dtype):
        tps = ThermodynamicsParameters()
        assert CO.a_w_ice(tps, jnp.asarray(230.0, dtype)) \
            < CO.a_w_ice(tps, jnp.asarray(240.0, dtype))


class TestChenCoefficients:
    """Golden values at rho_a = 1.2 (reference
    test/common_functions_tests.jl:120-180)."""

    def test_rain_b1(self, dtype):
        vel = chen2022_vel_type()
        rho = jnp.asarray(1.2, dtype)
        aiu, bi, ciu = CO.chen2022_vel_coeffs_rain(vel.rain, rho)
        tol = 10 * float(jnp.finfo(dtype).eps)
        np.testing.assert_allclose(
            np.asarray(aiu, np.float64),
            [286768.02047954104, -1.6916433443360287e6, 9843.240767655458],
            rtol=max(tol, 1e-6))
        np.testing.assert_allclose(
            np.asarray(bi, np.float64), [2.249342, 2.249342, 1.098942],
            rtol=max(tol, 1e-6))
        np.testing.assert_allclose(
            np.asarray(ciu, np.float64), [0.0, 184.325, 184.325],
            rtol=max(tol, 1e-6))

    def test_small_ice_b2(self, dtype):
        vel = chen2022_vel_type()
        rho = jnp.asarray(1.2, dtype)
        aiu, bi, ciu = CO.chen2022_vel_coeffs_small_ice(
            vel.small_ice, rho, jnp.asarray(500.0, dtype))
        np.testing.assert_allclose(
            np.asarray(aiu, np.float64),
            [312.9777159510928, -316.5335670126842], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bi, np.float64),
            [0.7295470725655279, 0.7295470725655279], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ciu, np.float64), [0.0, 4715.089121981011], rtol=1e-5)

    def test_large_ice_b4(self, dtype):
        vel = chen2022_vel_type()
        rho = jnp.asarray(1.2, dtype)
        aiu, bi, ciu = CO.chen2022_vel_coeffs_large_ice(
            vel.large_ice, rho, jnp.asarray(100.0, dtype))
        np.testing.assert_allclose(
            np.asarray(aiu, np.float64),
            [51.86069839334009, -1.394567234046072], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(bi, np.float64),
            [0.5655671081749194, 0.18155881980108224], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ciu, np.float64), [0.0, 34.820462392120504],
            rtol=1e-5)


def test_volume_sphere(dtype):
    R = jnp.asarray(4.0, dtype)
    D = 2 * R
    assert np.isclose(CO.volume_sphere_D(D), np.pi * float(D)**3 / 6)
    assert np.isclose(CO.volume_sphere_R(R), np.pi * (2 * float(R))**3 / 6)


def test_ventilation_factor_p3_smoke(dtype):
    """reference test/ventilation_tests.jl:8-29 smoke values"""
    params = parameters_p3()
    vel = chen2022_vel_type()
    aps = AirProperties()
    state = P3.p3_state(params, jnp.asarray(0.22, dtype),
                        jnp.asarray(1e6, dtype), jnp.asarray(0.5, dtype),
                        jnp.asarray(500.0, dtype))
    v_term = P3.ice_particle_terminal_velocity(vel, jnp.asarray(1.2, dtype),
                                               state)
    Ds = jnp.linspace(0.5e-4, 4.5e-4, 5).astype(dtype)
    vents = CO.ventilation_factor(params.vent, aps, v_term(Ds), Ds)
    np.testing.assert_allclose(
        np.asarray(vents, np.float64),
        [0.91818553, 1.3007127, 1.7451854, 2.1598392, 2.3396184],
        # rtol 1e-5 (reference uses 1e-6 @ f64): the Chen2022 Table B3 E/F
        # pair here is calibrated against reference regressions to ~1e-6
        rtol=1e-5)


class TestDistributionTools:
    """reference test/DistributionTools_tests.jl"""

    def test_generalized_gamma_roundtrip(self):
        nu, mu, B = 2.0, 3.0, 2.0
        for Y in (0.1, 0.25, 0.5, 0.75, 0.9):
            x = DT.generalized_gamma_quantile(nu, mu, B, Y)
            p = DT.generalized_gamma_cdf(nu, mu, B, x)
            assert np.isclose(float(p), Y, rtol=1e-8)

    def test_generalized_gamma_edges(self):
        assert DT.generalized_gamma_cdf(2.0, 3.0, 2.0, 0.0) == 0.0
        assert DT.generalized_gamma_cdf(2.0, 3.0, 2.0, -1.0) == 0.0

    def test_exponential_roundtrip(self):
        D_mean = 2.0
        for Y in (0.1, 0.25, 0.5, 0.75, 0.9):
            D = DT.exponential_quantile(D_mean, Y)
            p = DT.exponential_cdf(D_mean, D)
            assert np.isclose(float(p), Y, rtol=1e-10)

    def test_exponential_edges(self):
        assert DT.exponential_cdf(2.0, 0.0) == 0.0
        assert DT.exponential_cdf(2.0, -1.0) == 0.0
        assert np.isclose(float(DT.exponential_cdf(2.0, np.inf)), 1.0)

    def test_moments_vs_numeric(self):
        # M^n of the exponential PSD: N * D_mean^n * n!
        from math import factorial
        for n in (0, 1, 2, 3):
            m = DT.exponential_moment(2.0, 5.0, n)
            assert np.isclose(float(m), 5.0 * 2.0**n * factorial(n),
                              rtol=1e-12)


class TestQuadrature:
    """integrate() vs closed forms (reference src/Quadrature.jl usage;
    budgets in test/performance_tests.jl:189)."""

    def test_chebyshev_gauss_polynomial(self):
        quad = ChebyshevGauss(100)
        val = integrate(lambda x: x**4, 0.0, 2.0, quad)
        assert np.isclose(float(val), 2.0**5 / 5, rtol=1e-3)

    def test_gauss_legendre_exact_polynomials(self):
        quad = GaussLegendre(16)
        # GL(16) integrates polynomials up to degree 31 exactly
        val = integrate(lambda x: 7 * x**6 - x**3 + 2, 0.0, 3.0, quad)
        exact = 3.0**7 - 3.0**4 / 4 + 2 * 3.0
        assert np.isclose(float(val), exact, rtol=1e-12)

    def test_exponential_segments(self):
        quad = GaussLegendre(32)
        val = integrate_segments(lambda x: jnp.exp(-x),
                                 (0.0, 1.0, 3.0, 10.0), quad)
        assert np.isclose(float(val), 1 - np.exp(-10.0), rtol=1e-10)

    def test_build_quadrature_orders(self):
        for order in (16, 32, 40, 64):
            q = build_quadrature(order)
            val = integrate(lambda x: jnp.sin(x), 0.0, np.pi, q)
            assert np.isclose(float(val), 2.0, rtol=1e-8)
