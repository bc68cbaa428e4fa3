"""AD compatibility of the pointwise 2M+P3 path (reference
test/ad_compat_tests.jl).

The fused ``bulk_tendencies_2m`` must be differentiable w.r.t. the 8
prognostic species with ``log lambda`` held fixed (the substepping
semantics — reference test/ad_compat_tests.jl:16-19). Differentiating
*through* the shape solve is out of scope, exactly as in the reference
(it would need a ``d/da`` rule for the forward incomplete gamma).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.ops import m2 as CM2
from cloudmicrophysics_tpu.ops.common import (
    chen2022_vel_coeffs_large_ice,
    chen2022_vel_coeffs_rain,
    chen2022_vel_coeffs_small_ice,
    chen2022_velocity_sum,
)
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters, microphysics_2m_params)


@pytest.fixture(scope="module")
def mp():
    return microphysics_2m_params(with_ice=True, is_limited=True)


@pytest.fixture(scope="module")
def tps():
    return ThermodynamicsParameters()


class TestP3StateDuals:
    """reference test/ad_compat_tests.jl:27-46"""

    def test_primal_unchanged_and_seeding(self, mp, dtype):
        p3 = mp.ice.scheme
        dt = jnp.dtype(dtype)
        args = tuple(jnp.asarray(v, dt) for v in (1e-4, 1e4, 2e-5, 4e-8))

        def fields(rho_q_ice, rho_n_ice, rho_q_rim, rho_b_rim):
            st = P3.state_from_prognostic(
                p3, rho_q_ice, rho_n_ice, rho_q_rim, rho_b_rim)
            return st.rho_g, st.D_gr, st.D_cr, st.D_th

        primal = fields(*args)
        # jvp primal must equal the plain evaluation bit-for-bit
        out, tangents = jax.jvp(
            fields, args,
            (jnp.ones_like(args[0]),) + tuple(jnp.zeros_like(a)
                                              for a in args[1:]))
        for a, b in zip(out, primal):
            assert a == b
        d_rho_g, d_D_gr, d_D_cr, d_D_th = tangents
        # params-only threshold is a true constant; rime-derived fields
        # carry sensitivity to rho_q_ice (via F_rim = q_rim/q_ice)
        assert d_D_th == 0
        assert d_rho_g != 0 and jnp.isfinite(d_rho_g)
        assert d_D_cr != 0 and jnp.isfinite(d_D_cr)

    def test_unrimed_branch_under_jvp(self, mp, dtype):
        p3 = mp.ice.scheme
        dt = jnp.dtype(dtype)
        args = tuple(jnp.asarray(v, dt) for v in (1e-4, 1e4, 0.0, 0.0))

        def fields(*a):
            st = P3.state_from_prognostic(p3, *a)
            return st.D_gr, st.D_cr

        out, _ = jax.jvp(fields, args,
                         (jnp.ones_like(args[0]),) + tuple(
                             jnp.zeros_like(a) for a in args[1:]))
        assert out[0] == jnp.inf and out[1] == jnp.inf


class TestRegularisedRatioGrads:
    """NaN-free partials across tiny denominators
    (reference test/ad_compat_tests.jl:48-66: below ~eps/4 the
    sgs_weight_function sigmoid hits atanh(-1) — value 0 either way,
    but naive partials were NaN)."""

    def test_tiny_denominators(self, mp, dtype):
        p3 = mp.ice.scheme
        dt = jnp.dtype(dtype)
        eps = float(jnp.finfo(dt).eps)
        for denom in (eps**2, eps / 8, eps, eps**0.5, 1e-9):
            args = tuple(jnp.asarray(v, dt)
                         for v in (denom, 10.0, denom / 10, denom / 10))

            def fields(rho_q_ice, rho_n_ice, rho_q_rim, rho_b_rim):
                st = P3.state_from_prognostic(
                    p3, rho_q_ice, rho_n_ice, rho_q_rim, rho_b_rim)
                return st.F_rim, st.rho_rim, st.rho_g, st.D_gr, st.D_cr

            seeds = (jnp.ones_like(args[0]), jnp.zeros_like(args[1]),
                     jnp.ones_like(args[2]), jnp.ones_like(args[3]))
            out, tangents = jax.jvp(fields, args, seeds)
            # the regularised ratios must always be differentiable
            assert jnp.isfinite(tangents[0]), f"dF_rim NaN at denom={denom}"
            assert jnp.isfinite(tangents[1]), f"drho_rim NaN at denom={denom}"
            # cached thresholds need finite partials only where their value is
            for val, tan in zip(out[2:], tangents[2:]):
                if jnp.isfinite(val):
                    assert jnp.isfinite(tan)


class TestMixedArgumentPromotion:
    """reference test/ad_compat_tests.jl:68-104"""

    def test_gamma_incl_mixed(self, dtype):
        dt = jnp.dtype(dtype)
        g, dg = jax.jvp(lambda x: CM2.gamma_incl_approx(jnp.asarray(-0.25, dt), x),
                        (jnp.asarray(0.5, dt),), (jnp.asarray(1.0, dt),))
        assert jnp.isfinite(g) and jnp.isfinite(dg)
        assert np.allclose(
            g, CM2.gamma_incl_approx(jnp.asarray(-0.25, dt),
                                     jnp.asarray(0.5, dt)))

    def test_rain_evaporation_both_branches(self, mp, tps, dtype):
        sb = mp.warm_rain.seifert_beheng
        aps = mp.warm_rain.air_properties
        dt = jnp.dtype(dtype)
        # subsaturated (main path) and supersaturated (early return)
        for q_tot in (0.005, 0.02):
            def f(q_rai, n_rai):
                ev = CM2.rain_evaporation(
                    sb, aps, tps, jnp.asarray(q_tot, dt),
                    jnp.asarray(2e-4, dt), jnp.zeros((), dt), q_rai,
                    jnp.zeros((), dt), jnp.asarray(1.05, dt), n_rai,
                    jnp.asarray(288.0, dt))
                return tuple(ev)

            args = (jnp.asarray(1e-4, dt), jnp.asarray(4e4, dt))
            out, tangents = jax.jvp(f, args, tuple(jnp.ones_like(a)
                                                   for a in args))
            for v, t in zip(out, tangents):
                assert jnp.isfinite(v) and jnp.isfinite(t)

    def test_terminal_velocity_dual_air_density(self, mp, dtype):
        vel = mp.ice.terminal_velocity
        dt = jnp.dtype(dtype)
        D = jnp.asarray(1e-3, dt)
        rho_i = jnp.asarray(916.7, dt)
        for fn in (
            lambda r: chen2022_velocity_sum(
                *chen2022_vel_coeffs_rain(vel.rain, r), D),
            lambda r: chen2022_velocity_sum(
                *chen2022_vel_coeffs_small_ice(vel.small_ice, r, rho_i), D),
            lambda r: chen2022_velocity_sum(
                *chen2022_vel_coeffs_large_ice(vel.large_ice, r, rho_i), D),
        ):
            v, dv = jax.jvp(fn, (jnp.asarray(1.2, dt),),
                            (jnp.asarray(1.0, dt),))
            assert jnp.isfinite(v) and jnp.isfinite(dv)


# x = [q_lcl, n_lcl, q_rai, n_rai, q_ice, n_ice, q_rim, b_rim]; interior
# states per regime (reference test/ad_compat_tests.jl:115-127)
REGIMES = {
    "warm rain": dict(rho=1.05, T=288.0, q_tot=0.015,
                      x=[4e-4, 8e7, 2.1e-3, 5e4, 0, 0, 0, 0],
                      loglam=-np.inf),
    "mixed phase": dict(rho=0.78, T=273.5, q_tot=0.009,
                        x=[2e-4, 5e7, 1e-4, 4e4, 1e-4, 2e5, 4e-5, 6e-8],
                        loglam=None),
    "ice heavy": dict(rho=0.45, T=233.0, q_tot=0.003,
                      x=[1e-6, 1e6, 1e-12, 1e-2, 8e-4, 5e5, 5e-4, 9e-7],
                      loglam=None),
    # sub-threshold ice with b_rim in the regularised-ratio band that
    # previously produced NaN partials via sgs_weight_function
    "cloud edge": dict(rho=0.7, T=263.0, q_tot=0.005,
                       x=[1e-5, 1e7, 1e-6, 1e3, 3e-8, 30, 1e-8, 2.5e-11],
                       loglam=None),
}


def _rhs(mp, tps, rho, T, q_tot, loglam):
    def f(x):
        t = bulk_tendencies_2m(
            mp, tps, rho, T, q_tot, x[0], x[1], x[2], x[3], x[4], x[5],
            x[6], x[7], loglam)
        return jnp.stack(tuple(t))
    return f


def _consistent_loglam(mp, rho, x):
    return P3.get_distribution_loglambda_from_prognostic(
        mp.ice.scheme, rho * x[4], rho * x[5], rho * x[6], rho * x[7])


class TestBMTJacobian:
    """Jacobian of the full 2M+P3 fused tendencies w.r.t. the 8 species
    (reference test/ad_compat_tests.jl:106-183)."""

    # float64 rows ride in the slow tier: the finiteness contract is
    # structural (eps gates, where-sanitization), already exercised at
    # float32, and each f64 regime recompiles the full fused Jacobian
    @pytest.mark.parametrize("regime", list(REGIMES))
    @pytest.mark.parametrize(
        "jac_dtype",
        ["float32", pytest.param("float64", marks=pytest.mark.slow)])
    def test_finite_jacobian(self, mp, tps, regime, jac_dtype):
        dt = jnp.dtype(jac_dtype)
        r = REGIMES[regime]
        x = jnp.asarray(r["x"], dt)
        loglam = (jnp.asarray(r["loglam"], dt) if r["loglam"] is not None
                  else _consistent_loglam(mp, jnp.asarray(r["rho"], dt), x))
        f = _rhs(mp, tps, jnp.asarray(r["rho"], dt), jnp.asarray(r["T"], dt),
                 jnp.asarray(r["q_tot"], dt), loglam)
        v0 = f(x)
        J = jax.jacfwd(f)(x)
        assert jnp.all(jnp.isfinite(v0)), f"{regime}: primal not finite"
        assert jnp.all(jnp.isfinite(J)), f"{regime}: Jacobian not finite"
        # differentiation does not perturb the primal
        assert jnp.array_equal(f(x), v0)

    @pytest.mark.slow
    def test_jacobian_vs_finite_differences(self, mp, tps):
        """float64 only — FD truncation in float32 is not meaningful.
        Slow tier per this file's f64 policy (compiling the full fused
        f64 Jacobian is the single heaviest compile of the suite)."""
        r = REGIMES["mixed phase"]
        dt = jnp.float64
        x = jnp.asarray(r["x"], dt)
        loglam = _consistent_loglam(mp, jnp.asarray(r["rho"], dt), x)
        f = jax.jit(_rhs(mp, tps, jnp.asarray(r["rho"], dt),
                         jnp.asarray(r["T"], dt),
                         jnp.asarray(r["q_tot"], dt), loglam))
        J = np.asarray(jax.jacfwd(f)(x))
        J_fd = np.empty_like(J)
        xn = np.asarray(x)
        for j in range(8):
            h = 1e-6 * xn[j]
            xp, xm = xn.copy(), xn.copy()
            xp[j] += h
            xm[j] -= h
            J_fd[:, j] = (np.asarray(f(jnp.asarray(xp)))
                          - np.asarray(f(jnp.asarray(xm)))) / (2 * h)
        # per-row scales: number rows dwarf mass rows by ~10 orders of
        # magnitude; a global scale would leave the mass rows unconstrained
        for i in range(8):
            scale = max(np.abs(J[i]).max(), np.abs(J_fd[i]).max())
            if scale == 0:
                continue
            assert np.abs(J[i] - J_fd[i]).max() / scale < 1e-5, f"row {i}"

    @pytest.mark.slow
    def test_zero_rain_boundary(self, mp, tps):
        """SB2006 autoconversion Phi_au(tau) ~ tau^0.7 has a vertical tangent
        at exactly zero rain with cloud present; the eps-gate keeps the
        Jacobian finite (reference test/ad_compat_tests.jl:176-182).
        Slow tier per this file's f64 policy (the f32 finite-Jacobian
        rows cover the eps-gate structure in the default tier)."""
        dt = jnp.float64
        x = jnp.asarray([1e-6, 1e6, 0, 0, 8e-4, 5e5, 5e-4, 9e-7], dt)
        loglam = _consistent_loglam(mp, jnp.asarray(0.45, dt), x)
        f = _rhs(mp, tps, jnp.asarray(0.45, dt), jnp.asarray(233.0, dt),
                 jnp.asarray(0.003, dt), loglam)
        assert jnp.all(jnp.isfinite(f(x)))
        assert jnp.all(jnp.isfinite(jax.jacfwd(f)(x)))


def test_loglambda_from_prognostic(mp, dtype):
    """reference test/ad_compat_tests.jl:178-186"""
    dt = jnp.dtype(dtype)
    p3 = mp.ice.scheme
    args = tuple(jnp.asarray(v, dt) for v in (1e-4, 1e4, 2e-5, 4e-8))
    ll = P3.get_distribution_loglambda_from_prognostic(p3, *args)
    st = P3.state_from_prognostic(p3, *args)
    assert jnp.isfinite(ll)
    assert ll == P3.get_distribution_loglambda(st)
