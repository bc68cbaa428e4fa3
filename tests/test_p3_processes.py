"""P3 processes + 2M+P3 BMT tests.

Mirrors the reference's P3 process smoke/convergence tests
(/root/reference/test/p3_tests.jl collision sections,
bulk_tendencies_tests.jl and bulk_tendencies_quadrature_tests.jl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.ops import p3_processes as P3P
from cloudmicrophysics_tpu.parameters import (
    AirProperties,
    ThermodynamicsParameters,
    chen2022_vel_type,
)
from cloudmicrophysics_tpu.parameters.aerosol_species import Illite
from cloudmicrophysics_tpu.parameters.m2 import (
    RainParticlePDF_SB2006,
    cloud_pdf_sb2006,
    microphysics_2m_params,
)
from cloudmicrophysics_tpu.parameters.p3 import parameters_p3
from cloudmicrophysics_tpu.utils.quadrature import GaussLegendre

TPS = ThermodynamicsParameters()
APS = AirProperties()
CHEN = chen2022_vel_type()
PARAMS = parameters_p3()
PDF_C = cloud_pdf_sb2006()
PDF_R = RainParticlePDF_SB2006()
F = jnp.float64

RHO_A = 1.1


@jax.jit
def _make_state(L_ice, N_ice, F_rim, rho_rim):
    st = P3.p3_state(PARAMS, L_ice, N_ice, F_rim, rho_rim)
    loglam = P3.get_distribution_loglambda(st)
    return st, loglam


def make_state(L_ice=1e-3, N_ice=1e5, F_rim=0.4, rho_rim=400.0):
    return _make_state(F(L_ice), F(N_ice), F(F_rim), F(rho_rim))


# jitted wrappers so the heavy quadrature integrals compile once (and hit
# the persistent compilation cache on repeat runs) instead of dispatching
# eagerly op-by-op
_ice_melt = jax.jit(P3P.ice_melt, static_argnames=("quad",))
_ice_self_collection = jax.jit(P3P.ice_self_collection,
                               static_argnames=("quad", "inner"))
_collision_sources = jax.jit(P3P.bulk_liquid_ice_collision_sources,
                             static_argnames=("quad", "rain_inner"))


class TestGammaLadders:
    def test_matches_direct_moments(self):
        # the two-sided ladder must reproduce gamma_inc_moment composition
        # (the reference's moment-by-moment flux evaluation,
        # src/P3_processes.jl:344-415) for consecutive exponents
        from cloudmicrophysics_tpu.ops.p3_processes import (
            _endpoint_ladders,
            _moments_from_ladders,
        )

        rng = np.random.default_rng(3)
        nn = 256
        alpha = jnp.asarray(10 ** rng.uniform(2, 5, nn))
        D1 = jnp.asarray(10 ** rng.uniform(-6, -3.2, nn))
        D2 = D1 * jnp.asarray(10 ** rng.uniform(0.1, 2, nn))
        for z0 in (1.0, 2.65):
            tiny = jnp.finfo(jnp.float64).tiny
            a_s = jnp.maximum(alpha, tiny)
            l1 = _endpoint_ladders(z0, a_s, D1)
            l2 = _endpoint_ladders(z0, a_s, D2)
            J = _moments_from_ladders(z0, alpha, a_s, l1, l2, D1, D2)
            for m in range(6):
                direct = P3.gamma_inc_moment(D1, D2, z0 - 1 + m, alpha)
                np.testing.assert_allclose(
                    np.asarray(J[m]), np.asarray(direct), rtol=5e-11,
                    err_msg=f"z0={z0} m={m}")


class TestHetNucleation:
    def test_rates(self):
        dN, dL = P3P.het_ice_nucleation(
            Illite(), TPS, F(1e-4), F(1e8), F(1.0), F(251.0), F(RHO_A))
        assert float(dN) > 0 and float(dL) > 0
        # colder -> faster
        dN2, _ = P3P.het_ice_nucleation(
            Illite(), TPS, F(1e-4), F(1e8), F(1.0), F(245.0), F(RHO_A))
        assert float(dN2) > float(dN)


class TestIceMelt:
    def test_melt_above_freezing(self):
        st, loglam = make_state()
        dN, dL = _ice_melt(CHEN, APS, TPS, F(275.0), F(RHO_A), st, loglam,
                              quad=GaussLegendre(40))
        assert float(dL) > 0 and float(dN) > 0
        # below freezing: clamped to zero (no fusion)
        dN0, dL0 = _ice_melt(CHEN, APS, TPS, F(270.0), F(RHO_A), st,
                                loglam, quad=GaussLegendre(40))
        assert float(dL0) == 0 and float(dN0) == 0
        # warmer -> faster melt
        dN2, dL2 = _ice_melt(CHEN, APS, TPS, F(278.0), F(RHO_A), st,
                                loglam, quad=GaussLegendre(40))
        assert float(dL2) > float(dL)


class TestMaxFreezeRate:
    def test_musil(self):
        st, _ = make_state()
        f = P3P.compute_max_freeze_rate(APS, TPS, CHEN, F(RHO_A), F(260.0),
                                        st)
        r = float(f(F(1e-3)))
        assert r > 0
        # above freezing: zero
        f_warm = P3P.compute_max_freeze_rate(APS, TPS, CHEN, F(RHO_A),
                                             F(280.0), st)
        assert float(f_warm(F(1e-3))) == 0
        # very cold regime: floatmax guard (f_frz -> 1)
        f_cold = P3P.compute_max_freeze_rate(APS, TPS, CHEN, F(RHO_A),
                                             F(180.0), st)
        assert float(f_cold(F(1e-3))) > 1e30


class TestLocalRimeDensity:
    def test_range(self):
        st, _ = make_state()
        rho_fn = P3P.compute_local_rime_density(CHEN, F(RHO_A), F(263.0), st)
        vals = [float(rho_fn(F(1e-3), F(D))) for D in (1e-5, 1e-4, 1e-3)]
        for v in vals:
            assert 50.0 <= v <= 916.7 + 1e-6


class TestCollisions:
    ARGS = dict(L_c=1e-3 * RHO_A, N_c=1e8, L_r=1e-4 * RHO_A, N_r=1e4)

    def _sources(self, T, quad=GaussLegendre(16), **kw):
        args = {**self.ARGS, **kw}
        st, loglam = make_state()
        return _collision_sources(
            st, loglam, PDF_C, PDF_R, F(args["L_c"]), F(args["N_c"]),
            F(args["L_r"]), F(args["N_r"]), APS, TPS, CHEN, F(RHO_A), F(T),
            quad=quad)

    def test_cold_collisions_freeze(self):
        # below freezing: liquid is collected and freezes -> rime grows
        s = self._sources(260.0)
        assert float(s.dq_c) < 0          # cloud collected
        assert float(s.dN_c) < 0
        assert float(s.dL_ice) > 0        # ice mass grows
        assert float(s.dL_rim) > 0        # rime grows
        assert float(s.dB_rim) > 0
        for v in s:
            assert np.isfinite(float(v))

    def test_mass_conservation(self):
        # collected liquid mass = frozen + shed; frozen goes to ice
        s = self._sources(260.0)
        collected = -(float(s.dq_c) + float(s.dq_r)) * RHO_A
        np.testing.assert_allclose(collected, float(s.dL_ice), rtol=1e-6)

    def test_quadrature_convergence(self):
        # higher order quadrature converges (reference
        # bulk_tendencies_quadrature_tests ladder)
        s16 = self._sources(260.0, quad=GaussLegendre(16))
        s40 = self._sources(260.0, quad=GaussLegendre(40))
        s64 = self._sources(260.0, quad=GaussLegendre(64))
        for v16, v40, v64 in zip(s16, s40, s64):
            if abs(float(v64)) > 1e-18:
                e16 = abs(float(v16) - float(v64)) / abs(float(v64))
                e40 = abs(float(v40) - float(v64)) / abs(float(v64))
                # monotone refinement above the kink-noise floor: the
                # un-split |v_i - v_l| rain inner leaves an ~1e-4
                # node-placement residual that does not shrink
                # monotonically (both orders are already ~50x inside the
                # ladder gate down there)
                assert e40 <= max(e16, 5e-4)
                assert e40 < 5e-2

    def test_zero_liquid(self):
        s = self._sources(260.0, L_c=0.0, N_c=0.0, L_r=0.0, N_r=0.0)
        for v in s:
            np.testing.assert_allclose(float(v), 0.0, atol=1e-20)

    @pytest.mark.parametrize("T", [260.0, 271.0])
    def test_rain_inner_split_matches_closed_form(self, T):
        # the kink-split quadrature must reproduce the reference's
        # closed-form incomplete-gamma flux sums
        # (src/P3_processes.jl:326-427) — same integral, two evaluation
        # strategies. dB_rim is compared loosely: the closed-form path
        # integrates the rime-volume integrand over the UNSPLIT rain
        # window while the split path splits at D*, and the Cober-List
        # rime-density lookup has interior kinks that neither node
        # placement resolves — both sit ~1e-4 from the GL64 value.
        sq = self._sources(T, rain_inner="quadrature_split")
        sc = self._sources(T, rain_inner="closed_form")
        for name, vq, vc in zip(sq._fields, sq, sc):
            rtol = 1e-3 if name == "dB_rim" else 2e-6
            np.testing.assert_allclose(
                float(vq), float(vc),
                rtol=rtol, atol=1e-18, err_msg=name)

    @pytest.mark.parametrize("T", [260.0, 271.0])
    def test_rain_inner_default_matches_split(self, T):
        # the production per-cell-node path integrates the |v_i - v_l|
        # kink un-split; its residual vs the (exact) split path is the
        # kink quadrature error — measured <=3e-3 at GL-8, well inside
        # the GL-8 quadrature-ladder gate (5e-2)
        sq = self._sources(T, rain_inner="quadrature")
        ss = self._sources(T, rain_inner="quadrature_split")
        for name, vq, vs in zip(sq._fields, sq, ss):
            np.testing.assert_allclose(
                float(vq), float(vs),
                rtol=1e-2, atol=1e-18, err_msg=name)


class TestIceSelfCollection:
    def test_aggregation(self):
        st, loglam = make_state()
        rate = _ice_self_collection(st, loglam, CHEN, F(RHO_A),
                                       quad=GaussLegendre(40))
        assert float(rate) > 0
        # more ice -> much faster aggregation (~N^2)
        st2, loglam2 = make_state(L_ice=2e-3, N_ice=2e5)
        rate2 = _ice_self_collection(st2, loglam2, CHEN, F(RHO_A),
                                        quad=GaussLegendre(40))
        assert float(rate2) > 2 * float(rate)

    # blocked (production default: cross-segment pair blocks from the
    # shared node table + within-segment cusp triangles) vs the round-4
    # cusp-split triangle anchor. Builder-measured residuals vs a GL-64
    # triangle reference across 5 curated states: blocked max 5.5e-3 at
    # GL-16 (triangle: 1.07e-2) and 4.9e-2 at GL-8 (triangle: 5.9e-2).
    @pytest.mark.parametrize("state_kw", [
        dict(),                                     # moderately rimed
        dict(L_ice=1e-4, N_ice=1e5, F_rim=0.0),     # unrimed
        dict(L_ice=2e-3, N_ice=1e4, F_rim=0.1),     # large aggregates
    ])
    def test_blocked_matches_triangle(self, state_kw):
        st, loglam = make_state(**state_kw)
        q = GaussLegendre(16)
        blk = _ice_self_collection(st, loglam, CHEN, F(RHO_A), quad=q,
                                   inner="blocked")
        tri = _ice_self_collection(st, loglam, CHEN, F(RHO_A), quad=q,
                                   inner="triangle")
        np.testing.assert_allclose(float(blk), float(tri), rtol=3e-2)

    def test_blocked_converges(self):
        # GL-16 blocked vs a GL-48 blocked reference on the rimed state
        st, loglam = make_state()
        lo = _ice_self_collection(st, loglam, CHEN, F(RHO_A),
                                  quad=GaussLegendre(16), inner="blocked")
        hi = _ice_self_collection(st, loglam, CHEN, F(RHO_A),
                                  quad=GaussLegendre(48), inner="blocked")
        np.testing.assert_allclose(float(lo), float(hi), rtol=1e-2)


class TestBMT2MP3:
    MP = microphysics_2m_params(with_ice=True)

    @staticmethod
    @jax.jit
    def _tend_jit(mp, T, q_ice, n_ice, F_rim, q_rim, b_rim):
        st = P3.p3_state(PARAMS, q_ice * RHO_A, n_ice * RHO_A, F_rim,
                         F(400.0))
        loglam = P3.get_distribution_loglambda(st)
        return bulk_tendencies_2m(
            mp, TPS, F(RHO_A), T, F(1.2e-2), F(1e-3), F(1e8 / RHO_A),
            F(1e-4), F(1e4 / RHO_A), q_ice=q_ice, n_ice=n_ice,
            q_rim=q_rim, b_rim=b_rim, log_lambda=loglam)

    def _tend(self, T, q_ice=1e-4, n_ice=1e5 / RHO_A, **kw):
        return self._tend_jit(
            self.MP, F(T), F(q_ice), F(n_ice), F(kw.get("F_rim", 0.3)),
            F(kw.get("q_rim", 0.3 * q_ice)),
            F(kw.get("b_rim", 0.3 * q_ice / 400.0)))

    def test_cold_full_tendencies(self):
        out = self._tend(258.0)
        for name, v in zip(out._fields, out):
            assert np.isfinite(float(v)), name
        # riming transfers liquid to ice below freezing
        assert float(out.dq_ice_dt) > 0
        assert float(out.dq_rim_dt) > 0

    def test_warm_melts(self):
        out = self._tend(278.0)
        for v in out:
            assert np.isfinite(float(v))
        # ice melts into rain above freezing
        assert float(out.dq_ice_dt) < 0

    def test_no_ice_matches_warm_only(self):
        # with zero ice state, P3 additions reduce to warm rain + nucleation
        out = self._tend(288.0, q_ice=0.0, n_ice=0.0, q_rim=0.0, b_rim=0.0)
        for v in out:
            assert np.isfinite(float(v))

    # f64 in the slow tier: same fused program, second full compile
    @pytest.mark.parametrize(
        "grid_dtype",
        ["float32", pytest.param("float64", marks=pytest.mark.slow)])
    def test_fused_jit_grid(self, grid_dtype):
        dtype = np.dtype(grid_dtype)
        n = 16
        T = jnp.asarray(np.linspace(250, 280, n), dtype)
        q_ice = jnp.asarray(np.geomspace(1e-7, 1e-3, n), dtype)
        n_ice = jnp.full((n,), 1e5, dtype)

        @jax.jit
        def run(T, q_ice, n_ice):
            st = P3.p3_state(PARAMS, q_ice * RHO_A, n_ice * RHO_A,
                             jnp.full_like(T, 0.3),
                             jnp.full_like(T, 400.0))
            loglam = P3.get_distribution_loglambda(st)
            return bulk_tendencies_2m(
                self.MP, TPS, jnp.asarray(RHO_A, dtype), T,
                jnp.full_like(T, 1.2e-2), jnp.full_like(T, 1e-3),
                jnp.full_like(T, 1e8), jnp.full_like(T, 1e-4),
                jnp.full_like(T, 1e4), q_ice=q_ice, n_ice=n_ice,
                q_rim=0.3 * q_ice, b_rim=0.3 * q_ice / 400.0,
                log_lambda=loglam)

        out = run(T, q_ice, n_ice)
        for leaf in out:
            assert np.all(np.isfinite(leaf))

    def test_random_state_fuzz_finite(self):
        # 512 random physically-plausible-to-adversarial states through
        # the FULL fused tendency in one vectorized call: any NaN leak
        # through the eps-gates/masks shows up here (reference-style
        # finiteness sweep, bulk_tendencies_tests.jl). Log-uniform over
        # wide ranges incl. zeros, mismatched moments, and F_rim -> 1.
        # GL-8: the mask/eps-gate structure under test is
        # order-independent and the reduced order halves the compile.
        rng = np.random.default_rng(7)
        n = 512
        dtype = np.float32
        lo = lambda a, b: np.asarray(
            10 ** rng.uniform(np.log10(a), np.log10(b), n), dtype)
        zero_mask = lambda p: (rng.random(n) > p).astype(dtype)
        rho = lo(0.3, 1.3)
        T = np.asarray(rng.uniform(210.0, 305.0, n), dtype)
        q_tot = lo(1e-5, 2e-2)
        q_lcl = lo(1e-9, 5e-3) * zero_mask(0.2)
        n_lcl = lo(1e3, 5e8) * zero_mask(0.2)
        q_rai = lo(1e-9, 5e-3) * zero_mask(0.2)
        n_rai = lo(1e0, 1e7) * zero_mask(0.2)
        q_ice = lo(1e-10, 5e-3) * zero_mask(0.2)
        n_ice = lo(1e-1, 1e7) * zero_mask(0.2)
        f_rim = np.asarray(rng.uniform(0.0, 0.999, n), dtype)
        q_rim = (f_rim * q_ice).astype(dtype)
        rho_rim = np.asarray(rng.uniform(60.0, 900.0, n), dtype)
        b_rim = (q_rim / rho_rim).astype(dtype)

        mp8 = microphysics_2m_params(with_ice=True, quadrature_order=8)

        @jax.jit
        def run(rho, T, q_tot, q_lcl, n_lcl, q_rai, n_rai, q_ice, n_ice,
                q_rim, b_rim):
            st = P3.state_from_prognostic(
                mp8.ice.scheme, q_ice * rho, n_ice * rho,
                q_rim * rho, b_rim * rho)
            loglam = P3.get_distribution_loglambda(st)
            return bulk_tendencies_2m(
                mp8, TPS, rho, T, q_tot, q_lcl, n_lcl, q_rai, n_rai,
                q_ice=q_ice, n_ice=n_ice, q_rim=q_rim, b_rim=b_rim,
                log_lambda=loglam)

        out = run(*(jnp.asarray(v) for v in (
            rho, T, q_tot, q_lcl, n_lcl, q_rai, n_rai, q_ice, n_ice,
            q_rim, b_rim)))
        for name, leaf in zip(out._fields, out):
            bad = ~np.isfinite(np.asarray(leaf))
            assert not bad.any(), (name, int(bad.sum()),
                                   np.flatnonzero(bad)[:5])
