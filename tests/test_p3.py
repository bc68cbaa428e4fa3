"""P3 core tests, ported from /root/reference/test/p3_tests.jl and
p3_rho_d_stability.jl (same setups, published/regression values,
tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.parameters import chen2022_vel_type
from cloudmicrophysics_tpu.parameters.p3 import (
    NO_ASPECT_RATIO,
    parameters_p3,
)
from cloudmicrophysics_tpu.utils.quadrature import GaussLegendre

PARAMS = parameters_p3()
PARAMS_NOAR = parameters_p3(aspect_ratio=NO_ASPECT_RATIO)
PARAMS_CONST = parameters_p3(slope_law="constant")
CHEN = chen2022_vel_type()
F = jnp.float64


class TestStateCreation:
    def test_unrimed_and_rimed(self):
        s0 = P3.p3_state(PARAMS, F(0.22), F(1e6), F(0.0), F(400.0))
        assert float(s0.F_rim) == 0
        assert np.isfinite(float(s0.D_th))
        assert np.isinf(float(s0.D_gr)) and np.isinf(float(s0.D_cr))
        s1 = P3.p3_state(PARAMS, F(0.22), F(1e6), F(0.5), F(400.0))
        assert float(s1.D_th) < float(s1.D_gr) < float(s1.D_cr)


class TestThresholds:
    def test_exact_solution(self):
        # rho_d from thresholds satisfies MM2015 Eq 17 (reference :58-79)
        mass = PARAMS.mass
        for F_rim in (0.5, 0.8, 0.95):
            for rho_rim in (200.0, 400.0, 800.0):
                rho_d = float(P3.get_rho_d(mass, F(F_rim), F(rho_rim)))
                rho_g = F_rim * rho_rim + (1 - F_rim) * rho_d
                D_gr = (6 * mass.alpha_va / (np.pi * rho_g)) ** (
                    1 / (3 - mass.beta_va))
                D_cr = (6 * mass.alpha_va / (np.pi * rho_g * (1 - F_rim))) \
                    ** (1 / (3 - mass.beta_va))
                D_th = (6 * mass.alpha_va / (np.pi * PARAMS.rho_i)) ** (
                    1 / (3 - mass.beta_va))
                assert D_th < D_gr < D_cr
                bm2 = mass.beta_va - 2
                rho_d_paper = (6 * mass.alpha_va * (D_cr**bm2 - D_gr**bm2)
                               / (np.pi * bm2 * (D_cr - D_gr)))
                np.testing.assert_allclose(rho_d_paper, rho_d, rtol=1e-9)

    def test_mm2015_fig_1a(self):
        # published threshold values (reference :93-98)
        D_cr_ref = [0.4946323381999426, 1.0170979628696817]  # [mm]
        D_gr_ref = [0.26151186272014415, 0.23392868352755775]
        mass = PARAMS.mass
        for i, F_rim in enumerate((0.5, 0.8)):
            rho_d = float(P3.get_rho_d(mass, F(F_rim), F(400.0)))
            rho_g = F_rim * 400.0 + (1 - F_rim) * rho_d
            D_gr = (6 * mass.alpha_va / (np.pi * rho_g)) ** (
                1 / (3 - mass.beta_va))
            D_cr = (6 * mass.alpha_va / (np.pi * rho_g * (1 - F_rim))) ** (
                1 / (3 - mass.beta_va))
            np.testing.assert_allclose(1000 * D_cr, D_cr_ref[i], rtol=2e-2)
            np.testing.assert_allclose(1000 * D_gr, D_gr_ref[i], rtol=2e-2)

    def test_rho_d_reference_value(self):
        # docstring example (reference src/P3_particle_properties.jl:188)
        rho_d = float(P3.get_rho_d(PARAMS.mass, F(0.5), F(916.7)))
        np.testing.assert_allclose(rho_d, 488.9120789986414, rtol=1e-8)

    def test_rho_d_stability_f32(self):
        # f32 get_rho_d stays within 1e-5 of the f64 evaluation for F_rim
        # down to 1e-7 (reference test/p3_rho_d_stability.jl:16-33)
        for F_rim in (1e-7, 1e-5, 1e-3, 0.1, 0.5, 0.9, 0.99):
            for rho_rim in (200.0, 500.0, 900.0):
                r32 = float(P3.get_rho_d(
                    PARAMS.mass, jnp.float32(F_rim), jnp.float32(rho_rim)))
                r64 = float(P3.get_rho_d(PARAMS.mass, F(F_rim), F(rho_rim)))
                np.testing.assert_allclose(r32, r64, rtol=1e-5)


class TestMassAreaDensity:
    """reference :110-172 (rho_rim=500, F_rim=0.5)."""

    def _setup(self):
        state = P3.p3_state(PARAMS, F(0.22), F(1e6), F(0.5), F(500.0))
        D_th, D_gr, D_cr = (float(state.D_th), float(state.D_gr),
                            float(state.D_cr))
        return state, D_th / 2, (D_th + D_gr) / 2, (D_gr + D_cr) / 2, D_cr

    def test_area_regimes(self):
        state, D1, D2, D3, D_cr = self._setup()
        area = PARAMS.area
        sph = lambda D: D**2 * np.pi / 4
        nsp = lambda D: area.gamma * D**area.sigma
        np.testing.assert_allclose(float(P3.ice_area(state, F(D1))), sph(D1))
        np.testing.assert_allclose(float(P3.ice_area(state, F(D2))), nsp(D2))
        np.testing.assert_allclose(float(P3.ice_area(state, F(D3))), sph(D3))
        np.testing.assert_allclose(
            float(P3.ice_area(state, F(D_cr))),
            0.5 * sph(D_cr) + 0.5 * nsp(D_cr), rtol=1e-12)

    def test_mass_regimes(self):
        state, D1, D2, D3, D_cr = self._setup()
        mass = PARAMS.mass
        rho_g = float(state.rho_g)
        sph = lambda rho, D: rho * np.pi / 6 * D**3
        nsp = lambda D: mass.alpha_va * D**mass.beta_va
        np.testing.assert_allclose(
            float(P3.ice_mass(state, F(D1))), sph(PARAMS.rho_i, D1))
        np.testing.assert_allclose(float(P3.ice_mass(state, F(D2))), nsp(D2))
        np.testing.assert_allclose(
            float(P3.ice_mass(state, F(D3))), sph(rho_g, D3), rtol=1e-12)
        np.testing.assert_allclose(
            float(P3.ice_mass(state, F(D_cr))), nsp(D_cr) / 0.5, rtol=1e-12)

    def test_density_regression(self):
        # regression values (reference :149-152)
        state, D1, D2, D3, D_cr = self._setup()
        np.testing.assert_allclose(
            float(P3.ice_density(state, F(D1))), 916.7, rtol=1e-6)
        np.testing.assert_allclose(
            float(P3.ice_density(state, F(D2))), 544.916989830, rtol=1e-6)
        np.testing.assert_allclose(
            float(P3.ice_density(state, F(D3))), float(state.rho_g),
            rtol=1e-6)
        np.testing.assert_allclose(
            float(P3.ice_density(state, F(D_cr))), 383.33480937, rtol=1e-6)

    def test_aspect_ratio(self):
        # reference :155-165
        state, D1, D2, D3, D_cr = self._setup()
        np.testing.assert_allclose(float(P3.phi_i(state, F(D1))), 1.0,
                                   rtol=1e-10)
        assert float(P3.phi_i(state, F(D2))) < 1
        np.testing.assert_allclose(float(P3.phi_i(state, F(D3))), 1.0,
                                   rtol=1e-10)
        assert float(P3.phi_i(state, F(D_cr))) < 1
        # residual phi > 1 band just above D_th
        D_th = float(state.D_th)
        v = float(P3.phi_i(state, F(D_th * 1.001)))
        assert 1 < v < 1.3


class TestShapeSolver:
    @pytest.mark.parametrize("params", [PARAMS, PARAMS_CONST],
                             ids=["powerlaw", "constant"])
    def test_roundtrip(self, params):
        # solve for loglambda from (L, N) generated at known lambda
        # (reference :182-228), vectorized over the full test grid
        grid = np.array(np.meshgrid(
            [1e7, 1e8, 1e9, 1e10],            # N
            np.log([1e2, 1e3, 1e4, 1e5, 1e6]),  # loglambda_ex
            [200.0, 600.0],                   # rho_rim
            [0.0, 0.5, 0.95],                 # F_rim
        )).reshape(4, -1)
        N_ice, loglam_ex, rho_rim, F_rim = (jnp.asarray(g) for g in grid)

        @jax.jit
        def roundtrip(N_ice, loglam_ex, rho_rim, F_rim):
            z = jnp.zeros_like(N_ice)
            state = P3.p3_state(params, z, z, F_rim, rho_rim)
            L_calc = jnp.exp(jnp.log(N_ice)
                             + P3.logLdivN(state, loglam_ex))
            state2 = P3.p3_state(params, L_calc, N_ice, F_rim, rho_rim)
            loglam = P3.get_distribution_loglambda(state2)
            target = jnp.log(L_calc) - jnp.log(N_ice)
            resid = P3.logLdivN(state2, loglam) - target
            return L_calc, loglam, resid

        L_calc, loglam, resid = roundtrip(N_ice, loglam_ex, rho_rim, F_rim)
        valid = np.asarray(L_calc) < 1.0
        # The SlopePowerLaw shape function can have multiple roots
        # (reference notes this; its test uses rtol=1). Assert the solver
        # found a true root: recovered log(L/N) matches the target.
        assert np.all(np.abs(np.asarray(resid)[valid]) < 5e-2)
        if isinstance(params.slope, type(PARAMS_CONST.slope)):
            # constant-mu: single root, tight recovery of loglambda
            np.testing.assert_allclose(
                np.asarray(loglam)[valid], np.asarray(loglam_ex)[valid],
                rtol=1e-2)

    def test_empty_state(self):
        state = P3.p3_state(PARAMS, F(0.0), F(0.0), F(0.5), F(500.0))
        assert np.isneginf(float(P3.get_distribution_loglambda(state)))

    def test_robustness_sweep(self):
        # reference :231-260 incl. the SecantMethod NaN regression case
        lam = P3.get_distribution_loglambda(
            P3.p3_state(PARAMS, F(2.366e-5), F(16461.6), F(0.2), F(800.0)))
        assert np.isfinite(float(lam)) and 2 < float(lam) < 17
        Ls, Ns = np.meshgrid([1e-6, 1e-5, 2.366e-5, 1e-4, 1e-3],
                             [1e2, 1e3, 1e4, 1e5, 1e6])
        for F_rim in (0.0, 0.5, 0.95):
            states = P3.p3_state(
                PARAMS, jnp.asarray(Ls.ravel()), jnp.asarray(Ns.ravel()),
                jnp.full(Ls.size, F_rim), jnp.full(Ls.size, 400.0))
            lams = np.asarray(P3.get_distribution_loglambda(states))
            assert np.all(np.isfinite(lams))
            assert np.all((lams >= 2) & (lams <= 17))

    def test_warm_start_contract(self):
        # warm-start must reproduce cold start for any guess regime
        # (reference test/p3_shape_solver_warmstart_tests.jl:22-90,
        #  rtol 1e-4 @ f64)
        state = P3.p3_state(PARAMS, F(1e-4), F(1e5), F(0.5), F(400.0))
        cold = float(P3.get_distribution_loglambda(state))
        for guess in (None, np.nan, cold, cold * 1.01, cold * 0.8,
                      1.0, 20.0, -5.0):
            warm = float(P3.get_distribution_loglambda(state, guess))
            np.testing.assert_allclose(warm, cold, rtol=1e-4)

    def test_number_integral_identity(self):
        # N = int n(D) dD over quantile bounds (reference p3 integral checks)
        from cloudmicrophysics_tpu.utils.quadrature import (
            ChebyshevGauss,
            integrate_segments,
        )

        state = P3.p3_state(PARAMS, F(1e-4), F(1e5), F(0.5), F(400.0))
        loglam = P3.get_distribution_loglambda(state)
        n = P3.size_distribution(state, loglam)
        bnds = P3.integral_bounds(state, loglam, 1e-8)
        N_int = float(integrate_segments(n, bnds, ChebyshevGauss(1000)))
        np.testing.assert_allclose(N_int, 1e5, rtol=1e-4)

    def test_mass_integral_identity(self):
        from cloudmicrophysics_tpu.utils.quadrature import (
            ChebyshevGauss,
            integrate_segments,
        )

        state = P3.p3_state(PARAMS, F(1e-4), F(1e5), F(0.5), F(400.0))
        loglam = P3.get_distribution_loglambda(state)
        n = P3.size_distribution(state, loglam)
        f = lambda D: n(D) * P3.ice_mass(state, D)
        bnds = P3.integral_bounds(state, loglam, 1e-10, moment_order=3)
        L_int = float(integrate_segments(f, bnds, ChebyshevGauss(2000)))
        np.testing.assert_allclose(L_int, 1e-4, rtol=2e-3)


class TestParticleTerminalVelocity:
    RHO_A = 1.2

    def test_ice_no_aspect_ratio(self):
        # reference :282-295
        state = P3.p3_state(PARAMS_NOAR, F(0.0), F(0.0), F(0.5), F(500.0))
        v_term = P3.ice_particle_terminal_velocity(CHEN, F(self.RHO_A), state)
        Ds = np.linspace(0.5e-4, 4.5e-4, 5)
        expected = [0.08109, 0.4115, 0.7912, 1.1550, 1.4871]
        for D, e in zip(Ds, expected):
            np.testing.assert_allclose(float(v_term(F(D))), e, rtol=1e-3)

    def test_ice_oblate(self):
        # reference :297-307
        state = P3.p3_state(PARAMS, F(0.0), F(0.0), F(0.5), F(500.0))
        v_term = P3.ice_particle_terminal_velocity(CHEN, F(self.RHO_A), state)
        Ds = np.linspace(0.5e-4, 4.5e-4, 5)
        expected = [0.08109, 0.38381, 0.79121, 1.155, 1.1477]
        for D, e in zip(Ds, expected):
            np.testing.assert_allclose(float(v_term(F(D))), e, rtol=1e-3)


class TestBulkTerminalVelocities:
    """reference :342-404: golden regression values at L=0.22, N=1e6,
    rho_rim=800, GaussLegendre(12)."""

    RHO_A, L_ICE, N_ICE, RHO_RIM = 1.2, 0.22, 1e6, 800.0
    QUAD = GaussLegendre(12)

    def test_zero_states(self):
        for (L, N) in ((0.0, 1e6), (0.22, 0.0)):
            st = P3.p3_state(PARAMS, F(L), F(N), F(0.5), F(self.RHO_RIM))
            loglam = P3.get_distribution_loglambda(st)
            vn = P3.ice_terminal_velocity_number_weighted(
                CHEN, F(self.RHO_A), st, loglam, quad=self.QUAD)
            vm = P3.ice_terminal_velocity_mass_weighted(
                CHEN, F(self.RHO_A), st, loglam, quad=self.QUAD)
            assert float(vn) == 0 and float(vm) == 0

    def test_golden_values(self):
        ref_v_n = [3.64194720794662, 2.6191026241691695]
        ref_v_n_phi = [1.523425288986299, 1.4660573287073728]
        ref_v_m = [7.788114224053879, 5.797675366222473]
        ref_v_m_phi = [2.4275080186932736, 2.3681842506505544]
        for k, F_rim in enumerate((0.0, 0.6)):
            st = P3.p3_state(PARAMS, F(self.L_ICE), F(self.N_ICE), F(F_rim),
                             F(self.RHO_RIM))
            st_noar = P3.p3_state(PARAMS_NOAR, F(self.L_ICE), F(self.N_ICE),
                                  F(F_rim), F(self.RHO_RIM))
            loglam = P3.get_distribution_loglambda(st)
            vn = float(P3.ice_terminal_velocity_number_weighted(
                CHEN, F(self.RHO_A), st_noar, loglam, quad=self.QUAD))
            vm = float(P3.ice_terminal_velocity_mass_weighted(
                CHEN, F(self.RHO_A), st_noar, loglam, quad=self.QUAD))
            vn_phi = float(P3.ice_terminal_velocity_number_weighted(
                CHEN, F(self.RHO_A), st, loglam, quad=self.QUAD))
            vm_phi = float(P3.ice_terminal_velocity_mass_weighted(
                CHEN, F(self.RHO_A), st, loglam, quad=self.QUAD))
            np.testing.assert_allclose(vn, ref_v_n[k], rtol=1e-3)
            np.testing.assert_allclose(vn_phi, ref_v_n_phi[k], rtol=1e-3)
            np.testing.assert_allclose(vm, ref_v_m[k], rtol=1e-3)
            np.testing.assert_allclose(vm_phi, ref_v_m_phi[k], rtol=1e-3)
            assert vn_phi <= vn and vm_phi <= vm


class TestJitVmap:
    def test_fused_shape_solve_and_velocity(self, dtype):
        n = 32
        L = jnp.asarray(np.geomspace(1e-6, 1e-3, n), dtype)
        N = jnp.full((n,), 1e5, dtype)

        @jax.jit
        def solve(L, N):
            st = P3.p3_state(PARAMS, L, N, jnp.full_like(L, 0.4),
                             jnp.full_like(L, 400.0))
            loglam = P3.get_distribution_loglambda(st)
            vm = P3.ice_terminal_velocity_mass_weighted(
                CHEN, jnp.asarray(1.2, dtype), st, loglam,
                quad=GaussLegendre(12))
            return loglam, vm

        loglam, vm = solve(L, N)
        assert np.all(np.isfinite(loglam))
        assert np.all(np.asarray(vm) > 0)
        # heavier ice -> larger particles -> faster fall overall (small
        # local dips allowed: the SlopePowerLaw shape function has a
        # multi-root band and the solver can hop roots as L varies)
        vms = np.asarray(vm)
        assert vms[-1] > 5 * vms[0]
        assert np.mean(np.diff(vms) > 0) > 0.8


class TestAllSolutions:
    def test_scan_finds_primary_root(self):
        import numpy as np

        p3 = parameters_p3()
        F = jnp.float64
        st = P3.state_from_prognostic(p3, F(1.1e-4), F(1.1e5),
                                      F(3.3e-5), F(3.3e-5 / 400))
        roots = np.asarray(P3.get_distribution_loglambda_all_solutions(st))
        finite = roots[np.isfinite(roots)]
        assert len(finite) >= 1
        target = float(jnp.log(st.rho_q_ice) - jnp.log(st.rho_n_ice))
        for r in finite:
            assert abs(float(P3.logLdivN(st, F(r))) - target) < 1e-8
        primary = float(P3.get_distribution_loglambda(st))
        assert np.min(np.abs(finite - primary)) < 1e-3
