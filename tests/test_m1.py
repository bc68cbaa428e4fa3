"""1-moment scheme tests, ported from
/root/reference/test/microphysics1M_tests.jl (same setups, regression values,
and tolerances)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.ops import m0, m1, thermo as TDI
from cloudmicrophysics_tpu.ops.states import MicroState, ThermoState
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters,
    chen2022_vel_type,
    microphysics_0m_params,
    microphysics_1m_params,
)
from cloudmicrophysics_tpu.parameters import m1 as P1

TPS = ThermodynamicsParameters()
MP = microphysics_1m_params()
CH = chen2022_vel_type()


def micro(q_tot=0.0, q_lcl=0.0, q_icl=0.0, q_rai=0.0, q_sno=0.0, dt=np.float64):
    return MicroState(*[jnp.asarray(v, dt)
                        for v in (q_tot, q_lcl, q_icl, q_rai, q_sno)])


def th(rho=1.2, T=280.0, dt=np.float64):
    return ThermoState(jnp.asarray(rho, dt), jnp.asarray(T, dt))


class TestM0:
    def test_remove_precipitation(self, dtype):
        # reference test/microphysics0M_tests.jl
        p0m = microphysics_0m_params().precip
        q_vap_sat = dtype.type(10e-3)
        qc = dtype.type(3e-3)
        assert m0.remove_precipitation(p0m, dtype.type(0), dtype.type(0)) == 0
        assert m0.remove_precipitation(
            p0m, dtype.type(0), dtype.type(0), q_vap_sat) == 0
        for lf in [0.0, 0.5, 1.0]:
            q_lcl = dtype.type(qc * lf)
            q_icl = dtype.type((1 - lf) * qc)
            np.testing.assert_allclose(
                m0.remove_precipitation(p0m, q_lcl, q_icl),
                -max(0.0, float(q_lcl) + float(q_icl) - p0m.qc_0) / p0m.tau_precip,
                rtol=1e-6,
            )
            np.testing.assert_allclose(
                m0.d_remove_precipitation_dq_tot(p0m, q_lcl, q_icl),
                -1 / p0m.tau_precip, rtol=1e-6,
            )
            np.testing.assert_allclose(
                m0.remove_precipitation(p0m, q_lcl, q_icl, q_vap_sat),
                -max(0.0, float(q_lcl) + float(q_icl) - p0m.S_0 * float(q_vap_sat))
                / p0m.tau_precip,
                rtol=1e-6,
            )


class TestTerminalVelocity:
    def test_blk1m_rain_empirical(self, dtype):
        # vs eq 5d in Grabowski 1996 (reference :30-49)
        def empir(q_rai, q_tot, rho, rho_g):
            rr = q_rai / (1 - q_tot)
            return 14.34 * rho**0.5 * rho_g**-0.3654 * rr**0.1346

        rho, q_tot, rho_g = 1.2, 20e-3, 1.22
        for q_rai in np.linspace(1e-8, 5e-3, 10):
            v = float(m1.terminal_velocity(
                MP.precip.rain, MP.terminal_velocity.rain,
                jnp.asarray(rho, dtype), jnp.asarray(q_rai, dtype)))
            expected = empir(q_rai, q_tot, rho, rho_g)
            assert abs(v - expected) <= 0.2 * expected

    def test_chen2022_rain_golden(self):
        # golden regression (reference :61)
        vt = m1.terminal_velocity(
            MP.precip.rain, CH.rain, jnp.float64(1.2), jnp.float64(5e-4))
        np.testing.assert_allclose(vt, 5.25213637238494, rtol=1e-5)
        assert m1.terminal_velocity(
            MP.precip.rain, CH.rain, jnp.float64(1.2), jnp.float64(0.0)) == 0
        v2 = m1.terminal_velocity(
            MP.precip.rain, CH.rain, jnp.float64(1.2), jnp.float64(1e-3))
        assert v2 > vt

    def test_chen2022_snow_golden(self):
        # golden regression (reference :78)
        vt = m1.terminal_velocity(
            MP.precip.snow, CH.large_ice, jnp.float64(1.1), jnp.float64(5e-4))
        np.testing.assert_allclose(vt, 0.8573952434834717, rtol=3e-6)
        assert m1.terminal_velocity(
            MP.precip.snow, CH.large_ice, jnp.float64(1.1), jnp.float64(0.0)) == 0

    def test_chen2022_snow_shapes(self):
        # reference :83-107
        args = (MP.precip.snow, CH.large_ice, jnp.float64(1.1))
        v_obl = m1.terminal_velocity(*args, jnp.float64(5e-4), snow_shape="Oblate")
        v_pro = m1.terminal_velocity(*args, jnp.float64(5e-4), snow_shape="Prolate")
        assert v_obl > 0 and v_pro > 0
        assert 0.1 < float(v_obl / v_pro) < 10
        assert m1.terminal_velocity(
            *args, jnp.float64(0.0), snow_shape="Oblate") == 0
        assert m1.terminal_velocity(
            *args, jnp.float64(1e-3), snow_shape="Oblate") > v_obl

    def test_blk1m_snow_edge(self, dtype):
        # NaN check near zero (reference :110-120)
        v = m1.terminal_velocity(
            MP.precip.snow, MP.terminal_velocity.snow,
            jnp.asarray(0.2439843, dtype), jnp.asarray(3.0e-45, dtype))
        assert np.isfinite(v)
        assert m1.terminal_velocity(
            MP.precip.snow, MP.terminal_velocity.snow,
            jnp.asarray(1.2, dtype), jnp.asarray(0.0, dtype)) == 0


class TestLambdaInverse:
    def test_properties(self, dtype):
        # reference :123-149
        rho = jnp.asarray(1.2, dtype)
        r = MP.precip.rain
        s = MP.precip.snow
        np.testing.assert_allclose(
            m1.lambda_inverse(r.pdf, r.mass, jnp.asarray(0.0, dtype), rho),
            r.mass.r0 * 1e-5, rtol=1e-6)
        np.testing.assert_allclose(
            m1.lambda_inverse(s.pdf, s.mass, jnp.asarray(0.0, dtype), rho),
            s.mass.r0 * 1e-5, rtol=1e-6)
        for p in (r, s):
            lam_s = m1.lambda_inverse(p.pdf, p.mass, jnp.asarray(1e-5, dtype), rho)
            lam_l = m1.lambda_inverse(p.pdf, p.mass, jnp.asarray(1e-3, dtype), rho)
            assert lam_l > lam_s
        lam = m1.lambda_inverse(r.pdf, r.mass, jnp.asarray(1e-4, dtype), rho)
        assert 1e-5 < float(lam) < 1e-2


class TestAutoconversion:
    def test_rain_kessler(self, dtype):
        # reference :199-218
        pp = MP.process_params.rain_autoconversion
        q_thr, tau = pp.q_threshold, pp.tau
        rate_s = m1.conv_q_lcl_to_q_rai(
            MP, TPS, micro(q_lcl=0.5 * q_thr, dt=dtype), th(1.0, 280.0, dtype))
        assert abs(float(rate_s)) <= 0.15 * q_thr / tau
        rate_b = m1.conv_q_lcl_to_q_rai(
            MP, TPS, micro(q_lcl=1.5 * q_thr, dt=dtype), th(1.0, 280.0, dtype))
        np.testing.assert_allclose(
            rate_b, 0.5 * q_thr / tau, atol=0.15 * q_thr / tau)

    def test_rain_prescribed_nd(self, dtype):
        # reference :221-260
        mp2 = microphysics_1m_params(rain_autoconversion=P1.PRESCRIBED_ND)
        t = th(1.0, 280.0, dtype)
        assert m1.conv_q_lcl_to_q_rai(mp2, TPS, micro(dt=dtype), t) == 0
        assert m1.conv_q_lcl_to_q_rai(
            mp2, TPS, micro(q_lcl=-1e-4, dt=dtype), t) == 0
        pp = mp2.process_params.rain_autoconversion
        rate = m1.conv_q_lcl_to_q_rai(mp2, TPS, micro(q_lcl=2e-3, dt=dtype), t)
        np.testing.assert_allclose(
            rate, 2e-3 / (pp.tau * (pp.Nc / 1e8) ** pp.alpha), rtol=1e-5)
        # regression: rate = 2e-6 with defaults
        np.testing.assert_allclose(rate, 2e-6, rtol=1e-3)

    def test_snow_no_supersat(self, dtype):
        # reference :263-283
        pp = MP.process_params.snow_autoconversion
        q_thr, tau = pp.q_threshold, pp.tau
        t = th(1.0, 250.0, dtype)
        rate_s = m1.conv_q_icl_to_q_sno(
            MP, TPS, micro(q_icl=0.5 * q_thr, dt=dtype), t)
        assert abs(float(rate_s)) <= 0.15 * q_thr / tau
        rate_b = m1.conv_q_icl_to_q_sno(
            MP, TPS, micro(q_icl=1.5 * q_thr, dt=dtype), t)
        np.testing.assert_allclose(
            rate_b, 0.5 * q_thr / tau, atol=0.15 * q_thr / tau)

    def test_snow_with_supersat(self):
        # reference :286-335
        mp_ss = microphysics_1m_params(
            snow_autoconversion=P1.WITH_SUPERSATURATION)
        T_frz = TPS.T_freeze
        rho, q_rai, q_sno = 1.0, 1e-4, 1e-4

        # above freezing -> 0
        q_v, q_l, q_i = 15e-3, 2e-3, 1e-3
        q_t = q_v + q_l + q_i + q_rai + q_sno
        r = m1.conv_q_icl_to_q_sno(
            mp_ss, TPS, micro(q_t, q_l, q_i, q_rai, q_sno),
            th(rho, T_frz + 30))
        assert r == 0
        # no cloud ice -> 0
        r = m1.conv_q_icl_to_q_sno(
            mp_ss, TPS, micro(q_v + q_l + q_rai + q_sno, q_l, 0.0, q_rai, q_sno),
            th(rho, T_frz - 30))
        assert r == 0
        # no supersaturation -> 0
        T = T_frz - 5
        q_sat_i = float(TDI.saturation_vapor_specific_content_over_ice(
            TPS, jnp.float64(T), jnp.float64(rho)))
        r = m1.conv_q_icl_to_q_sno(
            mp_ss, TPS, micro(q_sat_i, q_l, 3e-3, q_rai, q_sno), th(rho, T))
        np.testing.assert_allclose(r, 0.0, atol=1e-20)
        # regression value (reference :326-335)
        T = T_frz - 10
        q_v = 1.02 * float(TDI.saturation_vapor_specific_content_over_ice(
            TPS, jnp.float64(T), jnp.float64(rho)))
        q_l = 0.0
        q_i = 0.03 * q_v
        q_t = q_v + q_l + q_i + q_rai + q_sno
        r = m1.conv_q_icl_to_q_sno(
            mp_ss, TPS, micro(q_t, q_l, q_i, q_rai, q_sno), th(rho, T))
        np.testing.assert_allclose(r, 2.5408135723057333e-9, rtol=2e-2)


class TestAccretion:
    RHO = 1.2
    Q = 5e-4

    def _st(self, dt=np.float64):
        return micro(20e-3, self.Q, self.Q, self.Q, self.Q, dt=dt)

    def test_rain_liquid_empirical(self, dtype):
        # vs eq 5b in Grabowski 1996 (reference :338-378)
        def empir(q_rai, q_liq, q_tot):
            rr = q_rai / (1 - q_tot)
            rl = q_liq / (1 - q_tot)
            return 2.2 * rl * rr ** (7 / 8)

        rho, q_liq, q_tot = 1.2, 5e-4, 20e-3
        sd = None
        for q_rai in np.linspace(1e-8, 5e-3, 10):
            mic = micro(q_tot, q_liq, 0.0, q_rai, 0.0, dt=dtype)
            r = float(m1.accretion_cloud_liquid_rain(
                MP, TPS, mic, th(rho, 280.0, dtype)))
            e = empir(q_rai, q_liq, q_tot)
            if q_rai > np.finfo(dtype).eps:
                assert abs(r - e) <= 0.1 * e

    def test_regression_values(self):
        # reference :380-451 golden regression values
        mic, t = self._st(), th(self.RHO, TPS.T_freeze + 5)
        np.testing.assert_allclose(
            m1.accretion_cloud_liquid_rain(MP, TPS, mic, t),
            1.4150106417043544e-6, rtol=1e-6)
        np.testing.assert_allclose(
            m1.accretion_cloud_ice_snow(MP, TPS, mic, t),
            2.453070979562392e-7, rtol=1e-6)
        S_accr, S_melt = m1.accretion_cloud_liquid_snow(MP, TPS, mic, t)
        np.testing.assert_allclose(S_accr, 2.453070979562392e-7, rtol=1e-6)
        assert 0 <= float(S_melt) <= float(S_accr)
        np.testing.assert_allclose(
            m1.accretion_cloud_ice_rain(MP, TPS, mic, t),
            1.768763302130443e-6, rtol=1e-6)
        np.testing.assert_allclose(
            m1.accretion_rain_sink(MP, TPS, mic, t),
            3.590060148920766e-5, rtol=1e-6)
        S_rai_sno, S_sno_rai, S_melt = m1.accretion_snow_rain(MP, TPS, mic, t)
        np.testing.assert_allclose(
            S_rai_sno, 2.466313958248222e-4, rtol=1e-6)
        np.testing.assert_allclose(
            S_sno_rai, 6.830957197816771e-5, rtol=1e-6)
        assert float(S_melt) >= 0

    def test_cold_no_melt(self):
        mic, t_cold = self._st(), th(self.RHO, TPS.T_freeze - 5)
        _, S_melt = m1.accretion_cloud_liquid_snow(MP, TPS, mic, t_cold)
        assert S_melt == 0
        _, _, S_melt = m1.accretion_snow_rain(MP, TPS, mic, t_cold)
        assert S_melt == 0

    def test_zero_inputs(self):
        mic0, t = micro(), th(self.RHO, TPS.T_freeze + 5)
        assert m1.accretion_cloud_liquid_rain(MP, TPS, mic0, t) == 0
        assert m1.accretion_cloud_ice_rain(MP, TPS, mic0, t) == 0
        assert m1.accretion_cloud_ice_snow(MP, TPS, mic0, t) == 0
        assert m1.accretion_cloud_liquid_snow(MP, TPS, mic0, t)[0] == 0
        r = m1.accretion_snow_rain(MP, TPS, mic0, t)
        assert r[0] == 0 and r[1] == 0

    def test_disabled_options(self):
        mp_off = microphysics_1m_params(
            cloud_liquid_rain_accretion=None, rain_snow_accretion=None)
        mic, t = self._st(), th(self.RHO, 280.0)
        assert m1.accretion_cloud_liquid_rain(mp_off, TPS, mic, t) == 0
        r = m1.accretion_snow_rain(mp_off, TPS, mic, t)
        assert r[0] == 0 and r[1] == 0 and r[2] == 0


class TestEvapSublMelt:
    def test_rain_evaporation_empirical(self):
        # vs eq 5c in Grabowski 1996 (reference :528-585)
        def empir(q_rai, q_tot, q_lcl, T, p, rho):
            q_sat = float(TDI.saturation_vapor_specific_content_over_liquid(
                TPS, jnp.float64(T), jnp.float64(rho)))
            q_vap = q_tot - q_lcl - q_rai
            rr = q_rai / (1 - q_tot)
            rv_sat = q_sat / (1 - q_tot)
            S = q_vap / q_sat - 1
            ag, bg = 5.4e2, 2.55e5
            G = 1 / (ag + bg / p / rv_sat) / rho
            av, bv = 1.6, 124.9
            F = (av * (rho / 1e3) ** 0.525 * rr**0.525
                 + bv * (rho / 1e3) ** 0.7296 * rr**0.7296)
            return 1 / (1 - q_tot) * S * F * G

        T = TPS.T_freeze + 15
        p = 90000.0
        eps_rd = 1 / TPS.Rv_over_Rd
        p_sat = float(TDI.saturation_vapor_pressure_over_liquid(
            TPS, jnp.float64(T)))
        q_sat = eps_rd * p_sat / (p + p_sat * (eps_rd - 1))
        q_tot = 15e-3
        q_vap = 0.15 * q_sat
        for q_rai in np.linspace(1e-8, 5e-3, 10):
            q_lcl = q_tot - q_vap - q_rai
            R = float(TDI.gas_constant_air(
                TPS, jnp.float64(q_tot), jnp.float64(q_lcl + q_rai),
                jnp.float64(0.0)))
            rho = p / R / T
            r = float(m1.conv_q_rai_to_q_vap(
                MP, TPS, micro(q_tot, q_lcl, 0.0, q_rai, 0.0), th(rho, T)))
            assert abs(r - empir(q_rai, q_tot, q_lcl, T, p, rho)) <= 1e-6

    def test_no_rain_condensation(self):
        # supersaturated -> no rain growth (clamped to 0)
        T = TPS.T_freeze + 15
        p = 90000.0
        eps_rd = 1 / TPS.Rv_over_Rd
        p_sat = float(TDI.saturation_vapor_pressure_over_liquid(
            TPS, jnp.float64(T)))
        q_sat = eps_rd * p_sat / (p + p_sat * (eps_rd - 1))
        q_tot, q_rai = 15e-3, 1e-4
        q_vap = 1.15 * q_sat
        q_liq = q_tot - q_vap
        R = float(TDI.gas_constant_air(
            TPS, jnp.float64(q_tot), jnp.float64(q_liq), jnp.float64(0.0)))
        rho = p / R / T
        r = m1.conv_q_rai_to_q_vap(
            MP, TPS, micro(q_tot, q_liq, 0.0, q_rai, 0.0), th(rho, T))
        assert r == 0

    @pytest.mark.parametrize("mode,ref_vals", [
        ("SublimationOnly",
         [-1.9756907119482267e-7, 0.0, -1.6641552112891826e-7, 0.0]),
        ("DepositionAndSublimation",
         [-1.9756907119482267e-7, 1.9751292385808357e-7,
          -1.6641552112891826e-7, 1.663814937710236e-7]),
    ])
    def test_snow_sublimation_regression(self, mode, ref_vals):
        # reference :588-668 (rtol 1e-2 — values depend on thermo constants)
        mp = microphysics_1m_params(snow_deposition_sublimation=mode)
        cnt = 0
        for T in [TPS.T_freeze + 2, TPS.T_freeze - 2]:
            p = 90000.0
            eps_rd = 1 / TPS.Rv_over_Rd
            p_sat = float(TDI.saturation_vapor_pressure_over_ice(
                TPS, jnp.float64(T)))
            q_sat = eps_rd * p_sat / (p + p_sat * (eps_rd - 1))
            for eps_f in [0.95, 1.05]:
                q_sno = 1e-4
                q_tot = eps_f * q_sat + q_sno
                R = float(TDI.gas_constant_air(
                    TPS, jnp.float64(q_tot), jnp.float64(0.0),
                    jnp.float64(q_sno)))
                rho = p / R / T
                r = float(m1.conv_q_sno_to_q_vap(
                    mp, TPS, micro(q_tot, 0.0, 0.0, 0.0, q_sno), th(rho, T)))
                ref = ref_vals[cnt]
                if ref == 0.0:
                    assert r == 0.0
                else:
                    np.testing.assert_allclose(r, ref, rtol=2e-2)
                cnt += 1

    def test_snow_melt_regression(self):
        # reference :671-697
        r = m1.conv_q_sno_to_q_rai(
            MP, TPS, micro(q_sno=1e-4), th(1.2, TPS.T_freeze + 2))
        np.testing.assert_allclose(r, 9.516553267013085e-6, rtol=2e-2)
        assert m1.conv_q_sno_to_q_rai(
            MP, TPS, micro(), th(1.2, TPS.T_freeze + 2)) == 0
        assert m1.conv_q_sno_to_q_rai(
            MP, TPS, micro(q_sno=1e-4), th(1.2, TPS.T_freeze - 2)) == 0

    def test_cloud_ice_melt(self):
        # reference :699-731: melt > 0 above freezing, 0 at/below
        r = m1.conv_q_icl_to_q_lcl(
            MP, TPS, micro(q_icl=1e-4), th(1.2, TPS.T_freeze + 2))
        assert float(r) > 0
        assert m1.conv_q_icl_to_q_lcl(
            MP, TPS, micro(q_icl=1e-4), th(1.2, TPS.T_freeze - 2)) == 0
        assert m1.conv_q_icl_to_q_lcl(
            MP, TPS, micro(), th(1.2, TPS.T_freeze + 2)) == 0

    def test_mixed_phase(self):
        # reference :152-196: evap/subl negative in mixed-phase states
        T = TPS.T_freeze + 10
        p = 90000.0
        eps_rd = 1 / TPS.Rv_over_Rd
        p_sat = float(TDI.saturation_vapor_pressure_over_liquid(
            TPS, jnp.float64(T)))
        q_sat = eps_rd * p_sat / (p + p_sat * (eps_rd - 1))
        q_rai = q_sno = 1e-4
        q_tot = 15e-3
        q_vap = 0.7 * q_sat
        q_liq = q_tot - q_vap - q_rai - q_sno
        R = float(TDI.gas_constant_air(
            TPS, jnp.float64(q_tot), jnp.float64(q_liq + q_rai),
            jnp.float64(q_sno)))
        rho = p / R / T
        r = m1.conv_q_rai_to_q_vap(
            MP, TPS, micro(q_tot, q_liq, 0.0, q_rai, q_sno), th(rho, T))
        assert float(r) < 0


class TestVmapJit:
    def test_fused_over_arrays(self, dtype):
        import jax

        n = 64
        q = jnp.linspace(0, 5e-3, n, dtype=dtype)
        mic = MicroState(
            q_tot=jnp.full((n,), 2e-2, dtype),
            q_lcl=q, q_icl=q * 0.5, q_rai=q * 0.3, q_sno=q * 0.2)
        t = ThermoState(jnp.full((n,), 1.1, dtype),
                        jnp.linspace(250, 300, n, dtype=dtype))

        @jax.jit
        def all_rates(mic, t):
            sd = m1.size_distr_parameters(MP, mic, t)
            return (
                m1.conv_q_lcl_to_q_rai(MP, TPS, mic, t),
                m1.conv_q_icl_to_q_sno(MP, TPS, mic, t, sd),
                m1.accretion_cloud_liquid_rain(MP, TPS, mic, t, sd),
                m1.accretion_snow_rain(MP, TPS, mic, t, sd),
                m1.conv_q_rai_to_q_vap(MP, TPS, mic, t, sd),
                m1.conv_q_sno_to_q_rai(MP, TPS, mic, t, sd),
            )

        out = all_rates(mic, t)
        for leaf in jax.tree_util.tree_leaves(out):
            assert np.all(np.isfinite(leaf))
