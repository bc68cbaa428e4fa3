"""Ice nucleation + box model tests, ported from
/root/reference/test/heterogeneous_ice_nucleation_tests.jl and
homogeneous_ice_nucleation_tests.jl (monotonicity / sign / limit
behaviors) plus the Alpert-Knopf box driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.models import box as BOX
from cloudmicrophysics_tpu.ops import common as CMO
from cloudmicrophysics_tpu.ops import ice_nucleation as CMI
from cloudmicrophysics_tpu.ops import thermo as TDI
from cloudmicrophysics_tpu.parameters import ThermodynamicsParameters, sb2006
from cloudmicrophysics_tpu.parameters.aerosol_species import (
    ArizonaTestDust,
    DesertDust,
    Feldspar,
    Ferrihydrite,
    H2SO4SolutionParameters,
    Illite,
    Kaolinite,
)
from cloudmicrophysics_tpu.parameters.ice_nucleation import (
    Frostenberg2023,
    RainFreezing,
    ice_nucleation_parameters,
)

TPS = ThermodynamicsParameters()
IPS = ice_nucleation_parameters()
H2SO4 = H2SO4SolutionParameters()
F = jnp.float64


class TestDustActivation:
    def test_monotonicity(self):
        # reference het tests :28-112
        for dust in (ArizonaTestDust(), DesertDust()):
            f = lambda Si, T: float(CMI.dust_activated_number_fraction(
                dust, IPS.deposition, F(Si), F(T)))
            assert f(1.34, 250.0) > f(1.2, 250.0)   # higher Si -> more
            assert f(1.2, 210.0) > f(1.2, 250.0)    # colder -> more
            r = lambda T: float(CMI.mohler_deposition_rate(
                dust, IPS.deposition, F(1.2), F(T), F(0.05), F(3000.0)))
            assert r(210.0) > r(250.0)
            # negative dSi_dt -> no activation
            assert CMI.mohler_deposition_rate(
                dust, IPS.deposition, F(1.01), F(250.0), F(-0.3),
                F(3000.0)) == 0


class TestWaterActivityJ:
    def test_deposition_J_colder_is_faster(self):
        # reference het tests :115-160
        x_sulph = 0.1
        for dust in (Feldspar(), Ferrihydrite(), Kaolinite()):
            def J(T):
                da = float(CMO.a_w_xT(H2SO4, TPS, F(x_sulph), F(T))
                           - CMO.a_w_ice(TPS, F(T)))
                return float(CMI.deposition_J(dust, F(da)))

            assert J(228.8) > J(229.2)

    def test_abifm_J_colder_is_faster(self):
        for dust in (DesertDust(), Illite(), Kaolinite()):
            def J(e, T):
                da = float(CMO.a_w_eT(TPS, F(e), F(T))
                           - CMO.a_w_ice(TPS, F(T)))
                return float(CMI.ABIFM_J(dust, F(da)))

            assert J(544.0, 251.0) > J(1088.0, 285.0)

    def test_koop_homogeneous(self):
        # higher delta_a_w -> higher J; within published magnitude range
        J1 = float(CMI.homogeneous_J_cubic(IPS.homogeneous, F(0.27)))
        J2 = float(CMI.homogeneous_J_cubic(IPS.homogeneous, F(0.30)))
        J3 = float(CMI.homogeneous_J_cubic(IPS.homogeneous, F(0.33)))
        assert J1 < J2 < J3
        # Koop 2000: J spans ~1e-6..1e13 cm-3 s-1 over the valid range
        assert 1e-3 < J1 < 1e10   # m^-3 s^-1
        assert J3 > 1e14
        # linear fit also monotone
        assert float(CMI.homogeneous_J_linear(IPS.homogeneous, F(0.30))) > \
            float(CMI.homogeneous_J_linear(IPS.homogeneous, F(0.27)))


class TestP3Nucleation:
    def test_deposition_N_i(self):
        f = lambda T: float(CMI.P3_deposition_N_i(IPS.p3, F(T)))
        assert f(230.0) > f(250.0) > f(270.0) > 0
        assert f(280.0) == 0  # above freezing
        # clamped at T_dep_thres
        assert f(220.0) == f(233.0)

    def test_het_N_i(self):
        f = lambda T: float(CMI.P3_het_N_i(
            IPS.p3, F(T), F(1e8), F(4e-17), F(1.0)))
        assert 0 < f(260.0) < f(250.0) < 1e8


class TestFrostenberg:
    IP = Frostenberg2023()

    def test_mean_and_frequency(self):
        # reference het tests :220-275
        mu_cold = float(CMI.INP_concentration_mean(self.IP, F(243.15)))
        mu_warm = float(CMI.INP_concentration_mean(self.IP, F(263.15)))
        assert mu_cold > mu_warm  # colder -> more INPs
        # default a=b=1: mu = 9 log(-T_c/10): at -30C: 9 ln 3
        np.testing.assert_allclose(mu_cold, 9 * np.log(3.0), rtol=1e-10)
        freq = float(CMI.INP_concentration_frequency(
            self.IP, F(np.exp(mu_cold)), F(243.15)))
        assert freq > 0
        assert CMI.INP_concentration_frequency(
            self.IP, F(1e3), F(280.0)) == 0  # above freezing

    def test_immersion_limit_rate(self):
        # reference het tests :278-305
        T_cold = F(243.15)
        rho = F(1.2)
        r = float(CMI.immersion_limit_rate(self.IP, T_cold, rho, tau=300.0))
        inpc = np.exp(9 * np.log(3.0)) / 1.2
        np.testing.assert_allclose(r, inpc / 300.0, rtol=1e-10)
        # log-shift multiplies the rate by e
        r_shift = float(CMI.immersion_limit_rate(
            self.IP, T_cold, rho, tau=300.0, inpc_log_shift=1.0))
        np.testing.assert_allclose(r_shift, r * np.e, rtol=1e-10)
        # zero above freezing
        assert CMI.immersion_limit_rate(self.IP, F(280.0), rho) == 0

    def test_deposition_rate(self):
        # reference het tests :340-424
        T = F(250.0)
        rho = F(1.2)
        q_sat_ice = float(TDI.saturation_vapor_specific_content_over_ice(
            TPS, T, rho))
        m_nuc = np.pi / 6 * 916.7 * (10e-6) ** 3
        # strongly supersaturated: q mass rate = m_nuc * n rate
        dn, dq = CMI.deposition_rate_frostenberg(
            self.IP, TPS, T, rho, F(2 * q_sat_ice), F(0.0), F(0.0),
            F(0.0), m_nuc)
        assert float(dn) > 0
        np.testing.assert_allclose(float(dq), m_nuc * float(dn), rtol=1e-10)
        # mass rate is min(m_nuc * dn, q_excess / (2 tau))
        dn2, dq2 = CMI.deposition_rate_frostenberg(
            self.IP, TPS, T, rho, F(q_sat_ice * 1.06), F(0.0), F(0.0),
            F(0.0), m_nuc)
        q_excess = q_sat_ice * 0.06
        np.testing.assert_allclose(
            float(dq2), min(m_nuc * float(dn2), q_excess / 600.0),
            rtol=1e-6)
        # the vapor-excess cap binds with a huge starter mass
        _, dq_cap = CMI.deposition_rate_frostenberg(
            self.IP, TPS, T, rho, F(q_sat_ice * 1.06), F(0.0), F(0.0),
            F(0.0), m_nuc=1.0)
        np.testing.assert_allclose(float(dq_cap), q_excess / 600.0,
                                   rtol=1e-6)
        # warm or subsaturated -> zero
        dn3, _ = CMI.deposition_rate_frostenberg(
            self.IP, TPS, F(270.0), rho, F(2 * q_sat_ice), F(0.0), F(0.0),
            F(0.0), m_nuc)
        assert float(dn3) == 0


class TestBiggFreezing:
    def test_rain_and_cloud(self):
        sb = sb2006()
        rf = RainFreezing()
        T_cold, T_warm = F(260.0), F(271.0)
        args = (F(1e-4), F(1.1), F(1e4))
        dn, dq = CMI.liquid_freezing_rate_rain(rf, sb.pdf_r, TPS, *args,
                                               T_cold)
        assert float(dn) > 0 and float(dq) > 0
        # warmer than T_freeze - 4 -> zero
        dn_w, dq_w = CMI.liquid_freezing_rate_rain(rf, sb.pdf_r, TPS, *args,
                                                   T_warm)
        assert float(dn_w) == 0 and float(dq_w) == 0
        # colder -> faster
        dn2, _ = CMI.liquid_freezing_rate_rain(rf, sb.pdf_r, TPS, *args,
                                               F(250.0))
        assert float(dn2) > float(dn)
        # cloud PSD variant
        dnc, dqc = CMI.liquid_freezing_rate_cloud(
            rf, sb.pdf_c, TPS, F(1e-3), F(1.1), F(1e8), T_cold)
        assert float(dnc) > 0 and float(dqc) > 0
        # zero inputs
        dn0, dq0 = CMI.liquid_freezing_rate_cloud(
            rf, sb.pdf_c, TPS, F(0.0), F(1.1), F(0.0), T_cold)
        assert float(dn0) == 0 and float(dq0) == 0


class TestBoxModel:
    def test_deterministic_freezing(self):
        ic = BOX.BoxState(T=F(251.0), A_sum=F(0.0), N_liq=F(1e8),
                          N_ice=F(0.0))
        traj = BOX.run_box(ic, 0.0, 100.0, TPS, Illite(),
                           cooling_rate=0.01, A_aero=1e-10, dt=1.0)
        assert float(traj.T[-1]) < float(traj.T[0])
        assert float(traj.N_ice[-1]) > 0
        np.testing.assert_allclose(
            np.asarray(traj.N_liq) + np.asarray(traj.N_ice), 1e8, rtol=1e-9)

    def test_stochastic_converges_to_deterministic(self):
        # With many droplets of equal area, the stochastic binomial model
        # approaches the deterministic rate (Alpert-Knopf 2016)
        n_drops = 4000
        A = np.full(n_drops, 1e-9)
        T, n_liq, n_ice, a_sum = BOX.run_box_stochastic(
            248.0, A, 0.0, 200.0, TPS, Illite(), cooling_rate=0.05, dt=1.0,
            rng_key=jax.random.PRNGKey(3))
        ic = BOX.BoxState(T=F(248.0), A_sum=F(0.0), N_liq=F(n_drops),
                          N_ice=F(0.0))
        det = BOX.run_box(ic, 0.0, 200.0, TPS, Illite(),
                          cooling_rate=0.05, A_aero=1e-9, dt=1.0)
        frozen_frac_stoch = float(n_ice[-1]) / n_drops
        frozen_frac_det = float(det.N_ice[-1]) / n_drops
        assert frozen_frac_stoch > 0
        np.testing.assert_allclose(frozen_frac_stoch, frozen_frac_det,
                                   rtol=0.2)
