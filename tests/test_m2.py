"""2-moment scheme tests, ported from
/root/reference/test/microphysics2M_tests.jl."""

import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.ops import common as CO
from cloudmicrophysics_tpu.ops import m2, thermo as TDI
from cloudmicrophysics_tpu.parameters import m2 as P2
from cloudmicrophysics_tpu.parameters import (
    AirProperties,
    SB2006VelType,
    StokesRegimeVelType,
    ThermodynamicsParameters,
    chen2022_vel_type,
)
from cloudmicrophysics_tpu.utils import distributions as DT

TPS = ThermodynamicsParameters()
APS = AirProperties()
SB = P2.sb2006(is_limited=True)
SB_NL = P2.sb2006(is_limited=False)
KK = P2.kk2000()
B94 = P2.b1994()
TC = P2.tc1980()
LD = P2.LD2004()
CHEN = chen2022_vel_type()
SBV = SB2006VelType()
STV = StokesRegimeVelType()

F64 = jnp.float64


class TestWood2005:
    """Published-figure comparisons (reference :87-139)."""

    RHO, NLCL = 1.0, 1e8

    def _cmp(self, fn, q_mg, expected, eps=0.1):
        r = float(fn(F64(q_mg * 1e-3), F64(self.RHO), F64(self.NLCL)))
        assert abs(r - expected) <= eps * expected, (r, expected)

    def test_panel_a(self):
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_kk2000(KK, q, r, n),
                  0.03138461538461537, 2.636846054348105e-12)
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_kk2000(KK, q, r, n),
                  0.8738461538461537, 9.491665962977648e-9)
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_b1994(B94, q, r, n),
                  0.13999999999999999, 4.584323122458155e-12, eps=1)
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_b1994(B94, q, r, n),
                  0.9000000000000006, 5.4940586176564715e-8, eps=1)
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_tc1980(TC, q, r, n),
                  0.2700000000000001, 3.2768635256661366e-8)
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_tc1980(TC, q, r, n),
                  0.9000000000000006, 5.340418612468997e-7)
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_ld2004(LD, q, r, n),
                  0.3700000000000002, 8.697439193234471e-9)
        self._cmp(lambda q, r, n: m2.conv_q_lcl_to_q_rai_ld2004(LD, q, r, n),
                  0.9000000000000006, 1.1325570516983242e-7)

    def test_panel_b(self):
        q_lcl = 0.5e-3

        def cmp_nd(fn, nd_cm3, expected, eps=0.1):
            r = float(fn(F64(q_lcl), F64(self.RHO), F64(nd_cm3 * 1e6)))
            assert abs(r - expected) <= eps * expected, (r, expected)

        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_kk2000(KK, q, r, n),
               16.13564081404141, 6.457285532394289e-8)
        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_kk2000(KK, q, r, n),
               652.093931356625, 8.604011482409198e-11)
        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_b1994(B94, q, r, n),
               14.47851799831075, 4.2829062386778675e-7)
        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_b1994(B94, q, r, n),
               693.0425211336465, 6.076294746898778e-12)
        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_tc1980(TC, q, r, n),
               13.658073017575544, 2.7110779872658386e-7)
        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_tc1980(TC, q, r, n),
               205.0970632305975, 1.0928660431622176e-7)
        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_ld2004(LD, q, r, n),
               15.122629721719655, 1.1647783461546477e-7)
        cmp_nd(lambda q, r, n: m2.conv_q_lcl_to_q_rai_ld2004(LD, q, r, n),
               149.01220754857331, 1.3917890403908125e-8, eps=1)

    def test_zero_inputs(self):
        z, r = F64(0.0), F64(1.0)
        nd = F64(1e8)
        assert m2.conv_q_lcl_to_q_rai_kk2000(KK, z, r, nd) == 0
        assert m2.conv_q_lcl_to_q_rai_b1994(B94, z, r, nd) == 0
        assert m2.conv_q_lcl_to_q_rai_tc1980(TC, z, r, nd) == 0
        assert m2.conv_q_lcl_to_q_rai_ld2004(LD, z, r, nd) == 0
        assert m2.accretion_kk2000(KK, z, F64(1e-6), r) == 0
        assert m2.accretion_b1994(B94, z, F64(1e-6), r) == 0
        assert m2.accretion_tc1980(TC, z, F64(1e-6)) == 0
        assert m2.accretion_kk2000(KK, F64(5e-4), z, r) == 0

    def test_smooth_transition_close_to_sharp(self):
        q, r, nd = F64(0.5e-3), F64(1.0), F64(1e8)
        for fn in (m2.conv_q_lcl_to_q_rai_b1994,
                   m2.conv_q_lcl_to_q_rai_tc1980,
                   m2.conv_q_lcl_to_q_rai_ld2004):
            params = {m2.conv_q_lcl_to_q_rai_b1994: B94,
                      m2.conv_q_lcl_to_q_rai_tc1980: TC,
                      m2.conv_q_lcl_to_q_rai_ld2004: LD}[fn]
            sm = float(fn(params, q, r, nd, True))
            sh = float(fn(params, q, r, nd, False))
            np.testing.assert_allclose(sm, sh, rtol=0.2)


class TestSB2006PSD:
    def test_limiting_zero(self):
        # N = q = 0 -> all PSD parameters zero (reference :143-170)
        for pdf in (SB.pdf_r, SB_NL.pdf_r):
            p = m2.pdf_rain_parameters(pdf, F64(0.0), F64(1.2), F64(0.0))
            assert all(float(v) == 0 for v in p)
            n = m2.size_distribution_rain(pdf, F64(0.0), F64(1.2), F64(0.0),
                                          jnp.asarray([0.0, 1e-4, 1e-2]))
            assert np.all(np.asarray(n) == 0)
        logA, logB = m2.log_pdf_cloud_parameters_mass(
            SB.pdf_c, F64(0.0), F64(1.2), F64(0.0))
        assert np.isneginf(logA) and np.isposinf(logB)
        n = m2.size_distribution_cloud(SB.pdf_c, F64(0.0), F64(1.2), F64(0.0),
                                       jnp.asarray([1e-6, 1e-4]))
        assert np.all(np.asarray(n) == 0)

    def test_limiters_respected(self):
        # limited PSD parameters stay within their bounds (reference :171-192)
        pdf = SB.pdf_r
        for q in (1e-8, 1e-5, 1e-3, 1e-2):
            for N in (1e0, 1e4, 1e8):
                p = m2.pdf_rain_parameters(pdf, F64(q), F64(1.2), F64(N))
                lam = 1 / float(p.Dr_mean)
                tol = 1e-6
                assert pdf.lambda_min * (1 - tol) <= lam <= pdf.lambda_max * (1 + tol)
                assert pdf.xr_min * (1 - tol) <= float(p.xr_mean) <= pdf.xr_max * (1 + tol)

    def test_number_integral_identity(self):
        # integral of n(D) over quantile bounds recovers N (reference :575-620)
        from cloudmicrophysics_tpu.utils.quadrature import ChebyshevGauss, integrate

        rho_a, N, q = 1.2, 0.5e6, 0.5e-3
        for pdf in (SB.pdf_r, SB_NL.pdf_r):
            D_min, D_max = m2.size_distribution_bounds_rain(
                pdf, F64(q), F64(rho_a), F64(N), 1e-6)
            ND = integrate(
                lambda D: m2.size_distribution_rain(
                    pdf, F64(q), F64(rho_a), F64(N), D),
                D_min, D_max, ChebyshevGauss(1000))
            np.testing.assert_allclose(float(ND), N, rtol=1e-5)

    def test_cloud_number_integral_identity(self):
        from cloudmicrophysics_tpu.utils.quadrature import ChebyshevGauss, integrate

        rho_a, N, q = 1.2, 1e8, 0.5e-3
        D_min, D_max = m2.size_distribution_bounds_cloud(
            SB.pdf_c, F64(q), F64(rho_a), F64(N), 1e-6)
        ND = integrate(
            lambda D: m2.size_distribution_cloud(
                SB.pdf_c, F64(q), F64(rho_a), F64(N), D),
            D_min, D_max, ChebyshevGauss(1000))
        np.testing.assert_allclose(float(ND), N, rtol=1e-4)


class TestSB2006Rates:
    RHO, QLCL, NLCL, QRAI = 1.0, 0.5e-3, 1e8, 1e-6

    def test_autoconversion_and_self_collection(self):
        # self-consistent formula check (reference :194-282)
        for sb in (SB, SB_NL):
            au, sc = m2.autoconversion_and_cloud_liquid_self_collection(
                sb, F64(self.QLCL), F64(self.QRAI), F64(self.RHO),
                F64(self.NLCL))
            acnv, nu = sb.acnv, sb.pdf_c.nu_c
            Lc = self.RHO * self.QLCL
            xc = min(acnv.x_star, Lc / self.NLCL)
            tau = 1 - Lc / (Lc + self.RHO * self.QRAI)
            phi = 400 * tau**0.7 * (1 - tau**0.7) ** 3
            dqr = (acnv.kcc / 20 / acnv.x_star * (nu + 2) * (nu + 4)
                   / (nu + 1) ** 2 * Lc**2 * xc**2
                   * (1 + phi / (1 - tau) ** 2) * acnv.rho0 / self.RHO
                   / self.RHO)
            np.testing.assert_allclose(float(au.dq_rai_dt), dqr, rtol=1e-6)
            np.testing.assert_allclose(float(au.dq_lcl_dt), -dqr, rtol=1e-6)
            np.testing.assert_allclose(
                float(au.dN_rai_dt), dqr * self.RHO / acnv.x_star, rtol=1e-6)
            np.testing.assert_allclose(
                float(au.dN_lcl_dt), -2 * dqr * self.RHO / acnv.x_star,
                rtol=1e-6)
            sc_expected = (-acnv.kcc * (nu + 2) / (nu + 1)
                           * (acnv.rho0 / self.RHO) * Lc**2
                           - float(au.dN_lcl_dt))
            np.testing.assert_allclose(float(sc), sc_expected, rtol=1e-6)
        # zero inputs
        au, sc = m2.autoconversion_and_cloud_liquid_self_collection(
            SB, F64(0.0), F64(0.0), F64(self.RHO), F64(0.0))
        assert all(float(v) == 0 for v in au) and float(sc) == 0

    def test_accretion(self):
        # reference :284-325
        for sb in (SB, SB_NL):
            ac = m2.accretion(sb, F64(self.QLCL), F64(self.QRAI),
                              F64(self.RHO), F64(self.NLCL))
            accr = sb.accr
            Lc, Lr = self.RHO * self.QLCL, self.RHO * self.QRAI
            xc = Lc / self.NLCL
            tau = 1 - Lc / (Lc + Lr)
            phi = (tau / (tau + accr.tau0)) ** 4
            dqr = accr.kcr * Lc * Lr * phi * np.sqrt(accr.rho0 / self.RHO) \
                / self.RHO
            np.testing.assert_allclose(float(ac.dq_rai_dt), dqr, rtol=1e-6)
            np.testing.assert_allclose(float(ac.dq_lcl_dt), -dqr, rtol=1e-6)
            np.testing.assert_allclose(
                float(ac.dN_lcl_dt), -dqr * self.RHO / xc, rtol=1e-6)
            assert float(ac.dN_rai_dt) == 0
        ac = m2.accretion(SB, F64(0.0), F64(0.0), F64(self.RHO), F64(0.0))
        assert all(float(v) == 0 for v in ac)

    def test_rain_self_collection_and_breakup(self):
        # reference :329-380
        rho, q_rai, N_rai = 1.1, 1e-6, 1e4
        for sb in (SB, SB_NL):
            sc, br = m2.rain_self_collection_and_breakup(
                sb, F64(q_rai), F64(rho), F64(N_rai))
            self_col, pdf = sb.self_col, sb.pdf_r
            L = rho * q_rai
            _, Br = m2.pdf_rain_parameters_mass(pdf, F64(q_rai), F64(rho),
                                                F64(N_rai))
            expected_sc = (-self_col.krr * N_rai * L * np.sqrt(pdf.rho0 / rho)
                           * (1 + self_col.kappa_rr / float(Br)) ** self_col.d)
            np.testing.assert_allclose(float(sc), expected_sc, rtol=1e-6)
            assert np.isfinite(float(br))
            # zero inputs -> zero
            sc0, br0 = m2.rain_self_collection_and_breakup(
                sb, F64(0.0), F64(rho), F64(0.0))
            assert float(sc0) == 0 and float(br0) == 0

    def test_number_adjustment(self):
        # reference number_tendency_from_mass_limits semantics
        na = SB.numadj
        pdf = SB.pdf_c
        # in-bounds mean mass: no tendency
        q, n = 1e-3, 1e-3 / 1e-12  # x = 1e-12 within [4.2e-15, 6.54e-11]
        r = m2.number_tendency_from_mass_limits(
            pdf.xc_min, pdf.xc_max, na.tau, F64(q), F64(n))
        np.testing.assert_allclose(float(r), 0.0, atol=1e-10)
        # too many droplets (x below x_min): negative tendency
        n_big = q / pdf.xc_min * 10
        r = m2.number_tendency_from_mass_limits(
            pdf.xc_min, pdf.xc_max, na.tau, F64(q), F64(n_big))
        assert float(r) < 0
        # no mass -> relax n to zero
        r = m2.number_tendency_from_mass_limits(
            pdf.xc_min, pdf.xc_max, na.tau, F64(0.0), F64(1e6))
        np.testing.assert_allclose(float(r), -1e6 / na.tau, rtol=1e-6)


class TestSB2006Velocities:
    RHO = 1.1

    def test_cloud_terminal_velocity(self):
        # reference :385-417
        q_liq, N_liq = 1e-3, 1e8
        vt0, vt1 = m2.cloud_terminal_velocity(
            SB.pdf_c, STV, F64(q_liq), F64(self.RHO), F64(N_liq))
        _, Bc = m2.pdf_cloud_parameters_mass(SB.pdf_c, F64(q_liq),
                                             F64(self.RHO), F64(N_liq))
        pref = (2 / 9) * (3 / 4 / np.pi / 1000.0) ** (2 / 3) \
            * (1000.0 / self.RHO - 1) * STV.grav / STV.nu_air
        ref0 = pref * float(DT.generalized_gamma_moment(
            1.0, 1.0, Bc, N_liq, 2 / 3)) / N_liq
        ref1 = pref * float(DT.generalized_gamma_moment(
            1.0, 1.0, Bc, N_liq, 5 / 3)) / self.RHO / q_liq
        np.testing.assert_allclose(float(vt0), ref0, rtol=1e-6)
        np.testing.assert_allclose(float(vt1), ref1, rtol=1e-6)
        assert m2.cloud_terminal_velocity(
            SB.pdf_c, STV, F64(q_liq), F64(self.RHO), F64(0.0))[0] == 0
        assert m2.cloud_terminal_velocity(
            SB.pdf_c, STV, F64(0.0), F64(self.RHO), F64(N_liq))[1] == 0

    def test_rain_rogers_with_limiters(self):
        # reference :419-446
        q_rai, N_rai = 1e-6, 1e4
        vt0, vt1 = m2.rain_terminal_velocity(
            SB, SBV, F64(q_rai), F64(self.RHO), F64(N_rai))
        Dm = float(m2.pdf_rain_parameters(
            SB.pdf_r, F64(q_rai), F64(self.RHO), F64(N_rai)).Dr_mean)
        sq = np.sqrt(SBV.rho0 / self.RHO)
        ref0 = max(0, sq * (SBV.aR - SBV.bR / (1 + SBV.cR * Dm)))
        ref1 = max(0, sq * (SBV.aR - SBV.bR / (1 + SBV.cR * Dm) ** 4))
        np.testing.assert_allclose(float(vt0), ref0, rtol=1e-6)
        np.testing.assert_allclose(float(vt1), ref1, rtol=1e-6)

    def test_rain_rogers_no_limiters(self):
        # reference :448-480 (modified integral bounds)
        q_rai, N_rai = 1e-6, 1e4
        vt0, vt1 = m2.rain_terminal_velocity(
            SB_NL, SBV, F64(q_rai), F64(self.RHO), F64(N_rai))
        assert float(vt0) >= 0 and float(vt1) >= 0
        assert m2.rain_terminal_velocity(
            SB_NL, SBV, F64(q_rai), F64(self.RHO), F64(0.0))[0] == 0
        assert m2.rain_terminal_velocity(
            SB_NL, SBV, F64(0.0), F64(self.RHO), F64(N_rai))[1] == 0

    def test_rain_chen2022_golden(self):
        # golden regression values (reference :484-510)
        q_rai, N_rai = 5e-4, 1e4
        for sb in (SB, SB_NL):
            vt0, vt1 = m2.rain_terminal_velocity(
                sb, CHEN.rain, F64(q_rai), F64(self.RHO), F64(N_rai))
            np.testing.assert_allclose(float(vt0), 1.0738503635546666,
                                       rtol=1e-6)
            np.testing.assert_allclose(float(vt1), 4.00592218028957,
                                       rtol=1e-6)
            v2 = m2.rain_terminal_velocity(
                sb, CHEN.rain, F64(2 * q_rai), F64(self.RHO), F64(N_rai))
            assert float(v2[0]) > float(vt0) and float(v2[1]) > float(vt1)


class TestRainEvaporation:
    def test_formula_and_gamma_incl(self):
        # reference :512-566: hardcoded Gamma_incl evaluation points
        rho, q_rai, N_rai, T = 1.1, 1e-6, 1e4, 288.15
        q_tot = 1e-3
        for sb in (SB, SB_NL):
            dn, dq = m2.rain_evaporation(
                sb, APS, TPS, F64(q_tot), F64(0.0), F64(0.0), F64(q_rai),
                F64(0.0), F64(rho), F64(N_rai), F64(T))
            evap = sb.evap
            G = float(CO.G_func_liquid(APS, TPS, F64(T)))
            S = float(TDI.supersaturation_over_liquid(
                TPS, F64(q_tot), F64(q_rai), F64(0.0), F64(rho), F64(T)))
            xr = float(m2.pdf_rain_parameters(
                sb.pdf_r, F64(q_rai), F64(rho), F64(N_rai)).xr_mean)
            Dr = (6 / np.pi / 1000.0) ** (1 / 3) * xr ** (1 / 3)
            N_Re = evap.alpha * xr**evap.beta * np.sqrt(evap.rho0 / rho) \
                * Dr / APS.nu_air
            a_vent_0 = evap.av * 0.15344374450453543
            b_vent_0 = evap.bv * 0.17380986321413017
            a_vent_1 = evap.av * 0.5503212081491045
            b_vent_1 = evap.bv * 0.5873135598802672
            cbrt_sc = (APS.nu_air / APS.D_vapor) ** (1 / 3)
            Fv0 = a_vent_0 + b_vent_0 * cbrt_sc * np.sqrt(N_Re)
            Fv1 = a_vent_1 + b_vent_1 * cbrt_sc * np.sqrt(N_Re)
            ref_dn = 2 * np.pi * G * S * N_rai * Dr * Fv0 / xr
            ref_dq = 2 * np.pi * G * S * N_rai * Dr * Fv1 / rho
            np.testing.assert_allclose(float(dn), ref_dn, rtol=1e-4)
            np.testing.assert_allclose(float(dq), ref_dq, rtol=1e-5)
        # zero inputs
        dn, _ = m2.rain_evaporation(
            SB, APS, TPS, F64(q_tot), F64(0.0), F64(0.0), F64(q_rai),
            F64(0.0), F64(rho), F64(0.0), F64(T))
        assert float(dn) == 0
        _, dq = m2.rain_evaporation(
            SB_NL, APS, TPS, F64(q_tot), F64(0.0), F64(0.0), F64(0.0),
            F64(0.0), F64(rho), F64(N_rai), F64(T))
        assert float(dq) == 0
