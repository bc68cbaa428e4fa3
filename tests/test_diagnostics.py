"""CloudDiagnostics + PrecipitationSusceptibility + 2M BMT tests.

Mirrors /root/reference/test/cloud_diagnostics.jl and
precipitation_susceptibility_tests.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m
from cloudmicrophysics_tpu.ops import diagnostics as CMD
from cloudmicrophysics_tpu.ops import susceptibility as CMPS
from cloudmicrophysics_tpu.parameters import ThermodynamicsParameters
from cloudmicrophysics_tpu.parameters import m2 as P2
from cloudmicrophysics_tpu.parameters.m1 import microphysics_1m_params
from cloudmicrophysics_tpu.parameters.m2 import microphysics_2m_params

TPS = ThermodynamicsParameters()
SB = P2.sb2006()
F = jnp.float64


class TestRadarReflectivity:
    def test_1m_golden(self):
        # reference test/cloud_diagnostics.jl:35-40
        mp = microphysics_1m_params()
        z1 = CMD.radar_reflectivity_1m(mp.precip.rain, F(0.18e-3), F(1.0))
        np.testing.assert_allclose(float(z1), 12.17, atol=0.2)
        z2 = CMD.radar_reflectivity_1m(mp.precip.rain, F(0.89e-4), F(1.0))
        np.testing.assert_allclose(float(z2), 6.68, atol=0.2)

    def test_1m_clipped(self):
        mp = microphysics_1m_params()
        z = CMD.radar_reflectivity_1m(mp.precip.rain, F(0.0), F(1.0))
        assert float(z) >= -150.0

    def test_2m_finite_and_monotone(self):
        z_lo = CMD.radar_reflectivity_2m(
            SB, F(1e-4), F(1e-5), F(1e8), F(1e4), F(1.1))
        z_hi = CMD.radar_reflectivity_2m(
            SB, F(1e-3), F(1e-3), F(1e8), F(1e4), F(1.1))
        assert np.isfinite(float(z_lo)) and np.isfinite(float(z_hi))
        assert float(z_hi) > float(z_lo)
        # degenerate input clipped at -150
        z0 = CMD.radar_reflectivity_2m(
            SB, F(0.0), F(0.0), F(0.0), F(0.0), F(1.1))
        assert float(z0) == -150.0


class TestEffectiveRadius:
    def test_2m_plausible(self):
        re = CMD.effective_radius_2m(
            SB, F(1e-3), F(1e-5), F(1e8), F(1e4), F(1.1))
        assert 1e-6 < float(re) < 1e-4  # microns to tens of microns
        re0 = CMD.effective_radius_2m(
            SB, F(0.0), F(0.0), F(0.0), F(0.0), F(1.1))
        assert float(re0) == 0.0

    def test_liu_hallet_golden(self):
        # reference test/cloud_diagnostics.jl:107 (r_eff ~ 2.66e-5)
        re = CMD.effective_radius_liu_hallet_97(
            1000.0, F(1.0), F(5e-3), F(1e8), F(1e-4), F(1e4))
        np.testing.assert_allclose(float(re), 2.66e-5, atol=8e-6)

    def test_const(self):
        mp = microphysics_1m_params()
        assert CMD.effective_radius_const(mp.cloud.liquid) == 14e-6
        assert CMD.effective_radius_const(mp.cloud.ice) == 25e-6


class TestPrecipSusceptibility:
    """Analytic Glassmeier & Lohmann identities
    (reference test/precipitation_susceptibility_tests.jl)."""

    Q_LCL, N_LCL, Q_RAI, RHO = 0.5e-3, 1e8, 1e-5, 1.0

    def _d_ln_phi_au_d_ln_tau(self, acnv, tau):
        A, a, b = acnv.A, acnv.a, acnv.b
        return -(
            A * tau**a * (1 - tau**a) ** (b - 1)
            * (a * (tau - 1) * ((b + 1) * tau**a - 1)
               - 2 * tau * (tau**a - 1))
        ) / (A * (tau - 1) * tau**a * (1 - tau**a) ** b + (tau - 1) ** 3)

    def test_autoconversion(self):
        tau = 1 - self.Q_LCL / (self.Q_LCL + self.Q_RAI)
        rates = CMPS.precipitation_susceptibility_autoconversion(
            SB, F(self.Q_LCL), F(self.Q_RAI), F(self.RHO), F(self.N_LCL))
        d_phi = self._d_ln_phi_au_d_ln_tau(SB.acnv, tau)
        np.testing.assert_allclose(
            float(rates.d_ln_pp_d_ln_N_lcl), -2.0, rtol=1e-6)
        np.testing.assert_allclose(
            float(rates.d_ln_pp_d_ln_q_lcl), 4 - (1 - tau) * d_phi, rtol=1e-6)
        np.testing.assert_allclose(
            float(rates.d_ln_pp_d_ln_q_rai), (1 - tau) * d_phi, rtol=1e-6)

    def test_accretion(self):
        tau = 1 - self.Q_LCL / (self.Q_LCL + self.Q_RAI)
        rates = CMPS.precipitation_susceptibility_accretion(
            SB, F(self.Q_LCL), F(self.Q_RAI), F(self.RHO), F(self.N_LCL))
        d_phi = (SB.accr.c * SB.accr.tau0) / (tau + SB.accr.tau0)
        np.testing.assert_allclose(
            float(rates.d_ln_pp_d_ln_q_lcl), 1 - (1 - tau) * d_phi, rtol=1e-6)
        np.testing.assert_allclose(
            float(rates.d_ln_pp_d_ln_q_rai), 1 + (1 - tau) * d_phi, rtol=1e-6)


class TestBMT2M:
    def test_warm_rain_signs(self):
        mp2 = microphysics_2m_params()
        out = bulk_tendencies_2m(
            mp2, TPS, F(1.1), F(288.15), F(1.2e-2), F(1e-3), F(1e8 / 1.1),
            F(5e-4), F(1e4 / 1.1))
        # autoconversion+accretion move mass cloud -> rain
        assert float(out.dq_lcl_dt) < 0
        assert float(out.dq_rai_dt) > 0
        assert float(out.dn_lcl_dt) < 0
        # ice fields zero in warm-only mode
        assert float(out.dq_ice_dt) == 0
        assert float(out.dq_rim_dt) == 0
        assert float(out.db_rim_dt) == 0

    def test_fused_jit_sweep(self, dtype):
        mp2 = microphysics_2m_params()
        n = 64
        q = jnp.asarray(np.geomspace(1e-10, 5e-3, n), dtype)
        args = (jnp.full((n,), 1.1, dtype), jnp.full((n,), 285.0, dtype),
                jnp.full((n,), 1.2e-2, dtype), q, jnp.full((n,), 1e8, dtype),
                q / 2, jnp.full((n,), 1e4, dtype))
        out = jax.jit(lambda *a: bulk_tendencies_2m(mp2, TPS, *a))(*args)
        for leaf in out:
            assert np.all(np.isfinite(leaf))

    def test_no_limiters_variant(self):
        mp2 = microphysics_2m_params(is_limited=False)
        out = bulk_tendencies_2m(
            mp2, TPS, F(1.1), F(288.15), F(1.2e-2), F(1e-3), F(1e8 / 1.1),
            F(5e-4), F(1e4 / 1.1))
        for v in out:
            assert np.isfinite(float(v))
