"""Driver-layer wiring tests.

Covers the parameter-tree plumbing the round-3 review flagged:

* Frostenberg2023 lives in ``P3IceParams.ice_nucleation`` and perturbing it
  changes the F23 deposition / immersion-cap tendencies (reference
  ``src/parameters/Microphysics2MParams.jl:65,101``);
* ``IceNumberAdjustment`` params drive the ice number adjustment
  (reference ``src/BulkMicrophysicsTendencies.jl:1056-1064``);
* the 2M column rain fall speed dispatches on the params tree
  (SB2006 vs Chen2022, reference ``src/Microphysics2M.jl:685-739``);
* ``initialize_distributed`` guard logic;
* column energy coupling uses T-dependent latent heats / moist cp from
  ``ops/thermo`` (reference ``src/ThermodynamicsInterface.jl:9-125``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.parameters import microphysics_2m_params
from cloudmicrophysics_tpu.parameters.ice_nucleation import Frostenberg2023
from cloudmicrophysics_tpu.parameters.thermodynamics import (
    ThermodynamicsParameters,
)
from cloudmicrophysics_tpu.utils.param import replace

TPS = ThermodynamicsParameters()


def _p3_tendencies(mp, T=253.0):
    from cloudmicrophysics_tpu.models import tendencies as BMT

    rho = jnp.float64(1.1)
    # n_ice well below INPC(T)/rho so the F23 deposition / immersion-cap
    # budgets are unfilled (active); mean ice mass q/n above x_max so the
    # number adjustment is active too
    args = dict(q_tot=6e-3, q_lcl=1e-3, n_lcl=1e8, q_rai=5e-4, n_rai=1e6,
                q_ice=5e-4, n_ice=10.0, q_rim=1e-4, b_rim=2e-7,
                log_lambda=8.0)
    return BMT.bulk_tendencies_2m(mp, TPS, rho, jnp.float64(T), **args)


class TestF23Plumbing:
    def test_default_slot_is_frostenberg(self):
        mp = microphysics_2m_params(with_ice=True)
        assert isinstance(mp.ice.ice_nucleation, Frostenberg2023)

    def test_no_hardcoded_f23_in_models(self):
        # the container is the single source of the F23 climatology
        import inspect

        import cloudmicrophysics_tpu.models.p3_tendencies as m

        assert "Frostenberg2023()" not in inspect.getsource(m)

    def test_perturbed_f23_changes_ice_tendencies(self):
        mp = microphysics_2m_params(with_ice=True)
        # cooler effective INPC curve: perturb the climatology coefficients
        f23 = replace(mp.ice.ice_nucleation, a=1.5, b=1.2)
        mp_pert = replace(mp, ice=replace(mp.ice, ice_nucleation=f23))

        base = _p3_tendencies(mp)
        pert = _p3_tendencies(mp_pert)
        # F23 drives deposition nucleation (dq_ice, dn_ice) and the
        # immersion cap (dn_lcl): a perturbed climatology must move them
        assert not np.allclose(np.asarray(base.dn_ice_dt),
                               np.asarray(pert.dn_ice_dt))
        assert not np.allclose(np.asarray(base.dn_lcl_dt),
                               np.asarray(pert.dn_lcl_dt))

    def test_numadj_params_drive_adjustment(self):
        mp = microphysics_2m_params(with_ice=True)
        assert mp.ice.numadj.tau == 100.0
        assert mp.ice.numadj.x_min == 1e-12
        assert mp.ice.numadj.x_max == 1e-5
        # halving tau doubles the (relaxation) number-adjustment tendency;
        # pick a state where the adjustment is active (mean mass too big)
        na_fast = replace(mp.ice.numadj, tau=50.0)
        mp_fast = replace(mp, ice=replace(mp.ice, numadj=na_fast))
        from cloudmicrophysics_tpu.ops.m2 import (
            number_tendency_from_mass_limits,
        )

        q_ice, n_ice = 5e-4, 1.0  # mean mass 5e-4 kg >> x_max
        expected = number_tendency_from_mass_limits(
            mp.ice.numadj.x_min, mp.ice.numadj.x_max, mp.ice.numadj.tau,
            q_ice, n_ice)
        expected_fast = number_tendency_from_mass_limits(
            na_fast.x_min, na_fast.x_max, na_fast.tau, q_ice, n_ice)
        assert float(expected) != 0.0
        np.testing.assert_allclose(float(expected_fast), 2 * float(expected),
                                   rtol=1e-12)
        base = _p3_tendencies(mp)
        fast = _p3_tendencies(mp_fast)
        assert not np.allclose(np.asarray(base.dn_ice_dt),
                               np.asarray(fast.dn_ice_dt))


class TestRainVelocityDispatch:
    def _state(self, ncol=2, nlev=4):
        from cloudmicrophysics_tpu.models.column import ColumnState2M

        f = lambda v: jnp.full((ncol, nlev), v, jnp.float64)
        return ColumnState2M(rho=f(1.1), T=f(288.0), q_tot=f(8e-3),
                             q_lcl=f(1e-3), n_lcl=f(1e8),
                             q_rai=f(1e-3), n_rai=f(1e6))

    def test_container_dispatch(self):
        from cloudmicrophysics_tpu.models.column import _chen_or_sb
        from cloudmicrophysics_tpu.parameters.terminal_velocity import (
            Chen2022VelTypeRain,
            SB2006VelType,
        )

        mp_sb = microphysics_2m_params()
        mp_ch = microphysics_2m_params(rain_velocity="chen2022")
        assert isinstance(_chen_or_sb(mp_sb), SB2006VelType)
        assert isinstance(_chen_or_sb(mp_ch), Chen2022VelTypeRain)

    def test_chen2022_reaches_the_column_step(self):
        from cloudmicrophysics_tpu.models.column import step_column_2m

        st = self._state()
        out_sb = step_column_2m(st, microphysics_2m_params(), TPS, 1.0, 100.0)
        out_ch = step_column_2m(
            st, microphysics_2m_params(rain_velocity="chen2022"),
            TPS, 1.0, 100.0)
        # different fall-speed laws -> different sedimentation tendencies
        assert not np.allclose(np.asarray(out_sb.q_rai),
                               np.asarray(out_ch.q_rai))
        for out in (out_sb, out_ch):
            for name in out._fields:
                assert np.isfinite(np.asarray(getattr(out, name))).all()


class TestInitializeDistributed:
    def test_idempotent_and_single_host_noop(self):
        from cloudmicrophysics_tpu.parallel import comms

        # bare call on a single host: no-op, and repeatable
        comms.initialize_distributed()
        comms.initialize_distributed()

    def test_explicit_bad_config_raises(self):
        from cloudmicrophysics_tpu.parallel import comms

        if comms._distributed_is_initialized():
            pytest.skip("distributed already initialized in this process")
        with pytest.raises(Exception):
            # malformed coordinator spec must NOT be swallowed
            comms.initialize_distributed(coordinator_address="",
                                         num_processes=2, process_id=5)

    def test_guard_reflects_state(self):
        from cloudmicrophysics_tpu.parallel import comms

        # single-host pytest process: the JAX distributed client is not up
        assert comms._distributed_is_initialized() in (False, True)


class TestEnergyCoupling:
    def test_2m_temperature_update_uses_moist_thermo(self):
        from cloudmicrophysics_tpu.models import tendencies as BMT
        from cloudmicrophysics_tpu.models.column import step_column_2m
        from cloudmicrophysics_tpu.ops import thermo as TDI

        mp = microphysics_2m_params()
        f = lambda v: jnp.full((2, 3), v, jnp.float64)
        from cloudmicrophysics_tpu.models.column import ColumnState2M

        st = ColumnState2M(rho=f(1.1), T=f(288.0), q_tot=f(8e-3),
                           q_lcl=f(1e-3), n_lcl=f(1e8),
                           q_rai=f(1e-3), n_rai=f(1e6))
        dt, dz = 1.0, 100.0
        out = step_column_2m(st, mp, TPS, dt, dz)
        rates = BMT.bulk_tendencies_2m(
            mp, TPS, st.rho, st.T, st.q_tot, st.q_lcl, st.n_lcl,
            st.q_rai, st.n_rai)
        Lv = TDI.latent_heat_vapor(TPS, st.T)
        cp = TDI.cp_m(TPS, st.q_tot, st.q_lcl + st.q_rai,
                      jnp.zeros_like(st.q_lcl))
        expect = st.T + dt * Lv / cp * (rates.dq_lcl_dt + rates.dq_rai_dt)
        np.testing.assert_allclose(np.asarray(out.T), np.asarray(expect),
                                   rtol=1e-12)
        # the dry-constant coupling would differ measurably
        wrong = st.T + dt * TPS.LH_v0 / TPS.cp_d * (
            rates.dq_lcl_dt + rates.dq_rai_dt)
        assert not np.allclose(np.asarray(out.T), np.asarray(wrong),
                               rtol=0, atol=0)

    def test_no_constant_latent_heat_in_column(self):
        import inspect

        import cloudmicrophysics_tpu.models.column as col

        src = inspect.getsource(col)
        assert "LH_v0" not in src and "LH_s0" not in src
