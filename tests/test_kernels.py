"""Pallas kernel tests (CPU interpret mode).

The kernels re-invoke the same jnp physics on VMEM tiles, so the test
contract is bit-level-close agreement with the XLA-fused reference path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cloudmicrophysics_tpu.kernels import step_column_1m_pallas
from cloudmicrophysics_tpu.models.column import ColumnState, step_column_1m
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters,
    microphysics_1m_params,
    terminal_velocity_params,
)

MP = microphysics_1m_params()
TPS = ThermodynamicsParameters()
TV = terminal_velocity_params()


def _state(ncol, nlev, dtype):
    rng = np.random.default_rng(7)
    shape = (ncol, nlev)
    return ColumnState(
        rho=jnp.asarray(np.linspace(1.2, 0.4, nlev)[None, :]
                        * np.ones((ncol, 1)), dtype),
        T=jnp.asarray(np.linspace(300.0, 230.0, nlev)[None, :]
                      * np.ones((ncol, 1)), dtype),
        q_tot=jnp.asarray(1e-2 * rng.random(shape), dtype),
        q_lcl=jnp.asarray(1e-3 * rng.random(shape), dtype),
        q_icl=jnp.asarray(5e-4 * rng.random(shape), dtype),
        q_rai=jnp.asarray(5e-4 * rng.random(shape), dtype),
        q_sno=jnp.asarray(5e-4 * rng.random(shape), dtype),
    )


class TestColumn1MPallas:
    def test_matches_xla_fused_path(self):
        state = _state(64, 16, jnp.float32)
        ref = step_column_1m(state, MP, TPS, TV, 1.0, 100.0)
        out = step_column_1m_pallas(state, MP, TPS, TV, 1.0, 100.0,
                                    block_cols=16, interpret=True)
        for name in ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)), rtol=2e-5, atol=2e-9,
                err_msg=name)

    def test_block_independence(self):
        # different tilings give the same answer (columns are independent;
        # the level axis stays whole). ULP-level tolerance, not bitwise:
        # XLA:CPU's vectorized exp/log lowering may round differently for
        # different tile shapes (SIMD width / tail handling), and the fused
        # step is exp/log-heavy by design.
        state = _state(32, 8, jnp.float32)
        a = step_column_1m_pallas(state, MP, TPS, TV, 1.0, 100.0,
                                  block_cols=32, interpret=True)
        b = step_column_1m_pallas(state, MP, TPS, TV, 1.0, 100.0,
                                  block_cols=8, interpret=True)
        for name in a._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                rtol=1e-6, atol=0.0, err_msg=name)

    def test_bad_tiling_raises(self):
        state = _state(20, 8, jnp.float32)
        with pytest.raises(ValueError, match="not a multiple"):
            step_column_1m_pallas(state, MP, TPS, TV, 1.0, 100.0,
                                  block_cols=16, interpret=True)

    def test_q_tot_affine_matches_prescaled_input(self):
        # in-kernel q_tot affine == scaling the field before the call
        state = _state(16, 8, jnp.float32)
        a = step_column_1m_pallas(
            state._replace(q_tot=state.q_tot * 1.01 + 2e-9),
            MP, TPS, TV, 1.0, 100.0, block_cols=8, interpret=True)
        b = step_column_1m_pallas(
            state, MP, TPS, TV, 1.0, 100.0, block_cols=8, interpret=True,
            q_tot_affine=(1.01, 2e-9))
        for name in a._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                rtol=1e-6, err_msg=name)

    def test_packed_state_matches_xla(self):
        from cloudmicrophysics_tpu.kernels.column1m import (
            pack_state, step_column_1m_pallas_packed, unpack_state)

        state = _state(16, 8, jnp.float32)
        ref = step_column_1m(state, MP, TPS, TV, 1.0, 100.0)
        packed = pack_state(state)
        rt = unpack_state(packed)
        for name in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(state, name)),
                np.asarray(getattr(rt, name)), err_msg=name)
        out = unpack_state(step_column_1m_pallas_packed(
            packed, MP, TPS, TV, 1.0, 100.0, block_cols=8, interpret=True))
        for name in ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(ref, name)),
                np.asarray(getattr(out, name)), rtol=2e-5, atol=2e-9,
                err_msg=name)


class TestColumn2MPallas:
    @staticmethod
    def _state():
        from cloudmicrophysics_tpu.models.column import ColumnState2M

        f = lambda v: jnp.full((32, 8), v, jnp.float32)
        return ColumnState2M(rho=f(1.1), T=f(288.0), q_tot=f(6e-3),
                             q_lcl=f(1e-3), n_lcl=f(9e7), q_rai=f(5e-4),
                             n_rai=f(9e5))

    def test_matches_xla_fused_path(self):
        from cloudmicrophysics_tpu.kernels import step_column_2m_pallas
        from cloudmicrophysics_tpu.models.column import step_column_2m
        from cloudmicrophysics_tpu.parameters import microphysics_2m_params

        mp = microphysics_2m_params()
        st = self._state()
        ref = step_column_2m(st, mp, TPS, 1.0, 100.0)
        out = step_column_2m_pallas(st, mp, TPS, 1.0, 100.0,
                                    block_cols=8, interpret=True)
        for name in ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)), rtol=2e-5, atol=1e-8,
                err_msg=name)

    def test_packed_state_matches_xla(self):
        from cloudmicrophysics_tpu.kernels.column2m import (
            pack_state_2m,
            step_column_2m_pallas_packed,
            unpack_state_2m,
        )
        from cloudmicrophysics_tpu.models.column import step_column_2m
        from cloudmicrophysics_tpu.parameters import microphysics_2m_params

        mp = microphysics_2m_params()
        st = self._state()
        packed = pack_state_2m(st)
        rt = unpack_state_2m(packed)
        for name in st._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(st, name)),
                np.asarray(getattr(rt, name)), err_msg=name)
        # in-kernel q_tot affine == pre-scaling the field
        ref = step_column_2m(st._replace(q_tot=st.q_tot * 1.01 + 2e-9),
                             mp, TPS, 1.0, 100.0)
        out = unpack_state_2m(step_column_2m_pallas_packed(
            packed, mp, TPS, 1.0, 100.0, block_cols=8, interpret=True,
            q_tot_affine=(1.01, 2e-9)))
        for name in ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)), rtol=2e-5, atol=1e-8,
                err_msg=name)


class TestColumnP3Pallas:
    # GL-4 + an (8, 4) tile: parity between the Pallas and XLA paths
    # holds at any order, and interpret-mode cost scales with
    # (cells x quadrature nodes^2) — order 16 at (16, 4) took ~290 s of
    # the suite's budget for identical coverage
    ORDER = 4

    def _state(self):
        from cloudmicrophysics_tpu.models.column import ColumnStateP3

        f = lambda v: jnp.full((8, 4), v, jnp.float32)
        return ColumnStateP3(
            rho=f(1.1), T=f(263.0), q_tot=f(6e-3), q_lcl=f(1e-3),
            n_lcl=f(9e7), q_rai=f(5e-4), n_rai=f(9e5), q_ice=f(5e-4),
            n_ice=f(1e5), q_rim=f(1e-4), b_rim=f(2e-7))

    def test_matches_xla_fused_path(self):
        from cloudmicrophysics_tpu.kernels import step_column_p3_pallas
        from cloudmicrophysics_tpu.models.column import step_column_p3
        from cloudmicrophysics_tpu.parameters import microphysics_2m_params

        mp = microphysics_2m_params(with_ice=True,
                                    quadrature_order=self.ORDER)
        st = self._state()
        ref, loglam_ref = step_column_p3(st, mp, TPS, 1.0, 100.0)
        out, loglam = step_column_p3_pallas(st, mp, TPS, 1.0, 100.0,
                                            block_cols=4, interpret=True)
        np.testing.assert_allclose(np.asarray(loglam),
                                   np.asarray(loglam_ref), rtol=2e-5)
        for name in ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)), rtol=3e-5, atol=1e-10,
                err_msg=name)

    @pytest.mark.slow
    def test_warm_start_matches(self):
        # slow tier: a second full interpret-mode trace of the P3 kernel
        # — the cold-start parity test above already covers the kernel;
        # this adds only the warm-start operand path
        from cloudmicrophysics_tpu.kernels import step_column_p3_pallas
        from cloudmicrophysics_tpu.models.column import step_column_p3
        from cloudmicrophysics_tpu.parameters import microphysics_2m_params

        mp = microphysics_2m_params(with_ice=True,
                                    quadrature_order=self.ORDER)
        st = self._state()
        st1, loglam1 = step_column_p3(st, mp, TPS, 1.0, 100.0)
        ref, _ = step_column_p3(st1, mp, TPS, 1.0, 100.0, loglam1)
        out, _ = step_column_p3_pallas(st1, mp, TPS, 1.0, 100.0,
                                       loglambda_guess=loglam1,
                                       block_cols=8, interpret=True)
        for name in ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)), rtol=3e-5, atol=1e-10,
                err_msg=name)
