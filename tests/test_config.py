"""Flat-TOML parameter-override pipeline tests.

Mirrors the reference's ClimaParams override route
(src/parameters/Parameters.jl:62-74 + src/parameters/toml/)."""

import math

import pytest

from cloudmicrophysics_tpu.parameters import (
    calibrated_overrides,
    load_toml_overrides,
    microphysics_1m_params,
    microphysics_1m_params_from_overrides,
)
from cloudmicrophysics_tpu.parameters.config import (
    aerosol_activation_params_from_overrides,
    microphysics_2m_params_from_overrides,
    sb2006_from_overrides,
)


class TestLoader:
    def test_table_form(self):
        ov = load_toml_overrides(
            "[rain_autoconversion_timescale]\nvalue = 2500.0\n")
        assert ov == {"rain_autoconversion_timescale": 2500.0}

    def test_flat_form(self):
        # flat keys must precede any [table] per TOML semantics
        ov = load_toml_overrides(
            "rain_ventilation_coefficient_b = 0.9\n"
            "[rain_autoconversion_timescale]\nvalue = 2500.0\n")
        assert ov == {"rain_ventilation_coefficient_b": 0.9,
                      "rain_autoconversion_timescale": 2500.0}

    def test_missing_value_key_raises(self):
        with pytest.raises(ValueError, match="no 'value' key"):
            load_toml_overrides("[rain_autoconversion_timescale]\nx = 1\n")

    def test_unknown_name_strict(self):
        with pytest.raises(KeyError, match="unknown override parameter"):
            microphysics_1m_params_from_overrides({"not_a_param": 1.0})
        # non-strict silently skips
        mp = microphysics_1m_params_from_overrides({"not_a_param": 1.0},
                                                   strict=False)
        assert mp == microphysics_1m_params()

    def test_shipped_sets_load(self):
        for name in ("CliMA_1M", "ARG2000", "SB2006_limiters"):
            ov = calibrated_overrides(name)
            assert len(ov) >= 4
        with pytest.raises(FileNotFoundError):
            calibrated_overrides("nope")


class TestCliMA1M:
    def test_calibrated_set_rederives_precomputes(self):
        ov = calibrated_overrides("CliMA_1M")
        mp = microphysics_1m_params_from_overrides(ov)
        # raw coefficients landed in the right structs
        assert mp.process_params.rain_autoconversion.tau == pytest.approx(
            13353.890619526366)
        assert mp.process_params.cloud_liquid_formation.tau_relax == \
            pytest.approx(39.688722877923894)
        assert mp.precip.rain.area.chia == pytest.approx(16.60537462650898)
        assert mp.precip.rain.area.da == pytest.approx(2.997519288341676)
        assert mp.precip.rain.vent.b == pytest.approx(0.9779279811508783)
        vr = mp.terminal_velocity.rain
        assert vr.chiv == pytest.approx(0.20454276658307452)
        assert vr.dv == pytest.approx(0.22763691994393714)
        # gamma precomputes re-derived with the overridden exponents
        assert vr.gamma_term == pytest.approx(
            math.gamma(3.0 + 0.5 + 0.0 + 0.22763691994393714 + 1))
        assert vr.gamma_vent == pytest.approx(
            math.gamma((0.5 + 0.22763691994393714 + 5) / 2))

    def test_untouched_fields_keep_defaults(self):
        mp = microphysics_1m_params_from_overrides(
            {"rain_autoconversion_timescale": 2500.0})
        base = microphysics_1m_params()
        assert mp.process_params.rain_autoconversion.tau == 2500.0
        assert mp.precip == base.precip
        assert mp.terminal_velocity == base.terminal_velocity


class TestARG2000:
    def test_calibrated_fit(self):
        ap = aerosol_activation_params_from_overrides(
            calibrated_overrides("ARG2000"))
        assert ap.f1 == pytest.approx(0.26583888195264627)
        assert ap.p2 == pytest.approx(0.7578626397779737)
        assert ap.sigma == 0.072  # untouched default


class TestSB2006:
    def test_limiter_overrides(self):
        sb = sb2006_from_overrides(calibrated_overrides("SB2006_limiters"))
        assert sb.pdf_r.N0_max == pytest.approx(2e11)
        assert sb.pdf_r.xr_min == pytest.approx(6.54e-11)
        assert sb.pdf_r.is_limited is True

    def test_2m_container_route(self):
        mp = microphysics_2m_params_from_overrides(
            calibrated_overrides("SB2006_limiters"))
        assert mp.warm_rain.seifert_beheng.pdf_r.N0_max == pytest.approx(2e11)
        assert mp.ice is None
