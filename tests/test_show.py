"""Parameter-struct display tests (reference test/show_utils.jl)."""

from cloudmicrophysics_tpu.parameters import (
    AirProperties,
    Parameters0M,
    microphysics_1m_params,
)
from cloudmicrophysics_tpu.utils import field_units, show_params


class TestShow:
    def test_verbose_has_units(self):
        out = show_params(AirProperties(), "verbose")
        assert "AirProperties:" in out
        assert "[W/m/K]" in out and "[m^2/s]" in out

    def test_compact_single_line(self):
        out = show_params(Parameters0M(), "compact")
        assert "\n" not in out
        assert out.startswith("Parameters0M(")
        assert "tau_precip=1000" in out

    def test_parseable_roundtrips(self):
        p = Parameters0M()
        out = show_params(p, "parseable")
        ns = {"Parameters0M": Parameters0M}
        assert eval(out, ns) == p

    def test_nested_tree(self):
        out = show_params(microphysics_1m_params(), "verbose")
        # nested paramclasses are rendered with indentation
        assert "Rain" in out and "Snow" in out
        assert "  " in out

    def test_field_units_lookup(self):
        assert field_units(AirProperties(), "K_therm") == "W/m/K"
        assert field_units(AirProperties(), "no_such_field") == ""
