"""Physics operators (L2-L4): pure elementwise process-rate functions."""

from . import common, diagnostics, m0, m1, m2, noneq, states, susceptibility, thermo
from .states import MicroState, MicroState2M, ThermoState
