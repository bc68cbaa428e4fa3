"""Element-weighted transcendental attribution for the 2M+P3 kernel.

Parses optimized HLO (CPU backend — fusion boundaries differ from TPU but
elementwise transcendental COUNTS do not) and sums element counts per
op class for each P3 component at a given quadrature order. This is the
measurement behind the round-5 per-point op-budget work: it says where
the exp-equivalents actually are before we cut them.

Usage: PN=64 GL=16 python benchmarks/scratch/profile_p3_budget.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import os
import re
import jax
import jax.numpy as jnp
import numpy as np

from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.ops import p3_processes as P3P
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters, microphysics_2m_params)

GL = int(os.environ.get("GL", 16))
N = int(os.environ.get("PN", 64))
mp = microphysics_2m_params(with_ice=True, quadrature_order=GL)
tps = ThermodynamicsParameters()
ice = mp.ice
f = lambda v: jnp.full((N,), v, jnp.float32)
rho, T = f(1.1), f(263.0)
qt, ql, nl, qr, nr = f(4e-3), f(5e-4), f(9e7), f(2e-4), f(9e5)
qi, ni, qrim, brim = f(1e-4), f(9e4), f(3e-5), f(3e-5 / 400)

ps = P3.state_from_prognostic(ice.scheme, qi * rho, ni * rho, qrim * rho,
                              brim * rho)
ll = P3.get_distribution_loglambda(ps)

# element-weighted transcendental classes; divide/sqrt are cheaper than
# exp on VPU but far from free — reported separately
TRANS = ("exponential", "log", "power", "tanh", "logistic",
         "exponential-minus-one", "log-plus-one", "atan2", "erf")
CHEAP = ("divide", "sqrt", "rsqrt", "cbrt")
_SHAPE = re.compile(r"f(?:32|64)\[([0-9,]*)\]")


def count(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    out = {"trans": 0, "cheap": 0}
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"^(?:ROOT )?[%\w.\-]+ = (\S+?) (\S+)\(", line)
        if not m:
            continue
        shape_s, op = m.group(1), m.group(2)
        base = op.split(".")[0]
        cls = None
        if base in TRANS:
            cls = "trans"
        elif base in CHEAP:
            cls = "cheap"
        if cls is None:
            continue
        sm = _SHAPE.match(shape_s)
        if not sm:
            continue
        dims = sm.group(1)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        out[cls] += n
    return out


def report(name, fn, *args):
    c = count(fn, *args)
    print(f"{name:30s} trans/pt {c['trans']/N:10.0f}   "
          f"div+sqrt/pt {c['cheap']/N:10.0f}", flush=True)
    return c


print(f"GL={GL}, N={N}")
report("nodes (bounds+vel+psd)",
       lambda ps, ll, rho: P3.ice_quadrature_nodes(
           ice.terminal_velocity, rho, ps, ll, 1e-6, ice.quad),
       ps, ll, rho)
nodes = P3.ice_quadrature_nodes(ice.terminal_velocity, rho, ps, ll, 1e-6,
                                ice.quad)
report("collisions (w/ nodes)",
       lambda ps, ll, nodes, rho, T, ql, nl, qr, nr:
       P3P.bulk_liquid_ice_collision_sources(
           ps, ll, ice.cloud_pdf, ice.rain_pdf, ql * rho, nl * rho,
           qr * rho, nr * rho, mp.warm_rain.air_properties, tps,
           ice.terminal_velocity, rho, T, quad=ice.quad, ice_nodes=nodes),
       ps, ll, nodes, rho, T, ql, nl, qr, nr)
report("self_collection (w/ nodes)",
       lambda ps, ll, nodes, rho: P3P.ice_self_collection(
           ps, ll, ice.terminal_velocity, rho, quad=ice.quad, nodes=nodes),
       ps, ll, nodes, rho)
report("melt (w/ nodes)",
       lambda ps, ll, nodes, rho, T: P3P.ice_melt(
           ice.terminal_velocity, mp.warm_rain.air_properties, tps, T, rho,
           ps, ll, quad=ice.quad, nodes=nodes),
       ps, ll, nodes, rho, T)
report("vel mass+num (w/ nodes)",
       lambda ps, ll, nodes, rho: (
           P3.ice_terminal_velocity_mass_weighted(
               ice.terminal_velocity, rho, ps, ll, nodes=nodes),
           P3.ice_terminal_velocity_number_weighted(
               ice.terminal_velocity, rho, ps, ll, nodes=nodes)),
       ps, ll, nodes, rho)
report("shape solver (cold)",
       lambda ps: P3.get_distribution_loglambda(ps), ps)
report("full bulk_tendencies_2m",
       lambda rho, T, qt, ql, nl, qr, nr, qi, ni, qrim, brim, ll:
       bulk_tendencies_2m(mp, tps, rho, T, qt, ql, nl, qr, nr, qi, ni,
                          qrim, brim, ll),
       rho, T, qt, ql, nl, qr, nr, qi, ni, qrim, brim, ll)

# --- pointwise physics breakdown (the "unaccounted" remainder) ---
from cloudmicrophysics_tpu.models.tendencies import warm_rain_tendencies_2m
from cloudmicrophysics_tpu.models import p3_tendencies as P3T
from cloudmicrophysics_tpu.ops import ice_nucleation as CMI
from cloudmicrophysics_tpu.ops import m2 as CM2

report("warm_rain_2m", lambda rho, T, qt, ql, nl, qr, nr:
       warm_rain_tendencies_2m(mp.warm_rain, tps, T, qt, ql, qr, 0.0,
                               rho, nl, nr)
       if True else None, rho, T, qt, ql, nl, qr, nr)
report("bigg cloud", lambda ql, rho, nl, T: CMI.liquid_freezing_rate_cloud(
    ice.rain_freezing, ice.cloud_pdf, tps, ql, rho, nl * rho, T),
    ql, rho, nl, T)
report("bigg rain", lambda qr, rho, nr, T: CMI.liquid_freezing_rate_rain(
    ice.rain_freezing, ice.rain_pdf, tps, qr, rho, nr * rho, T),
    qr, rho, nr, T)
report("f23 dep+cap", lambda T, rho, qt, ql, qr, qi, ni: (
    CMI.deposition_rate_frostenberg(
        ice.ice_nucleation, tps, T, rho, qt, ql + qr, qi,
        CMI.n_active(ice.inp_depletion_model, ni), 1e-12,
        tau_act=ice.inp_depletion_model.tau_act, inpc_log_shift=0.0),
    CMI.immersion_limit_rate(ice.ice_nucleation, T, rho,
                             tau=ice.inp_depletion_model.tau_act,
                             inpc_log_shift=0.0,
                             n_active_proxy=CMI.n_active(
                                 ice.inp_depletion_model, ni))),
    T, rho, qt, ql, qr, qi, ni)
report("p3_step_aux (state+nodes)", lambda rho, qi, ni, qrim, brim, ll:
       P3T.p3_step_aux(mp, rho, qi, ni, qrim, brim, ll),
       rho, qi, ni, qrim, brim, ll)
