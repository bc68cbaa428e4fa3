import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import time
import jax, jax.numpy as jnp, numpy as np
from cloudmicrophysics_tpu.models.column import ColumnStateP3, step_column_p3
from cloudmicrophysics_tpu.models.tendencies import warm_rain_tendencies_2m, bulk_tendencies_2m
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.ops import p3_processes as P3P
from cloudmicrophysics_tpu.parameters import ThermodynamicsParameters, microphysics_2m_params

mp = microphysics_2m_params(with_ice=True)
tps = ThermodynamicsParameters()
import os
ncol, nlev = int(os.environ.get('PN', 512)), 64
N = ncol * nlev
f = lambda v: jnp.full((ncol, nlev), v, jnp.float32)
st = ColumnStateP3(rho=f(1.1), T=f(263.0), q_tot=f(6e-3), q_lcl=f(1e-3),
                   n_lcl=f(9e7), q_rai=f(5e-4), n_rai=f(9e5), q_ice=f(5e-4),
                   n_ice=f(1e5), q_rim=f(1e-4), b_rim=f(2e-7))
rho = st.rho
ice = mp.ice

def pstate(s):
    return P3.state_from_prognostic(ice.scheme, s.q_ice*s.rho, s.n_ice*s.rho,
                                    s.q_rim*s.rho, s.b_rim*s.rho)
ps = pstate(st)
ll = P3.get_distribution_loglambda(ps)

def _force(o):
    # host readback = the only trustworthy fence on the remote platform
    leaves = jax.tree_util.tree_leaves(o)
    return float(jnp.sum(leaves[0]))


def bench(name, fn, *args, n=20):
    g = jax.jit(fn)
    o = g(*args); _force(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = g(*args)
    _force(o)
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt/n*1e3:8.2f} ms/call  {N*n/dt:.3g} pts/s", flush=True)

bench("state+shape_solve", lambda s: P3.get_distribution_loglambda(pstate(s)), st)
bench("state+shape_solve warm", lambda s, g: P3.get_distribution_loglambda(pstate(s), g), st, ll)
bench("warm_rain_2m", lambda s: warm_rain_tendencies_2m(
    mp.warm_rain, tps, s.T, s.q_tot, s.q_lcl, s.q_rai, s.q_ice, s.rho,
    s.n_lcl, s.n_rai), st)
bench("vel_mass+num", lambda s, g: (
    P3.ice_terminal_velocity_mass_weighted(ice.terminal_velocity, s.rho, pstate(s), g, quad=ice.quad),
    P3.ice_terminal_velocity_number_weighted(ice.terminal_velocity, s.rho, pstate(s), g, quad=ice.quad)), st, ll)
bench("self_collection", lambda s, g: P3P.ice_self_collection(
    pstate(s), g, ice.terminal_velocity, s.rho, quad=ice.quad), st, ll)
bench("melt", lambda s, g: P3P.ice_melt(
    ice.terminal_velocity, mp.warm_rain.air_properties, tps, s.T, s.rho,
    pstate(s), g, quad=ice.quad), st, ll)
bench("collisions", lambda s, g: P3P.bulk_liquid_ice_collision_sources(
    pstate(s), g, ice.cloud_pdf, ice.rain_pdf, s.q_lcl*s.rho, s.n_lcl*s.rho,
    s.q_rai*s.rho, s.n_rai*s.rho, mp.warm_rain.air_properties, tps,
    ice.terminal_velocity, s.rho, s.T, quad=ice.quad), st, ll)
bench("full_tendencies", lambda s, g: bulk_tendencies_2m(
    mp, tps, s.rho, s.T, s.q_tot, s.q_lcl, s.n_lcl, s.q_rai, s.n_rai,
    s.q_ice, s.n_ice, s.q_rim, s.b_rim, g), st, ll)
bench("full_step", lambda s, g: step_column_p3(s, mp, tps, 1.0, 100.0, g), st, ll)
