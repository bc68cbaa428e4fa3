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
ncol, nlev = int(os.environ.get('PN', 2048)), 64
N = ncol * nlev
rng = np.random.default_rng(0)
r = lambda lo, hi: jnp.asarray(np.exp(rng.uniform(np.log(lo), np.log(hi), (ncol, nlev))), jnp.float32)
st = ColumnStateP3(rho=r(0.6, 1.2), T=r(240., 272.), q_tot=r(1e-3, 8e-3),
                   q_lcl=r(1e-5, 2e-3), n_lcl=r(1e7, 2e8), q_rai=r(1e-6, 1e-3),
                   n_rai=r(1e4, 2e6), q_ice=r(1e-5, 2e-3), n_ice=r(1e4, 1e6),
                   q_rim=r(1e-6, 5e-4), b_rim=r(2e-9, 1e-6))
ice = mp.ice

def pstate(s):
    return P3.state_from_prognostic(ice.scheme, s.q_ice*s.rho, s.n_ice*s.rho,
                                    s.q_rim*s.rho, s.b_rim*s.rho)
ps = pstate(st)
ll = jax.block_until_ready(P3.get_distribution_loglambda(ps))

def bench(name, fn, n=10):
    # vary an input each call (scale rho slightly) to defeat any
    # identical-call result caching in the runtime
    g = jax.jit(fn)
    scales = [jnp.float32(1.0 + 1e-6 * i) for i in range(n + 1)]
    o = jax.block_until_ready(g(st, ll, scales[-1]))
    t0 = time.perf_counter()
    for i in range(n):
        o = g(st, ll, scales[i])
    jax.block_until_ready(o)
    dt = time.perf_counter() - t0
    print(f"{name:24s} {dt/n*1e3:8.2f} ms/call  {N*n/dt:.3g} pts/s")

bench("shape_solve", lambda s, g, c: P3.get_distribution_loglambda(
    pstate(s._replace(rho=s.rho*c))))
bench("warm_rain_2m", lambda s, g, c: warm_rain_tendencies_2m(
    mp.warm_rain, tps, s.T, s.q_tot, s.q_lcl*c, s.q_rai, s.q_ice, s.rho,
    s.n_lcl, s.n_rai))
bench("vel_mass+num", lambda s, g, c: (
    P3.ice_terminal_velocity_mass_weighted(ice.terminal_velocity, s.rho*c, pstate(s), g, quad=ice.quad),
    P3.ice_terminal_velocity_number_weighted(ice.terminal_velocity, s.rho*c, pstate(s), g, quad=ice.quad)))
bench("self_collection", lambda s, g, c: P3P.ice_self_collection(
    pstate(s), g, ice.terminal_velocity, s.rho*c, quad=ice.quad))
bench("melt", lambda s, g, c: P3P.ice_melt(
    ice.terminal_velocity, mp.warm_rain.air_properties, tps, s.T, s.rho*c,
    pstate(s), g, quad=ice.quad))
bench("collisions", lambda s, g, c: P3P.bulk_liquid_ice_collision_sources(
    pstate(s), g, ice.cloud_pdf, ice.rain_pdf, s.q_lcl*s.rho*c, s.n_lcl*s.rho,
    s.q_rai*s.rho, s.n_rai*s.rho, mp.warm_rain.air_properties, tps,
    ice.terminal_velocity, s.rho, s.T, quad=ice.quad))
bench("full_step", lambda s, g, c: step_column_p3(
    s._replace(rho=s.rho*c), mp, tps, 1.0, 100.0, g))
