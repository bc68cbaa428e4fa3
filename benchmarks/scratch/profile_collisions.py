"""Sub-profile of bulk_liquid_ice_collision_sources at production batch.

Times each structural piece of the P3 collision kernel in isolation
(outer-node setup, cloud inner quadrature, crossover Brent, gamma-ladder
flux sums, rain rime quadrature) so optimization effort lands on the
real cost center.
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _enable_compile_cache

_enable_compile_cache()

from cloudmicrophysics_tpu.models.column import ColumnStateP3
from cloudmicrophysics_tpu.ops import common as CO
from cloudmicrophysics_tpu.ops import m2 as CM2
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.ops import p3_processes as P3P
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters,
    microphysics_2m_params,
)

mp = microphysics_2m_params(with_ice=True,
                            quadrature_order=int(os.environ.get("ORDER", 16)))
tps = ThermodynamicsParameters()
ncol, nlev = int(os.environ.get("PN", 4096)), 64
N = ncol * nlev
f = lambda v: jnp.full((ncol, nlev), v, jnp.float32)
st = ColumnStateP3(rho=f(1.1), T=f(263.0), q_tot=f(6e-3), q_lcl=f(1e-3),
                   n_lcl=f(9e7), q_rai=f(5e-4), n_rai=f(9e5), q_ice=f(5e-4),
                   n_ice=f(1e5), q_rim=f(1e-4), b_rim=f(2e-7))
ice = mp.ice
quad = ice.quad
pdf_c, pdf_r = ice.cloud_pdf, ice.rain_pdf
vel = ice.terminal_velocity
aps = mp.warm_rain.air_properties


def pstate(s):
    return P3.state_from_prognostic(ice.scheme, s.q_ice * s.rho,
                                    s.n_ice * s.rho, s.q_rim * s.rho,
                                    s.b_rim * s.rho)


ps = pstate(st)
ll = jax.block_until_ready(P3.get_distribution_loglambda(ps))


def _force(o):
    leaves = jax.tree_util.tree_leaves(o)
    return float(sum(jnp.sum(x) for x in leaves))


def bench(name, fn, n=10):
    g = jax.jit(fn)
    o = g(st, ll, jnp.float32(1.0))
    _force(o)
    t0 = time.perf_counter()
    for i in range(n):
        o = g(st, ll, jnp.float32(1.0 + 1e-6 * (i + 1)))
    _force(o)
    dt = time.perf_counter() - t0
    print(f"{name:26s} {dt/n*1e3:8.2f} ms/call  {N*n/dt:.3g} pts/s",
          flush=True)


def pieces(s, loglambda, scale):
    """Rebuild the kernel's intermediates (mirrors
    bulk_liquid_ice_collision_sources) and return a dict of stages."""
    rho_a = s.rho * scale
    T = s.T
    state = pstate(s)
    L_c, N_c = s.q_lcl * rho_a, s.n_lcl * rho_a
    L_r, N_r = s.q_rai * rho_a, s.n_rai * rho_a
    dt = jnp.float32
    tiny = jnp.finfo(dt).tiny

    n_c = lambda D: CM2.size_distribution_cloud(pdf_c, L_c / rho_a, rho_a,
                                                N_c, D)
    p = 1e-5
    ice_bnds = P3.integral_bounds(state, loglambda, p)
    c_lo, c_hi = CM2.size_distribution_bounds_cloud(pdf_c, L_c / rho_a,
                                                    rho_a, N_c, p)
    r_lo, r_hi = CM2.size_distribution_bounds_rain(pdf_r, L_r / rho_a,
                                                   rho_a, N_r, p)
    v_ice = P3.ice_particle_terminal_velocity(vel, rho_a, state)
    aiu, bi, ciu = CO.chen2022_vel_coeffs_rain(vel.rain, rho_a)
    v_liq = lambda D: CO.chen2022_velocity_sum(aiu, bi, ciu, D)
    rho_rim_loc = P3P.compute_local_rime_density(vel, rho_a, T, state)

    Di, wi = P3P._segment_nodes(quad, ice_bnds)
    v_i_at_Di = v_ice(Di)
    k0, k1, k2 = P3P.collision_cross_section_coeffs(state, Di)
    return dict(state=state, rho_a=rho_a, T=T, L_c=L_c, N_c=N_c, L_r=L_r,
                N_r=N_r, n_c=n_c, c_lo=c_lo, c_hi=c_hi, r_lo=r_lo,
                r_hi=r_hi, v_ice=v_ice, v_liq=v_liq,
                rho_rim_loc=rho_rim_loc, Di=Di, wi=wi,
                v_i_at_Di=v_i_at_Di, k=(k0, k1, k2), tiny=tiny)


def outer_setup(s, g, c):
    d = pieces(s, g, c)
    return d["Di"], d["wi"], d["v_i_at_Di"], d["k"]


def cloud_inner(s, g, c):
    d = pieces(s, g, c)
    m_liq = lambda D: pdf_c.rho_w * CO.volume_sphere_D(D)
    Dl_c, wl_c = P3P._nodes(quad, d["c_lo"], d["c_hi"])
    Dl = Dl_c[:, None]
    wl = wl_c[:, None]
    k0, k1, k2 = d["k"]
    K = k0[None] + k1[None] * Dl + k2 * Dl**2
    dV = K * jnp.abs(d["v_i_at_Di"][None] - d["v_liq"](Dl))
    nl = d["n_c"](Dl)
    t1 = dV * nl
    t2 = t1 * m_liq(Dl)
    t3 = t2 / d["rho_rim_loc"](d["Di"][None], Dl)
    return (jnp.sum(t1 * wl, axis=0), jnp.sum(t2 * wl, axis=0),
            jnp.sum(t3 * wl, axis=0))


def crossover(s, g, c):
    d = pieces(s, g, c)
    rain_valid = d["r_hi"] > d["r_lo"]
    r_lo_s = jnp.where(rain_valid, d["r_lo"], 1.0)
    r_hi_s = jnp.where(rain_valid, d["r_hi"], 2.0)
    return P3P._crossover_diameter(d["v_i_at_Di"], d["v_liq"], r_lo_s,
                                   r_hi_s, jnp.float32)


def ladders(s, g, c):
    d = pieces(s, g, c)
    rho_a = d["rho_a"]
    rain_params = CM2.pdf_rain_parameters(pdf_r, d["L_r"] / rho_a, rho_a,
                                          d["N_r"])
    lam_r = 1 / jnp.maximum(rain_params.Dr_mean, d["tiny"])
    rain_valid = d["r_hi"] > d["r_lo"]
    r_lo_s = jnp.where(rain_valid, d["r_lo"], 1.0)
    r_hi_s = jnp.where(rain_valid, d["r_hi"], 2.0)
    Dstar = P3P._crossover_diameter(d["v_i_at_Di"], d["v_liq"], r_lo_s,
                                    r_hi_s, jnp.float32)
    aiu, bi, ciu = CO.chen2022_vel_coeffs_rain(vel.rain, rho_a)

    def segment_moment_diffs(z0, alpha):
        alpha_safe = jnp.maximum(alpha, d["tiny"])
        lad_lo = P3P._endpoint_ladders(z0, alpha_safe, r_lo_s)
        lad_st = P3P._endpoint_ladders(z0, alpha_safe, Dstar)
        lad_hi = P3P._endpoint_ladders(z0, alpha_safe, r_hi_s)
        JA = P3P._moments_from_ladders(z0, alpha, alpha_safe, lad_lo,
                                       lad_st, r_lo_s, Dstar)
        JB = P3P._moments_from_ladders(z0, alpha, alpha_safe, lad_st,
                                       lad_hi, Dstar, r_hi_s)
        return [a - b for a, b in zip(JA, JB)]

    JD_v = segment_moment_diffs(1.0, lam_r)
    JD_j = [segment_moment_diffs(bi[j] + 1, lam_r + ciu[j])
            for j in range(3)]
    return JD_v, JD_j


def rain_rime_quad(s, g, c):
    d = pieces(s, g, c)
    rho_a = d["rho_a"]
    m_liq = lambda D: pdf_c.rho_w * CO.volume_sphere_D(D)
    Dl_r, wl_r = P3P._nodes(quad, d["r_lo"], d["r_hi"])
    Dlr = Dl_r[:, None]
    wlr = wl_r[:, None]
    k0, k1, k2 = d["k"]
    n_r_v = CM2.size_distribution_rain(pdf_r, d["L_r"] / rho_a, rho_a,
                                       d["N_r"], Dlr)
    K_r = k0[None] + k1[None] * Dlr + k2 * Dlr**2
    dV_r = K_r * jnp.abs(d["v_i_at_Di"][None] - d["v_liq"](Dlr))
    t3_r = dV_r * n_r_v * m_liq(Dlr) / d["rho_rim_loc"](d["Di"][None], Dlr)
    return jnp.sum(t3_r * wlr, axis=0)


def full(s, g, c):
    return P3P.bulk_liquid_ice_collision_sources(
        pstate(s), g, pdf_c, pdf_r, s.q_lcl * s.rho * c, s.n_lcl * s.rho,
        s.q_rai * s.rho, s.n_rai * s.rho, aps, tps, vel, s.rho, s.T,
        quad=quad)


def selfcol(s, g, c):
    return P3P.ice_self_collection(pstate(s), g, vel, s.rho * c, quad=quad)


bench("outer_setup", outer_setup)
bench("cloud_inner(+setup)", cloud_inner)
bench("crossover(+setup)", crossover)
bench("ladders(+setup+crossover)", ladders)
bench("rain_rime_quad(+setup)", rain_rime_quad)
bench("FULL collisions", full)
bench("self_collection", selfcol)
