"""Marginal wall-time of each P3 component at the bench batch (TPU).

Monkeypatches one component at a time to a zero stub and re-times the
full fused 2M+P3 self-map at GL-16, 2M cells — the difference vs the
full kernel is that component's true marginal cost (fusion effects
included), unlike standalone timings which carry dispatch overhead and
private node-table builds.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _enable_compile_cache

_enable_compile_cache()

import cloudmicrophysics_tpu as cm
from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.ops import p3_processes as P3P
from cloudmicrophysics_tpu.parameters import ThermodynamicsParameters

tps = ThermodynamicsParameters()
mp3 = cm.parameters.microphysics_2m_params(with_ice=True,
                                           quadrature_order=16)
n3 = 2 * 1024 * 1024
f3 = lambda v: jnp.full((n3,), v, jnp.float32)
ps0 = P3.state_from_prognostic(
    mp3.ice.scheme, f3(1e-4 * 1.1), f3(9e4 * 1.1), f3(3e-5 * 1.1),
    f3(3e-5 / 400 * 1.1))
ll3 = P3.get_distribution_loglambda(ps0)
clamp = lambda q: jnp.maximum(q, 0.0)
a3 = (f3(1.1), f3(263.0), f3(4e-3), f3(5e-4), f3(9e7), f3(2e-4),
      f3(9e5), f3(1e-4), f3(9e4), f3(3e-5), f3(3e-5 / 400))


def make_step():
    @jax.jit
    def p3_selfmap(x):
        rho, T, qt, ql, nl, qr, nr, qi, ni, qrim, brim = x
        r = bulk_tendencies_2m(mp3, tps, rho, T, qt, ql, nl, qr, nr,
                               qi, ni, qrim, brim, ll3)
        d = 1e-3
        return (rho, T, qt, clamp(ql + d * r.dq_lcl_dt),
                clamp(nl + d * r.dn_lcl_dt), clamp(qr + d * r.dq_rai_dt),
                clamp(nr + d * r.dn_rai_dt), clamp(qi + d * r.dq_ice_dt),
                clamp(ni + d * r.dn_ice_dt), clamp(qrim + d * r.dq_rim_dt),
                clamp(brim + d * r.db_rim_dt))
    return p3_selfmap


def timeit(step, n_iter=10):
    x = step(a3)
    _ = float(jnp.sum(x[3]))
    best = np.inf
    for rep in range(3):
        x = tuple(v * (1.0 + 1e-5 * rep) for v in a3)
        x = step(x)
        _ = float(jnp.sum(x[3]))
        t0 = time.perf_counter()
        for _i in range(n_iter):
            x = step(x)
        _ = float(jnp.sum(x[3]))
        best = min(best, time.perf_counter() - t0)
    return n3 * n_iter / best


orig_selfcol = P3P.ice_self_collection
orig_coll = P3P.bulk_liquid_ice_collision_sources
orig_melt = P3P.ice_melt


def zero_selfcol(state, loglambda, vel, rho_a, quad=None, nodes=None,
                 inner="blocked"):
    return jnp.zeros_like(loglambda + jnp.asarray(rho_a))


def zero_coll(state, loglambda, pdf_c, pdf_r, L_c, N_c, L_r, N_r, aps,
              tps_, vel, rho_a, T, quad=None, rain_inner="quadrature",
              ice_nodes=None):
    z = jnp.zeros_like(jnp.asarray(rho_a) + jnp.asarray(T))
    return P3P.CollisionSources(z, z, z, z, z, z, z)


def zero_melt(velocity_params, aps, tps_, T_a, rho_a, state, loglambda,
              quad=None, nodes=None):
    z = jnp.zeros_like(jnp.asarray(T_a) + jnp.asarray(rho_a))
    return z, z


variants = [("full", {})]
variants += [("no_selfcol", {"ice_self_collection": zero_selfcol})]
variants += [("no_collisions",
              {"bulk_liquid_ice_collision_sources": zero_coll})]
variants += [("no_melt", {"ice_melt": zero_melt})]
variants += [("no_all_integrals",
              {"ice_self_collection": zero_selfcol,
               "bulk_liquid_ice_collision_sources": zero_coll,
               "ice_melt": zero_melt})]

# p3_tendencies imported P3P as a module, so patching module attrs works
for name, patches in variants:
    for k, v in patches.items():
        setattr(P3P, k, v)
    try:
        v_ = timeit(make_step())
        print(json.dumps({"variant": name,
                          "pts_per_s": float(f"{v_:.4g}")}), flush=True)
    finally:
        setattr(P3P, "ice_self_collection", orig_selfcol)
        setattr(P3P, "bulk_liquid_ice_collision_sources", orig_coll)
        setattr(P3P, "ice_melt", orig_melt)
