"""Second-level TPU ablation: cost of the rime-density pair term and the
Musil freezing split inside the collision kernel, plus a GL-8 reference
row. Monkeypatches trace-time seams; XLA dead-code-eliminates the
stubbed subgraphs."""
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
n3 = 2 * 1024 * 1024
f3 = lambda v: jnp.full((n3,), v, jnp.float32)
clamp = lambda q: jnp.maximum(q, 0.0)
a3 = (f3(1.1), f3(263.0), f3(4e-3), f3(5e-4), f3(9e7), f3(2e-4),
      f3(9e5), f3(1e-4), f3(9e4), f3(3e-5), f3(3e-5 / 400))


def make_step(order):
    mp3 = cm.parameters.microphysics_2m_params(with_ice=True,
                                               quadrature_order=order)
    ps0 = P3.state_from_prognostic(
        mp3.ice.scheme, f3(1e-4 * 1.1), f3(9e4 * 1.1), f3(3e-5 * 1.1),
        f3(3e-5 / 400 * 1.1))
    ll3 = P3.get_distribution_loglambda(ps0)

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


orig_rho_loc = P3P.compute_local_rime_density
orig_max_frz = P3P.compute_max_freeze_rate


def const_rho_loc(velocity_params, rho_a, T, state):
    return lambda D_i, D_l, v_i_at=None, v_rel=None: jnp.asarray(
        400.0, jnp.float32)


def inf_max_frz(aps, tps_, velocity_params, rho_a, T_a, state):
    big = jnp.asarray(3.4e38, jnp.float32)
    return lambda D_i, v_at_D=None: big


for name, patches, order in [
    ("full_gl16", {}, 16),
    ("const_rho_rim_gl16", {"compute_local_rime_density": const_rho_loc},
     16),
    ("no_musil_gl16", {"compute_max_freeze_rate": inf_max_frz}, 16),
    ("full_gl8", {}, 8),
]:
    for k, v in patches.items():
        setattr(P3P, k, v)
    try:
        v_ = timeit(make_step(order))
        print(json.dumps({"variant": name,
                          "pts_per_s": float(f"{v_:.4g}")}), flush=True)
    finally:
        setattr(P3P, "compute_local_rime_density", orig_rho_loc)
        setattr(P3P, "compute_max_freeze_rate", orig_max_frz)
