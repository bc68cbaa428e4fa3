"""Chunk-count sweep for the flat 2M-cell GL-16 fused tendency.

Usage: python ablate_p3_tpu6.py [n_chunks ...]   (default: 4 128)
Round-5 measured (pts/s): flat 1.90e7, chunks 4 -> 2.18e7, 8 -> 2.29e7,
16 -> 2.50e7, 32 -> 2.79e7, 64 -> 2.82e7, 128 -> 3.13e7 (peak: ~16k
cells/chunk), 256 -> 3.01e7; 128 with CMT_NO_AUX_BARRIER=1 -> 2.41e7
(the barrier wins even harder once chunks fit on-chip)."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import json, time
import numpy as np

from __graft_entry__ import _enable_compile_cache
_enable_compile_cache()

import jax
import jax.numpy as jnp
import cloudmicrophysics_tpu as cm
from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m
from cloudmicrophysics_tpu.ops import p3 as P3
from cloudmicrophysics_tpu.parameters import ThermodynamicsParameters
from cloudmicrophysics_tpu.perf import chunked_cells

tps = ThermodynamicsParameters()
mp3 = cm.parameters.microphysics_2m_params(with_ice=True, quadrature_order=16)
clamp = lambda q: jnp.maximum(q, 0.0)
n3 = 2 * 1024 * 1024
f3 = lambda v: jnp.full((n3,), v, jnp.float32)
ps0 = P3.state_from_prognostic(mp3.ice.scheme, f3(1e-4*1.1), f3(9e4*1.1),
                               f3(3e-5*1.1), f3(3e-5/400*1.1))
ll3 = P3.get_distribution_loglambda(ps0)
a3 = (f3(1.1), f3(263.0), f3(4e-3), f3(5e-4), f3(9e7), f3(2e-4),
      f3(9e5), f3(1e-4), f3(9e4), f3(3e-5), f3(3e-5/400), ll3)

def body(x):
    rho, T, qt, ql, nl, qr, nr, qi, ni, qrim, brim, ll = x
    r = bulk_tendencies_2m(mp3, tps, rho, T, qt, ql, nl, qr, nr,
                           qi, ni, qrim, brim, ll)
    d = 1e-3
    return (rho, T, qt, clamp(ql + d*r.dq_lcl_dt), clamp(nl + d*r.dn_lcl_dt),
            clamp(qr + d*r.dq_rai_dt), clamp(nr + d*r.dn_rai_dt),
            clamp(qi + d*r.dq_ice_dt), clamp(ni + d*r.dn_ice_dt),
            clamp(qrim + d*r.dq_rim_dt), clamp(brim + d*r.db_rim_dt), ll)

def timeit(step, tag, n_iter=10):
    x = step(a3); _ = float(jnp.sum(x[3]))
    best = np.inf
    for rep in range(3):
        x = tuple(v*(1.0+1e-5*rep) for v in a3)
        x = step(x); _ = float(jnp.sum(x[3]))
        t0 = time.perf_counter()
        for _i in range(n_iter):
            x = step(x)
        _ = float(jnp.sum(x[3]))
        best = min(best, time.perf_counter()-t0)
    print(json.dumps({"variant": tag,
                      "pts_per_s": float(f"{n3*n_iter/best:.4g}")}), flush=True)

for nc in [int(a) for a in sys.argv[1:]] or (4, 128):
    timeit(jax.jit(chunked_cells(body, nc)), f"gl16_chunk{nc}")
