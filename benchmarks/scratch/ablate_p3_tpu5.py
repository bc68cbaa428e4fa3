"""Fifth TPU probe: chunked_cells on the full P3 column step (shape
solve + processes + sedimentation) at GL-8, bench_suite shapes."""
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
from cloudmicrophysics_tpu.models.column import ColumnStateP3, step_column_p3
from cloudmicrophysics_tpu.parameters import ThermodynamicsParameters
from cloudmicrophysics_tpu.perf import chunked_cells

tps = ThermodynamicsParameters()
mp3 = cm.parameters.microphysics_2m_params(with_ice=True, quadrature_order=8)
ncol, nlev = 16384, 128
N = ncol * nlev
F = jnp.float32
fc = lambda v: jnp.full((ncol, nlev), v, F)
st = ColumnStateP3(rho=fc(1.1), T=fc(263.0), q_tot=fc(6e-3), q_lcl=fc(1e-3),
                   n_lcl=fc(9e7), q_rai=fc(5e-4), n_rai=fc(9e5),
                   q_ice=fc(5e-4), n_ice=fc(1e5), q_rim=fc(1e-4),
                   b_rim=fc(2e-7))

def timeit(step, x0, tag, n_iter=10):
    x = step(x0)
    _ = float(jnp.sum(x[0].q_rai))
    best = np.inf
    for rep in range(3):
        x = jax.tree_util.tree_map(lambda a: a*(1.0+1e-5*rep), x0)
        x = step(x); _ = float(jnp.sum(x[0].q_rai))
        t0 = time.perf_counter()
        for _i in range(n_iter):
            x = step(x)
        _ = float(jnp.sum(x[0].q_rai))
        best = min(best, time.perf_counter()-t0)
    print(json.dumps({"variant": tag,
                      "pts_per_s": float(f"{N*n_iter/best:.4g}")}), flush=True)

body = lambda s, g: step_column_p3(s, mp3, tps, 1.0, 100.0, g)
flat = jax.jit(lambda x: body(*x))
_, ll0 = flat((st, None))
jax.block_until_ready(ll0)
x0 = (st, ll0)

for nc in (32, 128):
    chk = jax.jit(chunked_cells(body, nc))
    timeit(lambda x, c=chk: c(*x), x0, f"p3_column_gl8_chunk{nc}")
