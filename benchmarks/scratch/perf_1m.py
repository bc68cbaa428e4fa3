"""TPU perf shootout for the flagship 1M column step: XLA vs Pallas,
with/without donation, block size sweep."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build, _enable_compile_cache
from cloudmicrophysics_tpu.kernels.column1m import step_column_1m_pallas
from cloudmicrophysics_tpu.models.column import ColumnState
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters, microphysics_1m_params,
    terminal_velocity_params)

_enable_compile_cache()
ncol, nlev = 262144, 128
N = ncol * nlev
step, state = _build(ncol=ncol, nlev=nlev, dtype=jnp.float32)
mp = microphysics_1m_params()
tps = ThermodynamicsParameters()
tv = terminal_velocity_params()


def bench(name, fn, donate=False):
    f = jax.jit(fn, donate_argnums=(0,) if donate else ())
    # warm up on a private copy: with donation the input buffers are
    # deleted, and the module-level `state` must survive for later benches
    s = f(jax.tree_util.tree_map(jnp.copy, state), jnp.float32(0.0))
    _ = float(jnp.sum(s.q_rai))  # force
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        s = f(s, jnp.float32(i + 1))
    c = float(jnp.sum(s.q_rai))
    dt = time.perf_counter() - t0
    assert np.isfinite(c)
    print(f"{name:34s} {dt / n * 1e3:8.2f} ms/iter  {N * n / dt:.4g} pts/s",
          flush=True)


def xla_step(s, i):
    s = s._replace(q_tot=s.q_tot * (1.0 + 1e-4 * i) + 1e-9 * (1.0 + i))
    return step(s)


bench("xla fused", xla_step)
bench("xla fused + donate", xla_step, donate=True)

for bc in (128, 256, 512, 1024):
    def pallas_step(s, i, bc=bc):
        s = s._replace(q_tot=s.q_tot * (1.0 + 1e-4 * i) + 1e-9 * (1.0 + i))
        return step_column_1m_pallas(s, mp, tps, tv, 1.0, 100.0,
                                     block_cols=bc)
    try:
        bench(f"pallas block_cols={bc}", pallas_step)
        bench(f"pallas block_cols={bc} + donate", pallas_step, donate=True)
    except Exception as e:
        print(f"pallas block_cols={bc} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
