import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import time
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _build, _enable_compile_cache
from cloudmicrophysics_tpu.kernels.column1m import pack_state, step_column_1m_pallas_packed
from cloudmicrophysics_tpu.parameters import (ThermodynamicsParameters,
    microphysics_1m_params, terminal_velocity_params)
_enable_compile_cache()
ncol, nlev = 524288, 128
_, state = _build(ncol=ncol, nlev=nlev, dtype=jnp.float32)
mp = microphysics_1m_params(); tps = ThermodynamicsParameters(); tv = terminal_velocity_params()
packed = pack_state(state)

def mk(sc, mode="instantaneous"):
    @jax.jit
    def f(ps, i):
        return step_column_1m_pallas_packed(ps, mp, tps, tv, 1.0, 100.0,
            block_cols=128, sediment_cloud=sc, mode=mode,
            q_tot_affine=(1.0 + 1e-4 * i, 1e-9 * (1.0 + i)))
    return f

def bench(name, f):
    s = f(packed, jnp.float32(0.0)); _ = float(jnp.sum(s[5]))
    best = np.inf
    for rep in range(3):
        s = jax.jit(lambda p, c: p * c)(packed, jnp.float32(1.0 + 1e-5 * rep))
        _ = float(jnp.sum(s[5]))
        t0 = time.perf_counter()
        for i in range(20):
            s = f(s, jnp.float32(i + 1))
        _ = float(jnp.sum(s[5]))
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"{name:30s} {best*1e3:7.2f} ms  {ncol*nlev/best/1e9:6.2f} Gpt/s", flush=True)

bench("full physics", mk(True))
bench("no cloud sedimentation", mk(False))
