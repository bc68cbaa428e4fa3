"""Measure pure-DMA roof vs the physics kernel at bench shape."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from __graft_entry__ import _build, _enable_compile_cache
from cloudmicrophysics_tpu.kernels.column1m import (
    pack_state, step_column_1m_pallas_packed)
from cloudmicrophysics_tpu.parameters import (
    ThermodynamicsParameters, microphysics_1m_params,
    terminal_velocity_params)

_enable_compile_cache()
ncol, nlev = 524288, 128
step, state = _build(ncol=ncol, nlev=nlev, dtype=jnp.float32)
mp = microphysics_1m_params(); tps = ThermodynamicsParameters()
tv = terminal_velocity_params()
ps = pack_state(state)
nf = ps.shape[0]

def copy_kernel(sref, iref, oref):
    oref[...] = iref[...] * sref[0, 0] + 1e-12

def copy_step(x, s, bc=128):
    spec = pl.BlockSpec((nf, bc, nlev), lambda i: (0, i, 0))
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0))
    return pl.pallas_call(
        copy_kernel, grid=(ncol // bc,),
        in_specs=[sspec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(
            jnp.full((1, 1), s, x.dtype), x)

def bench(name, f, x, nbytes):
    x = f(x, jnp.float32(1.0)); _ = float(jnp.sum(x[5]))
    n = 20; best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            x = f(x, jnp.float32(1.0 + 1e-6 * (rep * n + i)))
        _ = float(jnp.sum(x[5]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:28s} {best*1e3:7.2f} ms  {nbytes/best/1e9:7.1f} GB/s "
          f"{ncol*nlev/best/1e9:6.2f} Gpt/s", flush=True)
    return x

nbytes = ps.size * 4 * 2
jc = jax.jit(copy_step)
bench("pallas copy rw", jc, ps, nbytes)
# use the lambda's x argument (NOT the closed-over ps) so the feedback
# loop in bench() feeds each iteration's output back in, and start the
# timed scalar sweep past the warm-up value — both keep every dispatch
# bit-fresh on the remote runtime (see bench.py docstring)
jp = jax.jit(lambda x, s: step_column_1m_pallas_packed(
    x, mp, tps, tv, 1.0, 100.0, block_cols=128,
    q_tot_affine=(1.0 + 1e-7 * s, 1e-9)))
bench("physics packed bc=128", jp, ps, nbytes)
