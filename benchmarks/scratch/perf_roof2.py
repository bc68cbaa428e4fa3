import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from __graft_entry__ import _enable_compile_cache
_enable_compile_cache()
print("devices", jax.devices(), flush=True)
ncol, nlev, nf = 524288, 128, 7
x = jnp.ones((nf, ncol, nlev), jnp.float32)
print("alloc done", flush=True)

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

f = jax.jit(copy_step)
y = f(x, jnp.float32(1.0)); print("compiled", flush=True)
_ = float(jnp.sum(y[5])); print("first exec done", flush=True)
best = np.inf
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(20):
        y = f(y, jnp.float32(1.0 + 1e-6 * i))
    _ = float(jnp.sum(y[5]))
    dt = (time.perf_counter() - t0) / 20
    print(f"rep {rep}: {dt*1e3:.2f} ms  {x.size*4*2/dt/1e9:.1f} GB/s", flush=True)
