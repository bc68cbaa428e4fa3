"""Does per-dispatch tunnel latency dominate? Compare per-step dispatch vs
a lax.scan of n steps inside one jit (production shape: the column model
substeps on-device)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build, _enable_compile_cache

_enable_compile_cache()
ncol, nlev = 262144, 128
N = ncol * nlev
step, state = _build(ncol=ncol, nlev=nlev, dtype=jnp.float32)


@jax.jit
def step_perturbed(s, i):
    s = s._replace(q_tot=s.q_tot * (1.0 + 1e-4 * i) + 1e-9 * (1.0 + i))
    return step(s)


def scan_steps(s, n):
    def body(carry, i):
        return step_perturbed(carry, i), ()
    out, _ = jax.lax.scan(body, s, jnp.arange(1.0, n + 1.0, dtype=jnp.float32))
    return out


for n_inner in (1, 8, 30):
    f = jax.jit(scan_steps, static_argnums=(1,))
    s = f(state, n_inner)
    _ = float(jnp.sum(s.q_rai))
    reps = max(1, 60 // n_inner)
    t0 = time.perf_counter()
    for _r in range(reps):
        s = f(s, n_inner)
    c = float(jnp.sum(s.q_rai))
    dt = time.perf_counter() - t0
    assert np.isfinite(c)
    total = n_inner * reps
    print(f"scan n={n_inner:3d}: {dt / total * 1e3:8.2f} ms/step  "
          f"{N * total / dt:.4g} pts/s", flush=True)
