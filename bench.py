"""Benchmark: grid-points/s/chip for the fused 1M process-rate kernel.

Runs the flagship fused kernel (full 1-moment bulk microphysics tendencies +
sedimentation over an (ncol, nlev) column block) on the available device and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "grid-points/s", "vs_baseline": N}

``vs_baseline`` is measured throughput divided by an estimated reference
throughput of 2e7 grid-points/s for the fused 1M kernel on the reference's
single-GPU CUDA path (the reference reports, but does not publish, GPU
numbers — see BASELINE.md; its CI enforces only per-call CPU budgets).
"""

import json
import time

import numpy as np

BASELINE_GRID_POINTS_PER_S = 2e7


def main():
    import jax

    from __graft_entry__ import _build

    import jax.numpy as jnp

    ncol, nlev = 4096, 128
    step, state = _build(ncol=ncol, nlev=nlev, dtype=jnp.float32)
    step_jit = jax.jit(step)

    # warm up / compile
    out = step_jit(state)
    jax.block_until_ready(out)

    # run: iterate the step to amortize dispatch
    n_iter = 50
    t0 = time.perf_counter()
    s = state
    for _ in range(n_iter):
        s = step_jit(s)
    jax.block_until_ready(s)
    t1 = time.perf_counter()

    pts_per_s = ncol * nlev * n_iter / (t1 - t0)
    print(json.dumps({
        "metric": "fused 1M bulk-tendency + sedimentation throughput",
        "value": float(f"{pts_per_s:.4g}"),
        "unit": "grid-points/s",
        "vs_baseline": float(f"{pts_per_s / BASELINE_GRID_POINTS_PER_S:.4g}"),
    }))


if __name__ == "__main__":
    main()
