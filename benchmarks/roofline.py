"""Roofline analysis for the column kernels.

For each fused kernel, computes the analytic HBM traffic (one read +
one write of every prognostic field per step — the lower bound the
Pallas blocking pins), measures achieved throughput, and reports the
fraction of the memory-bandwidth speed-of-light. Elementwise microphysics
has low arithmetic intensity, so the HBM roof — not the MXU — is the
relevant ceiling (pallas_guide: check which wall you are against before
optimizing).

Usage: ``python benchmarks/roofline.py [--n 4096] [--nlev 128]``
Prints one JSON line per kernel.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Peak HBM bandwidth by TPU generation [bytes/s]; v5e default.
HBM_BW = {"v4": 1.2e12, "v5e": 8.19e11, "v5p": 2.77e12, "v6e": 1.64e12}


def measure(step, args, n_iter=30):
    import jax

    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--nlev", type=int, default=128)
    ap.add_argument("--hbm", type=str, default="v5e",
                    choices=sorted(HBM_BW))
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import cloudmicrophysics_tpu as cm
    from __graft_entry__ import _build
    from cloudmicrophysics_tpu.models.column import (
        ColumnState2M,
        step_column_2m,
    )

    tps = cm.parameters.ThermodynamicsParameters()
    N = cli.n * cli.nlev
    bw = HBM_BW[cli.hbm]
    dev = jax.devices()[0].platform
    rows = []

    # --- 1M: 7 fields read + 7 written, f32
    step1, state1 = _build(ncol=cli.n, nlev=cli.nlev, dtype=jnp.float32)
    t = measure(jax.jit(step1), (state1,))
    bytes_per_step = 14 * 4 * N
    rows.append(("1m_step", t, bytes_per_step))

    # --- 2M warm rain column: 7 fields read + 7 written, f32
    mp2 = cm.parameters.microphysics_2m_params()
    f = lambda v: jnp.full((cli.n, cli.nlev), v, jnp.float32)
    st2 = ColumnState2M(rho=f(1.1), T=f(288.0), q_tot=f(6e-3),
                        q_lcl=f(1e-3), n_lcl=f(9e7), q_rai=f(5e-4),
                        n_rai=f(9e5))
    step2 = jax.jit(lambda s: step_column_2m(s, mp2, tps, 1.0, 100.0))
    t = measure(step2, (st2,))
    rows.append(("2m_step", t, 14 * 4 * N))

    for name, t, nbytes in rows:
        achieved_bw = nbytes / t
        rows_out = {
            "metric": f"{name} roofline",
            "grid_points_per_s": float(f"{N / t:.4g}"),
            "achieved_GBps": float(f"{achieved_bw / 1e9:.4g}"),
            "hbm_roof_GBps": float(f"{bw / 1e9:.4g}"),
            "fraction_of_sol": float(f"{achieved_bw / bw:.3g}"),
            "device": dev,
        }
        print(json.dumps(rows_out))
    if dev != "tpu":
        print(json.dumps({"note": "non-TPU device; fraction_of_sol is "
                          "meaningless here"}))


if __name__ == "__main__":
    main()
