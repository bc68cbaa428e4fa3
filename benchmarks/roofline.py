"""Roofline analysis for the fused column kernels (1M / 2M / 2M+P3).

For each kernel this measures throughput with the trusted methodology
(see bench.py: iteration-fresh inputs — the remote runtime can serve
bit-identical dispatches from cache — and a host-readback fence, because
``jax.block_until_ready`` does not reliably fence the remote platform),
then compares against TWO ceilings so the report can *name the wall*:

* the **measured DMA roof**: a Pallas copy kernel moving the same bytes
  at the same shape — the achievable HBM bandwidth on this chip, tighter
  and more honest than the datasheet number;
* the **VPU transcendental rate**: a chained-``exp`` microbench — low-
  arithmetic-intensity microphysics that misses the DMA roof is spending
  the gap in VPU transcendentals, and this quantifies the budget.

``wall`` is "hbm" when the kernel achieves >= 70% of the measured copy
roof, else "vpu" (elementwise kernels have no other wall on TPU: no MXU
work, no cross-chip comms). Prints one JSON line per row; run with the
real TPU attached. Committed output: ``benchmarks/ROOFLINE_TPU.json``.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Datasheet HBM bandwidth by TPU generation [bytes/s]; v5e default.
HBM_BW = {"v4": 1.2e12, "v5e": 8.19e11, "v5p": 2.77e12, "v6e": 1.64e12}


def _measure(step, x0, readback, n_iter=20, reps=3):
    """Best and median seconds/iteration over ``reps`` rollouts.

    ``step(x, i)`` must be a self-map whose scalar ``i`` keeps every
    dispatch bit-fresh; ``readback(x)`` pulls one scalar to the host —
    the only trustworthy fence on this runtime.
    """
    import jax.numpy as jnp
    import numpy as np

    x = step(x0, jnp.float32(0.0))       # compile + first exec
    assert np.isfinite(readback(x))
    dts = []
    k = 1
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            x = step(x, jnp.float32(k))
            k += 1
        assert np.isfinite(readback(x))   # host readback = timing fence
        dts.append((time.perf_counter() - t0) / n_iter)
    return min(dts), float(np.median(dts))


def _row(name, dt_best, dt_med, n_pts, nbytes, copy_bw, hbm_bw):
    achieved = nbytes / dt_best
    frac_copy = achieved / copy_bw
    return {
        "metric": name,
        "ms_per_step": float(f"{dt_best * 1e3:.4g}"),
        "ms_per_step_median": float(f"{dt_med * 1e3:.4g}"),
        "grid_points_per_s": float(f"{n_pts / dt_best:.4g}"),
        "analytic_bytes_per_step": nbytes,
        "achieved_GBps": float(f"{achieved / 1e9:.4g}"),
        "copy_roof_GBps": float(f"{copy_bw / 1e9:.4g}"),
        "fraction_of_copy_roof": float(f"{frac_copy:.3g}"),
        "fraction_of_hbm_datasheet": float(f"{achieved / hbm_bw:.3g}"),
        "wall": "hbm" if frac_copy >= 0.7 else "vpu",
        "stat": "best-of-3 (median alongside)",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=262144)
    ap.add_argument("--nlev", type=int, default=128)
    ap.add_argument("--p3-ncol", type=int, default=4096,
                    help="column count for the (much heavier) P3 step")
    ap.add_argument("--p3-nlev", type=int, default=64)
    ap.add_argument("--hbm", type=str, default="v5e", choices=sorted(HBM_BW))
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from __graft_entry__ import _build, _enable_compile_cache

    _enable_compile_cache()

    import cloudmicrophysics_tpu as cm
    from cloudmicrophysics_tpu.kernels.column1m import (
        pack_state,
        step_column_1m_pallas_packed,
    )
    from cloudmicrophysics_tpu.models.column import (
        ColumnState2M,
        ColumnStateP3,
        step_column_2m,
        step_column_p3,
    )

    ncol, nlev = cli.ncol, cli.nlev
    N = ncol * nlev
    hbm_bw = HBM_BW[cli.hbm]
    dev = jax.devices()[0].platform
    tps = cm.parameters.ThermodynamicsParameters()
    mp1 = cm.parameters.microphysics_1m_params()
    tv = cm.parameters.terminal_velocity_params()
    rows = []

    # --- measured DMA roof: Pallas copy at the packed-1M shape ---------
    nf = 7

    def copy_kernel(sref, iref, oref):
        oref[...] = iref[...] * sref[0, 0] + 1e-12

    def copy_step(x, s, bc=128):
        spec = pl.BlockSpec((nf, bc, nlev), lambda i: (0, i, 0))
        sspec = pl.BlockSpec((1, 1), lambda i: (0, 0))
        return pl.pallas_call(
            copy_kernel, grid=(ncol // bc,),
            in_specs=[sspec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(
                jnp.full((1, 1), 1.0 + 1e-7 * s, x.dtype), x)

    _, state1 = _build(ncol=ncol, nlev=nlev, dtype=jnp.float32)
    packed = pack_state(state1)
    copy_bytes = packed.size * 4 * 2  # one read + one write of every field
    jc = jax.jit(copy_step)
    dt_copy, dt_copy_med = _measure(
        jc, packed, lambda x: float(jnp.sum(x[5, 0])))
    copy_bw = copy_bytes / dt_copy
    rows.append({
        "metric": "dma_copy_roof",
        "ms_per_step": float(f"{dt_copy * 1e3:.4g}"),
        "ms_per_step_median": float(f"{dt_copy_med * 1e3:.4g}"),
        "bytes_per_step": copy_bytes,
        "achieved_GBps": float(f"{copy_bw / 1e9:.4g}"),
        "fraction_of_hbm_datasheet": float(f"{copy_bw / hbm_bw:.3g}"),
        "stat": "best-of-3 (median alongside)",
    })

    # --- VPU transcendental rate: chained exp at the same footprint ----
    CHAIN = 64

    def exp_chain(x, s):
        x = x * (1.0 + 1e-7 * s)
        for _ in range(CHAIN):
            x = jnp.exp(-x)          # self-map, stays in [e^-1, 1]
        return x

    xe = jnp.full((N,), 0.5, jnp.float32)
    je = jax.jit(exp_chain)
    dt_exp, _ = _measure(je, xe, lambda x: float(x[0]))
    exp_rate = N * CHAIN / dt_exp
    rows.append({
        "metric": "vpu_exp_rate",
        "exp_per_s": float(f"{exp_rate:.4g}"),
        "chain": CHAIN,
        "elements": N,
    })

    # --- 1M fused step (packed Pallas — the bench.py kernel) -----------
    j1 = jax.jit(lambda x, s: step_column_1m_pallas_packed(
        x, mp1, tps, tv, 1.0, 100.0, block_cols=128,
        q_tot_affine=(1.0 + 1e-7 * s, 1e-9)))
    dt1, dt1m = _measure(j1, packed, lambda x: float(jnp.sum(x[5, 0])))
    rows.append(_row("1m_step_pallas_packed", dt1, dt1m, N,
                     14 * 4 * N, copy_bw, hbm_bw))

    # --- 2M warm-rain column step (XLA-fused) ---------------------------
    mp2 = cm.parameters.microphysics_2m_params()
    f = lambda v: jnp.full((ncol, nlev), v, jnp.float32)
    st2 = ColumnState2M(rho=f(1.1), T=f(288.0), q_tot=f(6e-3),
                        q_lcl=f(1e-3), n_lcl=f(9e7), q_rai=f(5e-4),
                        n_rai=f(9e5))
    j2 = jax.jit(lambda x, s: step_column_2m(
        x._replace(q_tot=x.q_tot * (1.0 + 1e-7 * s)), mp2, tps, 1.0, 100.0))
    dt2, dt2m = _measure(j2, st2, lambda x: float(jnp.sum(x.q_rai[:, 0])))
    rows.append(_row("2m_column_step", dt2, dt2m, N, 14 * 4 * N,
                     copy_bw, hbm_bw))

    # --- full 2M+P3 column step (shape solve warm-started) -------------
    pncol, pnlev = cli.p3_ncol, cli.p3_nlev
    pN = pncol * pnlev
    mp3 = cm.parameters.microphysics_2m_params(with_ice=True)
    g = lambda v: jnp.full((pncol, pnlev), v, jnp.float32)
    st3 = ColumnStateP3(rho=g(1.1), T=g(263.0), q_tot=g(6e-3),
                        q_lcl=g(1e-3), n_lcl=g(9e7), q_rai=g(5e-4),
                        n_rai=g(9e5), q_ice=g(5e-4), n_ice=g(1e5),
                        q_rim=g(1e-4), b_rim=g(2e-7))

    def p3_step(x, s):
        st, ll = x
        st = st._replace(q_tot=st.q_tot * (1.0 + 1e-7 * s))
        return step_column_p3(st, mp3, tps, 1.0, 100.0, ll)

    j3 = jax.jit(p3_step)
    dt3, dt3m = _measure(j3, (st3, None),
                         lambda x: float(jnp.sum(x[0].q_ice[:, 0])),
                         n_iter=10)
    # 11 prognostic fields + loglambda, read + written
    rows.append(_row("p3_column_step", dt3, dt3m, pN, 12 * 4 * 2 * pN,
                     copy_bw, hbm_bw))
    rows[-1]["batch"] = [pncol, pnlev]
    rows[-1]["quadrature_order"] = 16  # library default (GL-16)
    # transcendental budget implied by the measured exp rate: how many
    # exp-equivalents/point the kernel could afford if purely VPU-bound
    rows[-1]["exp_equivalents_per_point_budget"] = float(
        f"{exp_rate * dt3 / pN:.4g}")

    for r in rows:
        r["device"] = dev
        print(json.dumps(r), flush=True)
    if dev != "tpu":
        print(json.dumps({"note": "non-TPU device; roof fractions are "
                          "meaningless here"}))


if __name__ == "__main__":
    main()
