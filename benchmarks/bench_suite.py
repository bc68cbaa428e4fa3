"""Multi-kernel throughput suite (one JSON line per kernel).

Complements the driver-facing ``bench.py`` (which reports the single
headline 1M number) with per-scheme throughputs on the available device:

* ``1m_step``    — fused 1M bulk tendencies + sedimentation (ncol, nlev)
* ``2m_warm``    — fused SB2006 warm-rain tendencies
* ``2m_p3``      — warm rain + full P3 ice (shape solve outside, collision
                   quadrature inside) — the heaviest kernel
* ``parcel``     — Euler-scan parcel steps/s (latency-bound scan)

Usage: ``python benchmarks/bench_suite.py [--n 4096]``
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _first_leaf_sum(x):
    # reduce over EVERY leaf: a pass-through output (e.g. rho) aliases its
    # input buffer and would not force the execution that produced the rest
    import jax
    import jax.numpy as jnp

    return float(sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(x)))


def _throughput(step, args, n_pts, n_iter=30):
    """Time a self-map ``x1 = step(*args)`` chained as ``step(x1, ...)``.

    Every iteration feeds the previous output back in (``step`` must map
    its first argument to a like-structured output), so each call has
    fresh input buffers. Same-args timing loops are NOT trustworthy on
    this stack: the remote TPU runtime can serve repeated identical
    executions from cache, inflating throughput by >50x. The clock stops
    on a HOST READBACK of a scalar reduced from the final state —
    ``jax.block_until_ready`` returns without waiting on the experimental
    remote platform, so readback is the only trustworthy fence.
    """
    x, rest = args[0], args[1:]
    x = step(x, *rest)
    _first_leaf_sum(x)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        x = step(x, *rest)
    _first_leaf_sum(x)  # readback = timing fence
    dt = time.perf_counter() - t0
    return n_pts * n_iter / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--nlev", type=int, default=128)
    ap.add_argument("--p3-orders", type=str, default="16,8",
                    help="quadrature orders for the 2m_p3 rows (the GL-16 "
                    "default and the ladder-verified GL-8 fast setting)")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()

    import cloudmicrophysics_tpu as cm
    from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m

    tps = cm.parameters.ThermodynamicsParameters()
    F = jnp.float32
    N = args_cli.n * args_cli.nlev
    f = lambda v: jnp.full((N,), v, F)

    dev = jax.devices()[0].platform

    class _Results(list):
        # print each line as it lands so a late-kernel failure still
        # leaves the earlier numbers on stdout
        def append(self, item):
            name, v, n_pts = item
            print(json.dumps({
                "metric": f"{name} throughput",
                "value": float(f"{v:.4g}"),
                "unit": "grid-points/s" if name != "parcel" else "steps/s",
                "batch": n_pts,
                "device": dev,
            }), flush=True)
            super().append(item)

    results = _Results()

    # --- 1M fused step (same kernel as bench.py) ---
    from __graft_entry__ import _build

    step1, state1 = _build(ncol=args_cli.n, nlev=args_cli.nlev,
                           dtype=jnp.float32)
    jit1 = jax.jit(step1)
    results.append(("1m_step", _throughput(jit1, (state1,), N), N))

    # --- same step as an explicit Pallas kernel (TPU only) ---
    if jax.devices()[0].platform == "tpu":
        from cloudmicrophysics_tpu.kernels import step_column_1m_pallas
        from cloudmicrophysics_tpu.parameters import (
            ThermodynamicsParameters,
            microphysics_1m_params,
            terminal_velocity_params,
        )

        mp1 = microphysics_1m_params()
        tps1 = ThermodynamicsParameters()
        tv1 = terminal_velocity_params()
        bc = 256
        while args_cli.n % bc:
            bc //= 2
        jit1p = jax.jit(lambda s: step_column_1m_pallas(
            s, mp1, tps1, tv1, 1.0, 100.0, block_cols=bc))
        results.append(("1m_step_pallas", _throughput(jit1p, (state1,), N),
                        N))

    # --- 2M warm rain (self-map: tiny Euler update keeps buffers fresh) ---
    mp2 = cm.parameters.microphysics_2m_params()
    clamp = lambda q: jnp.maximum(q, 0.0)

    def warm_selfmap(x):
        rho, T, qt, ql, nl, qr, nr = x
        r = bulk_tendencies_2m(mp2, tps, rho, T, qt, ql, nl, qr, nr)
        d = 1e-3
        return (rho, T, qt, clamp(ql + d * r.dq_lcl_dt),
                clamp(nl + d * r.dn_lcl_dt), clamp(qr + d * r.dq_rai_dt),
                clamp(nr + d * r.dn_rai_dt))

    a2 = (f(1.1), f(288.0), f(6e-3), f(1e-3), f(9e7), f(5e-4), f(9e5))
    results.append(("2m_warm", _throughput(jax.jit(warm_selfmap), (a2,), N),
                    N))

    # --- 2M column step as the packed-state Pallas kernel (TPU only) ---
    if dev == "tpu":
        from cloudmicrophysics_tpu.kernels.column2m import (
            pack_state_2m,
            step_column_2m_pallas_packed,
        )
        from cloudmicrophysics_tpu.models.column import ColumnState2M

        fc2 = lambda v: jnp.full((args_cli.n, args_cli.nlev), v, F)
        st2 = ColumnState2M(rho=fc2(1.1), T=fc2(288.0), q_tot=fc2(6e-3),
                            q_lcl=fc2(1e-3), n_lcl=fc2(9e7),
                            q_rai=fc2(5e-4), n_rai=fc2(9e5))
        jit2p = jax.jit(lambda p: step_column_2m_pallas_packed(
            p, mp2, tps, 1.0, 100.0, block_cols=128))
        results.append(("2m_step_pallas_packed",
                        _throughput(jit2p, (pack_state_2m(st2),), N), N))

    # --- 2M + P3 ice (pointwise; loglambda solved once, held) ---
    from cloudmicrophysics_tpu.ops import p3 as P3

    n3 = max(N // 16, 1024)
    f3 = lambda v: jnp.full((n3,), v, F)
    p3_orders = [int(o) for o in args_cli.p3_orders.split(",") if o]

    from cloudmicrophysics_tpu.perf import chunked_cells

    for order in p3_orders:
        mp3 = cm.parameters.microphysics_2m_params(with_ice=True,
                                                   quadrature_order=order)
        ps0 = P3.state_from_prognostic(
            mp3.ice.scheme, f3(1e-4 * 1.1), f3(9e4 * 1.1), f3(3e-5 * 1.1),
            f3(3e-5 / 400 * 1.1))
        ll3 = P3.get_distribution_loglambda(ps0)

        def p3_body(x, mp3=mp3):
            rho, T, qt, ql, nl, qr, nr, qi, ni, qrim, brim, ll = x
            r = bulk_tendencies_2m(mp3, tps, rho, T, qt, ql, nl, qr, nr,
                                   qi, ni, qrim, brim, ll)
            d = 1e-3
            return (rho, T, qt, clamp(ql + d * r.dq_lcl_dt),
                    clamp(nl + d * r.dn_lcl_dt),
                    clamp(qr + d * r.dq_rai_dt),
                    clamp(nr + d * r.dn_rai_dt),
                    clamp(qi + d * r.dq_ice_dt),
                    clamp(ni + d * r.dn_ice_dt),
                    clamp(qrim + d * r.dq_rim_dt),
                    clamp(brim + d * r.db_rim_dt), ll)

        # ~16k cells per chunk keeps the shared node tables on-chip
        # between consumers (measured optimum on v5e; see bench.py)
        p3_selfmap = jax.jit(chunked_cells(p3_body, max(n3 // 16384, 1)))
        a3 = (f3(1.1), f3(263.0), f3(4e-3), f3(5e-4), f3(9e7), f3(2e-4),
              f3(9e5), f3(1e-4), f3(9e4), f3(3e-5), f3(3e-5 / 400), ll3)
        results.append((f"2m_p3_gl{order}",
                        _throughput(p3_selfmap, (a3,), n3,
                                    n_iter=10), n3))

    # --- full P3 column step (shape solve + processes + sedimentation),
    #     at the GL-8 fast setting ---
    from cloudmicrophysics_tpu.models.column import (
        ColumnStateP3,
        step_column_p3,
    )

    mp3c = cm.parameters.microphysics_2m_params(
        with_ice=True, quadrature_order=p3_orders[-1])
    ncol3, nlev3 = max(args_cli.n // 16, 64), args_cli.nlev
    fc = lambda v: jnp.full((ncol3, nlev3), v, F)
    st3 = ColumnStateP3(rho=fc(1.1), T=fc(263.0), q_tot=fc(6e-3),
                        q_lcl=fc(1e-3), n_lcl=fc(9e7), q_rai=fc(5e-4),
                        n_rai=fc(9e5), q_ice=fc(5e-4), n_ice=fc(1e5),
                        q_rim=fc(1e-4), b_rim=fc(2e-7))
    # column chunking (col_chunks -> perf.chunked_cells) at ~16k grid
    # points per chunk — same on-chip working-set effect as the
    # flat-batch chunking above
    cc = max(ncol3 * nlev3 // 16384, 1)
    while ncol3 % cc:
        cc -= 1
    jit3c = jax.jit(lambda x: step_column_p3(
        x[0], mp3c, tps, 1.0, 100.0, x[1], col_chunks=cc))
    _, loglam0 = jit3c((st3, None))
    jax.block_until_ready(loglam0)
    n3c = ncol3 * nlev3
    results.append((f"p3_column_step_gl{p3_orders[-1]}",
                    _throughput(jit3c, ((st3, loglam0),), n3c, n_iter=10),
                    n3c))

    # --- parcel scan (steps/s; latency-bound) ---
    from cloudmicrophysics_tpu.models import parcel as PM

    ic = PM.ParcelState(S_l=F(1.02), p_air=F(8e4), T=F(278.0),
                        q_vap=F(6e-3), q_liq=F(1e-3), q_ice=F(0.0),
                        N_aer=F(1e8), N_liq=F(1e8), N_ice=F(0.0),
                        ln_inpc=F(0.0))
    params = PM.parcel_params(condensation_growth="Condensation",
                              const_dt=0.1, w=1.0)
    n_steps = 1000
    # self-map: the trajectory's final state seeds the next run
    run = jax.jit(lambda ic: jax.tree_util.tree_map(
        lambda a: a[-1], PM.run_parcel(ic, 0.0, n_steps * 0.1, params)))
    results.append(("parcel", _throughput(run, (ic,), n_steps, n_iter=10),
                    n_steps))



if __name__ == "__main__":
    main()
