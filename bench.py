"""Benchmark: grid-points/s/chip for the fused 1M process-rate kernel.

Runs the flagship fused kernel (full 1-moment bulk microphysics tendencies +
sedimentation over an (ncol, nlev) column block) on the available device and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "grid-points/s", "vs_baseline": N}

``vs_baseline`` is measured throughput divided by an estimated reference
throughput of 2e7 grid-points/s for the fused 1M kernel on the reference's
single-GPU CUDA path (the reference reports, but does not publish, GPU
numbers — see BASELINE.md; its CI enforces only per-call CPU budgets).

Timing methodology (both lessons learned on the remote-TPU runtime):

* every iteration mixes an iteration-dependent perturbation into the input
  so no two dispatches see bit-identical buffers (the runtime can serve
  repeated identical executions from cache, inflating throughput >50x);
* the clock stops on a HOST READBACK of a scalar reduced from the final
  state — ``jax.block_until_ready`` returns without waiting on the
  experimental remote platform, so readback is the only trustworthy fence.
"""

import json
import time

import numpy as np

BASELINE_GRID_POINTS_PER_S = 2e7


def main():
    import jax

    from __graft_entry__ import _build, _enable_compile_cache

    import jax.numpy as jnp

    _enable_compile_cache()

    ncol, nlev = 524288, 128
    # Pallas-tiled packed-state step: the 7 prognostic fields ride in ONE
    # (7, ncol, nlev) HBM buffer (one DMA stream per grid step instead of
    # 14) and the whole step is one HBM pass — measured 11.1 (XLA-fused)
    # -> 6.8 ms/step (packed Pallas) at 262144x128 f32 on v5e; the larger
    # ncol amortizes the ~1 ms fixed dispatch overhead of the remote
    # runtime. The bit-freshness perturbation is applied to q_tot ON LOAD
    # inside the kernel (q_tot_affine) so it costs no extra HBM pass.
    from cloudmicrophysics_tpu.kernels.column1m import (
        pack_state, step_column_1m_pallas_packed)
    from cloudmicrophysics_tpu.parameters import (
        ThermodynamicsParameters, microphysics_1m_params,
        terminal_velocity_params)

    _, state = _build(ncol=ncol, nlev=nlev, dtype=jnp.float32)
    mp = microphysics_1m_params()
    tps = ThermodynamicsParameters()
    tv = terminal_velocity_params()

    @jax.jit
    def step_perturbed(ps, i):
        # keep input buffers bit-fresh every iteration (in-kernel affine)
        return step_column_1m_pallas_packed(
            ps, mp, tps, tv, 1.0, 100.0, block_cols=128,
            q_tot_affine=(1.0 + 1e-4 * i, 1e-9 * (1.0 + i)))

    packed = pack_state(state)

    # warm up / compile; readback forces execution
    s = step_perturbed(packed, jnp.float32(0.0))
    _ = float(jnp.sum(s[5]))  # q_rai plane

    # Best-of-3 independent 30-step rollouts: the remote-TPU runtime
    # occasionally serves a transiently contended window (a recorded
    # 2.5x dip across otherwise identical runs), so the best rollout is
    # the honest kernel throughput. Each rollout restarts from a
    # rep-distinct initial state (rescaled outside the timed region) so
    # every dispatch in every rep still sees bit-fresh inputs, and each
    # is fenced by one host readback — a single ~27 ms remote round-trip
    # amortized over the full 30-step window (shorter windows measurably
    # understate throughput). 30 steps stays inside the explicit-Euler
    # stability horizon (~70 steps) of the compounding q_tot injection.
    n_iter, dts = 30, []
    rescale = jax.jit(lambda p, c: p * c)
    for rep in range(3):
        s = rescale(packed, jnp.float32(1.0 + 1e-5 * rep))
        _ = float(jnp.sum(s[5]))  # fence the (untimed) reset
        t0 = time.perf_counter()
        for i in range(n_iter):
            s = step_perturbed(s, jnp.float32(i + 1))
        checksum = float(jnp.sum(s[5]))  # host readback = the timing fence
        t1 = time.perf_counter()
        assert np.isfinite(checksum)
        dts.append(t1 - t0)
    best_dt = min(dts)
    med_dt = float(np.median(dts))

    pts_per_s = ncol * nlev * n_iter / best_dt
    line_1m = json.dumps({
        "metric": "fused 1M bulk-tendency + sedimentation throughput",
        "value": float(f"{pts_per_s:.4g}"),
        "unit": "grid-points/s",
        "vs_baseline": float(f"{pts_per_s / BASELINE_GRID_POINTS_PER_S:.4g}"),
        # methodology (recorded so round-over-round numbers compare
        # like-for-like): best of 3 independent 30-step readback-fenced
        # rollouts; median of the 3 alongside
        "reps": 3,
        "stat": "best",
        "median_value": float(f"{ncol * nlev * n_iter / med_dt:.4g}"),
    })

    # --- 2M+P3 fused tendencies at the GL-16 production setting -----------
    # The actual P3 cost center (VERDICT r4 #2/#4): printed BEFORE the 1M
    # headline so the driver's single parsed line stays the 1M metric while
    # the artifact tail carries both. Failure here must never lose the 1M
    # line.
    try:
        line_p3 = _bench_p3_gl16()
        print(line_p3)
    except Exception as e:  # pragma: no cover - device-side robustness
        print(json.dumps({"metric": "fused 2M+P3 bulk tendencies (GL-16)",
                          "error": repr(e)[:200]}))
    print(line_1m)


# Round-4 committed BENCH_SUITE.json value for 2m_p3_gl16 — the reference
# publishes no P3 GPU throughput (BASELINE.md), so round-over-round is the
# only meaningful ratio for this metric.
ROUND4_P3_GL16_PTS_PER_S = 9.612e6


def _bench_p3_gl16():
    import jax
    import jax.numpy as jnp

    from cloudmicrophysics_tpu.models.tendencies import bulk_tendencies_2m
    from cloudmicrophysics_tpu.ops import p3 as P3
    from cloudmicrophysics_tpu.parameters import (
        ThermodynamicsParameters, microphysics_2m_params)

    tps = ThermodynamicsParameters()
    mp3 = microphysics_2m_params(with_ice=True, quadrature_order=16)
    n3 = 2 * 1024 * 1024
    f3 = lambda v: jnp.full((n3,), v, jnp.float32)

    ps0 = P3.state_from_prognostic(
        mp3.ice.scheme, f3(1e-4 * 1.1), f3(9e4 * 1.1), f3(3e-5 * 1.1),
        f3(3e-5 / 400 * 1.1))
    ll3 = P3.get_distribution_loglambda(ps0)
    clamp = lambda q: jnp.maximum(q, 0.0)

    def p3_body(x):
        # tiny Euler self-map: every dispatch sees bit-fresh buffers
        # (loglambda rides in the state tuple, held — substepping
        # semantics, same as BENCH_SUITE)
        rho, T, qt, ql, nl, qr, nr, qi, ni, qrim, brim, ll = x
        r = bulk_tendencies_2m(mp3, tps, rho, T, qt, ql, nl, qr, nr,
                               qi, ni, qrim, brim, ll)
        d = 1e-3
        return (rho, T, qt, clamp(ql + d * r.dq_lcl_dt),
                clamp(nl + d * r.dn_lcl_dt), clamp(qr + d * r.dq_rai_dt),
                clamp(nr + d * r.dn_rai_dt), clamp(qi + d * r.dq_ice_dt),
                clamp(ni + d * r.dn_ice_dt), clamp(qrim + d * r.dq_rim_dt),
                clamp(brim + d * r.db_rim_dt), ll)

    # Cell chunking (perf.chunked_cells) at ~16k cells per chunk: the
    # shared node tables ((64, chunk) f32 ~ 4 MB each) stay on-chip
    # between consumers. Measured chunk sweep at this batch on v5e:
    # flat 1.90e7 -> 512k-chunks 2.18e7 -> 16k-chunks 3.13e7 pts/s.
    from cloudmicrophysics_tpu.perf import chunked_cells

    p3_selfmap = jax.jit(chunked_cells(p3_body, max(n3 // 16384, 1)))

    a3 = (f3(1.1), f3(263.0), f3(4e-3), f3(5e-4), f3(9e7), f3(2e-4),
          f3(9e5), f3(1e-4), f3(9e4), f3(3e-5), f3(3e-5 / 400), ll3)
    x = p3_selfmap(a3)
    _ = float(jnp.sum(x[3]))  # compile + readback fence

    n_iter, dts = 10, []
    for rep in range(3):
        x = tuple(v * (1.0 + 1e-5 * rep) for v in a3)
        x = p3_selfmap(x)
        _ = float(jnp.sum(x[3]))  # fence the (untimed) reset step
        t0 = time.perf_counter()
        for _i in range(n_iter):
            x = p3_selfmap(x)
        checksum = float(jnp.sum(x[3]))  # host readback = timing fence
        t1 = time.perf_counter()
        assert np.isfinite(checksum)
        dts.append(t1 - t0)
    best_dt, med_dt = min(dts), float(np.median(dts))
    v = n3 * n_iter / best_dt
    return json.dumps({
        "metric": "fused 2M+P3 bulk tendencies (GL-16)",
        "value": float(f"{v:.4g}"),
        "unit": "grid-points/s",
        "vs_baseline": float(f"{v / ROUND4_P3_GL16_PTS_PER_S:.4g}"),
        "baseline": "round-4 BENCH_SUITE 2m_p3_gl16 (no reference GPU "
                    "P3 throughput exists)",
        "reps": 3,
        "stat": "best",
        "median_value": float(f"{n3 * n_iter / med_dt:.4g}"),
    })


if __name__ == "__main__":
    main()
