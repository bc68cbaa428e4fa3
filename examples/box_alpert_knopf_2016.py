"""Alpert & Knopf (2016) immersion-freezing box model, Cr1 case
(reference box/Alpert_Knopf_2016_forward.jl): deterministic uniform-area
ABIFM vs stochastic per-droplet freezing with a lognormal INP surface-area
distribution."""

import numpy as np

from common import F, TPS

import jax
import jax.numpy as jnp

from cloudmicrophysics_tpu.models.box import (
    BoxState,
    run_box,
    run_box_stochastic,
)
from cloudmicrophysics_tpu.parameters.aerosol_species import Illite

if __name__ == "__main__":
    A_aero = 1e-5 * 1e-4     # INP surface area per droplet [m^2]
    sigma_g, N0 = 10.0, 1000
    T0, cooling = 256.0, 0.5 / 60
    t_end, dt = 3310.0, 10.0

    ic = BoxState(T=F(T0), A_sum=F(N0 * A_aero), N_liq=F(N0), N_ice=F(0.0))
    traj = run_box(ic, 0.0, t_end, TPS, Illite(), cooling, A_aero, dt)
    print("== deterministic (uniform A) ==")
    print(f"  T: {float(traj.T[0]):.1f} -> {float(traj.T[-1]):.1f} K")
    print(f"  frozen fraction: {float(traj.N_ice[-1]) / N0:.3f}")

    rng = np.random.default_rng(42)
    Aj = np.sort(rng.lognormal(np.log(A_aero), np.log(sigma_g),
                               N0))[::-1].copy()
    T_t, N_liq_t, N_ice_t, _ = run_box_stochastic(
        F(T0), Aj, 0.0, t_end, TPS, Illite(), cooling, dt,
        jax.random.PRNGKey(7))
    print("== stochastic (lognormal A, sigma_g=10) ==")
    print(f"  frozen fraction: {float(N_ice_t[-1]) / N0:.3f}")
    # KA16's point: broad surface-area distributions freeze earlier
    # (large-A droplets) but saturate slower (small-A tail survives)
    half_det = np.argmax(np.asarray(traj.N_ice) >= N0 / 2)
    half_sto = np.argmax(np.asarray(N_ice_t) >= N0 / 2)
    print(f"  50% frozen at step: det={half_det}, stochastic={half_sto}")
