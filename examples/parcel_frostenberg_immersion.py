"""Frostenberg (2023) INP-climatology immersion freezing: mean / random /
stochastic variants (reference parcel/Example_Frostenberg_Immersion_Freezing.jl)."""

import numpy as np

from common import PM, frozen_fraction, parcel_ic, summarize

from cloudmicrophysics_tpu.ops.ice_nucleation import INP_concentration_mean
from cloudmicrophysics_tpu.parameters.ice_nucleation import Frostenberg2023

if __name__ == "__main__":
    ip = Frostenberg2023()
    N_l, r0 = 500e3, 1e-6
    T0 = 251.0
    q_l = N_l * 4 / 3 * np.pi * r0**3 * 1000.0 / 1.2
    ln_inpc0 = float(INP_concentration_mean(ip, T0))
    ic = parcel_ic(800e2, T0, 8.1e-4, q_l, 0.0, 0.0, N_l, 0.0,
                   ln_inpc=ln_inpc0)
    common = dict(condensation_growth="Condensation",
                  deposition_growth="Deposition", const_dt=1.0, w=0.7)

    for mode, extra in (
        ("Frostenberg_mean", {}),
        ("Frostenberg_random", {"sampling_interval": 60.0}),
        ("Frostenberg_stochastic", {"gamma": 1.0}),
        ("Frostenberg_stochastic", {"gamma": 0.01}),
    ):
        params = PM.parcel_params(heterogeneous=mode, **common, **extra)
        traj = PM.run_parcel(ic, 0.0, 1200.0, params)
        label = f"{mode} {extra or ''}"
        summarize(label, traj)
        ff = np.asarray(frozen_fraction(traj))
        print(f"  frozen fraction end: {ff[-1]:.3e}")
