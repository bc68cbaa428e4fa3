"""Non-equilibrium condensation/deposition growth
(reference parcel/Example_NonEq.jl)."""

import numpy as np

from common import PM, TPS, F, parcel_ic, summarize

if __name__ == "__main__":
    import jax.numpy as jnp

    from cloudmicrophysics_tpu.ops import thermo as TDI

    N_l, N_i = 200e6, 1e6
    r_l, r_i = 1e-6, 8e-6
    p0, T0 = 800e2, 243.0
    e = float(TDI.saturation_vapor_pressure_over_liquid(TPS, F(T0)))
    md = (p0 - e) / TPS.R_d / T0
    mv = e / TPS.R_v / T0
    ml = N_l * 4 / 3 * np.pi * 1000.0 * r_l**3
    mi = N_i * 4 / 3 * np.pi * 916.7 * r_i**3
    mt = md + mv + ml + mi
    ic = parcel_ic(p0, T0, mv / mt, ml / mt, mi / mt, 0.0, N_l, N_i)

    for tau in (0.01, 0.1, 1.0):
        params = PM.parcel_params(
            condensation_growth="NonEq_Condensation",
            deposition_growth="NonEq_Deposition_simple",
            noneq_tau=tau, const_dt=0.001, w=1.0)
        traj = PM.run_parcel(ic, 0.0, 20.0, params)
        summarize(f"NonEq growth / tau={tau}", traj)
