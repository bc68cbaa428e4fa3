"""Aerosol activation in a rising parcel
(reference parcel/Example_AerosolActivation.jl)."""

import numpy as np

from common import F, PM, TPS, parcel_ic, summarize, vapor_mixing_to_q

from cloudmicrophysics_tpu.parameters.aerosol_species import Sulfate

if __name__ == "__main__":
    from cloudmicrophysics_tpu.ops import thermo as TDI

    N_a, T0, c_v0 = 5e8, 230.0, 5e-5
    q_v = float(vapor_mixing_to_q(c_v0))
    e_s = float(TDI.saturation_vapor_pressure_over_liquid(TPS, F(T0)))
    S_l = 0.99
    p0 = S_l * e_s / c_v0
    ic = parcel_ic(p0, T0, q_v, 0.0, 0.0, N_a, 0.0, 0.0)

    params = PM.parcel_params(
        aerosol_act="AeroAct", aerosol=Sulfate(), aero_sigma_g=2.3,
        r_nuc=3e-7, N_aer_act=N_a,
        condensation_growth="Condensation", const_dt=1.0, w=1.2)
    traj = summarize("ARG activation / Sulfate",
                     PM.run_parcel(ic, 0.0, 35.0, params))
    N_act = np.asarray(traj.N_liq)
    print(f"  activated fraction: {N_act[-1] / N_a:.3f} "
          f"(activation onset at step "
          f"{int(np.argmax(N_act > 1e3)) if (N_act > 1e3).any() else -1})")
