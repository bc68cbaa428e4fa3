"""Three-period cirrus simulation following Tully et al. (2023)
(reference parcel/Example_Tully_et_al_2023.jl): three 30-minute large-scale
steps, re-initializing T and q_vap between periods, MohlerAF vs MohlerRate
deposition nucleation on desert dust."""

import dataclasses

import numpy as np

from common import PM, parcel_ic, summarize

from cloudmicrophysics_tpu.parameters.aerosol_species import DesertDust

if __name__ == "__main__":
    N_aer = 2000e3
    p0, T0, qv0 = 20000.0, 230.0, 3.3e-4
    T2, T3 = 229.25, 228.55
    t_max = 30 * 60.0

    for mode in ("MohlerAF", "MohlerRate"):
        params = PM.parcel_params(
            aerosol=DesertDust(), deposition=mode,
            deposition_growth="Deposition",
            liq_size_distribution="Monodisperse",
            r_nuc=0.5e-4 * 1e-6, const_dt=0.1, w=3.5e-2)

        ic = parcel_ic(p0, T0, qv0, 0.0, 0.0, N_aer, 0.0, 0.0)
        traj1 = PM.run_parcel(ic, 0.0, t_max, params)
        # period 2/3: reset T and q_vap, keep p/q_ice/N from previous end
        ic2 = parcel_ic(float(traj1.p_air[-1]), T2, qv0, 0.0,
                        float(traj1.q_ice[-1]), float(traj1.N_aer[-1]),
                        float(traj1.N_liq[-1]), float(traj1.N_ice[-1]))
        traj2 = PM.run_parcel(ic2, t_max, 2 * t_max, params)
        ic3 = parcel_ic(float(traj2.p_air[-1]), T3, qv0, 0.0,
                        float(traj2.q_ice[-1]), float(traj2.N_aer[-1]),
                        float(traj2.N_liq[-1]), float(traj2.N_ice[-1]))
        traj3 = PM.run_parcel(ic3, 2 * t_max, 3 * t_max, params)

        print(f"== Tully 2023 / {mode} ==")
        for i, tr in enumerate((traj1, traj2, traj3), 1):
            print(f"  period {i}: N_ice {float(tr.N_ice[0]):.3e} -> "
                  f"{float(tr.N_ice[-1]):.3e} 1/m^3, "
                  f"peak S_l = {float(np.max(np.asarray(tr.S_l))):.4f}")
