"""P3 (Morrison-Milbrandt 2015) nucleation vs water-activity-based
parameterizations (reference parcel/Example_P3_vs_activitybased.jl):
P3_dep vs ABDINM, P3_het vs ABIFM, P3_hom vs ABHOM."""

import numpy as np

from common import PM, parcel_ic

from cloudmicrophysics_tpu.parameters.aerosol_species import (
    DesertDust,
    Feldspar,
    Ferrihydrite,
    Illite,
    Kaolinite,
)

if __name__ == "__main__":
    N_a, N_l, r_l = 2000.0, 2000.0, 1.25e-6
    p0, q_v = 20000.0, 8.3e-4
    q_l = N_l * 4 / 3 * np.pi * r_l**3 * 1000.0 / 1.2
    T_dep, T_het, T_hom = 238.0, 239.0, 236.5

    def run(T0, **sel):
        ic = parcel_ic(p0, T0, q_v, q_l, 0.0, N_a, N_l, 0.0)
        params = PM.parcel_params(
            deposition_growth="Deposition",
            ice_size_distribution="Monodisperse",
            r_nuc=1.25e-6, const_dt=0.1, w=0.5, **sel)
        traj = PM.run_parcel(ic, 0.0, 50.0, params)
        return float(traj.N_ice[-1])

    print("== deposition:  P3_dep vs ABDINM ==")
    print(f"  P3_dep              N_ice = {run(T_dep, deposition='P3_dep'):.3e}")
    for aero in (Feldspar(), Ferrihydrite(), Kaolinite()):
        print(f"  ABDINM {type(aero).__name__:13s} N_ice = "
              f"{run(T_dep, deposition='ABDINM', aerosol=aero, A_aer=1e-10):.3e}")

    print("== immersion:   P3_het vs ABIFM ==")
    print(f"  P3_het              N_ice = {run(T_het, heterogeneous='P3_het'):.3e}")
    for aero in (DesertDust(), Illite(), Kaolinite()):
        n = run(T_het, heterogeneous="ABIFM", aerosol=aero,
                condensation_growth="Condensation")
        print(f"  ABIFM  {type(aero).__name__:13s} N_ice = {n:.3e}")

    print("== homogeneous: P3_hom vs ABHOM ==")
    print(f"  P3_hom              N_ice = {run(T_hom, homogeneous='P3_hom'):.3e}")
    print(f"  ABHOM               N_ice = {run(T_hom, homogeneous='ABHOM'):.3e}")
