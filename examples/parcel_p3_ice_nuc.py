"""P3-scheme ice nucleation modes (dep / het / hom)
(reference parcel/Example_P3_ice_nuc.jl)."""

import numpy as np

from common import PM, parcel_ic, summarize

from cloudmicrophysics_tpu.parameters.aerosol_species import Illite

if __name__ == "__main__":
    N_a, N_l, r_l = 2000.0, 2000.0, 1.25e-6
    p0, q_v = 20000.0, 5e-4
    q_l = N_l * 4 / 3 * np.pi * r_l**3 * 1000.0 / 1.2
    runs = (("P3_dep", 235.0, dict(deposition="P3_dep")),
            ("P3_het", 235.0, dict(heterogeneous="P3_het",
                                   aerosol=Illite())),
            ("P3_hom", 233.2, dict(homogeneous="P3_hom")))
    for name, T0, sel in runs:
        ic = parcel_ic(p0, T0, q_v, q_l, 0.0, N_a, N_l, 0.0)
        params = PM.parcel_params(
            deposition_growth="Deposition",
            ice_size_distribution="Monodisperse",
            r_nuc=1.25e-6, const_dt=0.1, w=0.5, **sel)
        traj = summarize(f"P3 nucleation / {name}",
                         PM.run_parcel(ic, 0.0, 50.0, params))
        print(f"  ICNC end = {float(traj.N_ice[-1]) / 1e6:.3e} cm^-3")
