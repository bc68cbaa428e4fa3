"""ABIFM immersion freezing of illite-containing droplets
(reference parcel/Example_Immersion_Freezing.jl)."""

import numpy as np

from common import PM, frozen_fraction, parcel_ic, summarize

from cloudmicrophysics_tpu.parameters.aerosol_species import Illite

if __name__ == "__main__":
    N_l, r0 = 2e8, 1e-6
    q_l = N_l * 4 / 3 * np.pi * r0**3 * 1000.0 / 1.2
    ic = parcel_ic(800e2, 251.0, 8.1e-4, q_l, 0.0, 0.0, N_l, 0.0)
    for dsd in ("Monodisperse", "Gamma"):
        params = PM.parcel_params(
            aerosol=Illite(), heterogeneous="ABIFM",
            condensation_growth="Condensation",
            deposition_growth="Deposition",
            liq_size_distribution=dsd, ice_size_distribution=dsd,
            const_dt=1.0, w=0.4)
        traj = summarize(f"ABIFM immersion / {dsd}",
                         PM.run_parcel(ic, 0.0, 600.0, params))
        ff = np.asarray(frozen_fraction(traj))
        print(f"  frozen fraction: t=300s {ff[300]:.3e}, "
              f"t=600s {ff[-1]:.3e} (monotone: {bool((np.diff(ff) >= -1e-12).all())})")
