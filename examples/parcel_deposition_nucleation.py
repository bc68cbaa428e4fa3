"""Deposition nucleation on dust in a cirrus-like parcel
(reference parcel/Example_Deposition_Nucleation.jl)."""

from common import PM, parcel_ic, summarize

from cloudmicrophysics_tpu.parameters.aerosol_species import (
    ArizonaTestDust,
    DesertDust,
    Feldspar,
    Ferrihydrite,
    Kaolinite,
)

if __name__ == "__main__":
    ic = parcel_ic(20000.0, 230.0, 3.3e-4, 0.0, 0.0, 2000e3, 0.0, 0.0)
    runs = ([("MohlerRate", a) for a in (DesertDust(), ArizonaTestDust())]
            + [("ABDINM", a) for a in (Feldspar(), Ferrihydrite(),
                                       Kaolinite())])
    for mode, aero in runs:
        params = PM.parcel_params(
            aerosol=aero, deposition=mode, deposition_growth="Deposition",
            ice_size_distribution="Monodisperse",
            r_nuc=1.25e-6, const_dt=0.1, w=3.5e-2)
        traj = PM.run_parcel(ic, 0.0, 100.0, params)
        summarize(f"{mode} / {type(aero).__name__}", traj)
