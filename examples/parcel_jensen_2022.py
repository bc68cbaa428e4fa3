"""Homogeneous freezing at cirrus temperatures vs Jensen et al. (2022)
Fig 1 (reference parcel/Example_Jensen_et_al_2022.jl)."""

import numpy as np

from common import F, PM, TPS, parcel_ic, vapor_mixing_to_q

# Jensen (2022) Fig 1 digitized (reference Example_Jensen_et_al_2022.jl:53-58)
JENSEN_T_SAT = [0, 62.71, 70.52, 76.87, 82.4, 84.84, 88.1, 92, 96.07,
                100.63, 105.35, 112.51, 119.83]
JENSEN_SAT = [1.55, 1.694, 1.7107, 1.7208, 1.725, 1.726, 1.7259, 1.722,
              1.715, 1.702, 1.686, 1.653, 1.6126]
JENSEN_ICNC_END = 17.086  # cm^-3 at t=120 s

if __name__ == "__main__":
    import jax.numpy as jnp

    from cloudmicrophysics_tpu.ops import thermo as TDI

    T0, c_v0 = 190.0, 5e-6
    N_l, r0, sigma = 300e6, 25e-9, 2.0
    q_v = float(vapor_mixing_to_q(c_v0))
    q_l = N_l * 4 / 3 * np.pi * np.exp((6 * np.log(r0) + 9 * sigma**2) / 2)
    e_s = float(TDI.saturation_vapor_pressure_over_liquid(TPS, F(T0)))
    xi = e_s / float(TDI.saturation_vapor_pressure_over_ice(TPS, F(T0)))
    S_l = 1.55 / xi
    p0 = S_l * e_s / c_v0
    ic = parcel_ic(p0, T0, q_v, q_l, 0.0, 0.0, N_l, 0.0)

    params = PM.parcel_params(homogeneous="ABHOM",
                              deposition_growth="Deposition",
                              const_dt=0.01, w=1.0)
    traj = PM.run_parcel(ic, 0.0, 120.0, params)
    S_i = np.asarray(traj.S_l) * xi  # approximately (T drifts ~1 K)
    icnc = np.asarray(traj.N_ice) / 1e6
    t = np.arange(len(S_i)) * 0.01
    print(f"peak S_ice = {S_i.max():.4f} (Jensen: 1.726)")
    print(f"ICNC(end)  = {icnc[-1]:.2f} cm^-3 (Jensen: {JENSEN_ICNC_END})")
    for tt, ss in zip(JENSEN_T_SAT[::4], JENSEN_SAT[::4]):
        print(f"  t={tt:6.1f}s  S_i={np.interp(tt, t, S_i):.4f} "
              f"(Jensen {ss:.4f})")
