"""ML emulator hook for ARG aerosol activation.

TPU-native equivalent of ``/root/reference/ext/EmulatorModelsExt.jl``: a
flax MLP substitutes for the ARG parameterization behind the same
``N_activated_per_mode`` API, with the reference's mode-permutation trick
(the model predicts the first mode's activated fraction; other modes are
predicted by swapping them into the first slot).

Also provides the training-data generation pipeline mirrored from
``ext/Common.jl:30-60`` (sampling (mode parameters, w, T, p) and labeling
with the ARG parameterization) and a simple optax training loop.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    import optax

    HAVE_FLAX = True
except ImportError:  # pragma: no cover
    HAVE_FLAX = False

from ..ops import aerosol_activation as AA
from ..parameters.aerosol import AerosolDistribution, ModeKappa

__all__ = ["ActivationMLP", "emulator_features", "generate_training_data",
           "train_emulator", "N_activated_per_mode_emulated"]

if HAVE_FLAX:

    class ActivationMLP(nn.Module):
        """MLP predicting the activated fraction of the first mode."""

        hidden: Sequence[int] = (64, 64)

        @nn.compact
        def __call__(self, x):
            for h in self.hidden:
                x = nn.relu(nn.Dense(h)(x))
            return nn.sigmoid(nn.Dense(1)(x))[..., 0]

else:  # pragma: no cover

    class ActivationMLP:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise ImportError("flax is required for the activation emulator")


def emulator_features(ad, ap, w, T, p):
    """Feature vector per mode-permutation: (N, r_dry, stdev, hygro) per
    mode + (w, T, p), with log-scaled magnitudes."""
    hygro = AA.mean_hygroscopicity_parameter(ap, ad)
    feats = []
    for mode, h in zip(ad.modes, hygro):
        # normalized: log-number ~[6.5, 9.5]*ln10, log-radius ~[-19, -15]
        feats += [(jnp.log(jnp.asarray(mode.N)) - 18.0) / 4.0,
                  (jnp.log(jnp.asarray(mode.r_dry)) + 17.0) / 2.0,
                  jnp.asarray(mode.stdev) - 1.9, jnp.asarray(h)]
    feats += [jnp.log(jnp.asarray(w)), (jnp.asarray(T) - 285.0) / 15.0,
              (jnp.asarray(p) - 8.5e4) / 2e4]
    return jnp.stack(jnp.broadcast_arrays(*feats), axis=-1)


def generate_training_data(ap, aip, tps, n_samples=2048, n_modes=2, seed=0):
    """Sample (2-mode kappa aerosol, w, T, p) and label with the ARG
    parameterization (reference ext/Common.jl:30-60)."""
    rng = np.random.default_rng(seed)
    X, y = [], []
    for _ in range(n_samples):
        modes = tuple(
            ModeKappa(
                r_dry=float(10 ** rng.uniform(-8.2, -6.5)),
                stdev=float(rng.uniform(1.4, 2.4)),
                N=float(10 ** rng.uniform(6.5, 9.5)),
                vol_mix_ratio=(1.0,), mass_mix_ratio=(1.0,),
                molar_mass=(0.13214,),
                kappa=(float(rng.uniform(0.1, 1.2)),))
            for _ in range(n_modes))
        ad = AerosolDistribution(modes=modes)
        w = float(10 ** rng.uniform(-1.5, 0.7))
        T = float(rng.uniform(270.0, 300.0))
        p = float(rng.uniform(7e4, 1.02e5))
        # saturated humid state, no condensate (ARG assumption)
        from ..ops import thermo as TDI

        p_vs = float(TDI.saturation_vapor_pressure_over_liquid(
            tps, jnp.float64(T)))
        q_tot = 1 / (1 - tps.Rv_over_Rd * (p_vs - p) / p_vs)
        n_act = AA.N_activated_per_mode(ap, ad, aip, tps, jnp.float64(T),
                                        jnp.float64(p), jnp.float64(w),
                                        jnp.float64(q_tot), 0.0, 0.0)
        X.append(np.asarray(emulator_features(ad, ap, w, T, p)))
        y.append(float(n_act[0]) / modes[0].N)
    return np.stack(X), np.asarray(y)


def train_emulator(X, y, hidden=(64, 64), n_steps=2000, lr=1e-3, seed=0):
    """Train the MLP with optax Adam; returns (model, params)."""
    model = ActivationMLP(hidden=hidden)
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), X[:1])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, X)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    return model, params, float(loss)


def N_activated_per_mode_emulated(model, params, ap, ad, aip, tps,
                                  T, p, w, q_tot, q_liq, q_ice):
    """Emulated activated number per mode (reference
    ext/EmulatorModelsExt.jl:32-67): predict mode 1's activated fraction,
    permuting each mode into the first slot."""
    n_modes = len(ad.modes)
    out = []
    for i in range(n_modes):
        perm = list(range(n_modes))
        perm[0], perm[i] = perm[i], perm[0]
        ad_p = AerosolDistribution(modes=tuple(ad.modes[j] for j in perm))
        x = emulator_features(ad_p, ap, w, T, p)
        frac = jnp.clip(model.apply(params, x[None])[0], 0.0, 1.0)
        out.append(frac * ad.modes[i].N)
    return tuple(out)
