"""Core special-function numerics (L0).

TPU-native implementations of the fixed-iteration incomplete-gamma kernels
and small-number utilities from the reference's ``src/Utilities.jl``:

* :func:`gamma_inc` — fixed-iteration regularized incomplete gamma
  ``(P(a,x), Q(a,x))`` (series + Lentz continued fraction, branchless
  selection; reference ``src/Utilities.jl:33-144``).
* :func:`gamma_inc_inv` — Halley iteration inverse
  (reference ``src/Utilities.jl:160-252``).
* smallness thresholds ``eps_numerics*`` (reference ``src/Utilities.jl:254-341``),
* :func:`sgs_weight_function` / regularised ratios
  (reference ``src/Utilities.jl:415-509``),
* :func:`logsumexp` shift-by-max over a stacked axis
  (reference ``src/Utilities.jl:343-412``).

Design notes (TPU-first):

* All loops are **static trip count** ``lax.fori_loop`` — the reference
  fixes iteration counts for warp convergence
  (20 for f32 / 30 for f64); XLA requires static trip counts anyway.
* Both the series and continued-fraction branches are evaluated and
  selected with ``jnp.where`` (array semantics — no per-element
  branching exists on the VPU). Dead-branch inputs are sanitized so the
  discarded branch stays finite for ``jax.grad``.
* Analytic derivative rules via ``jax.custom_jvp``: the x-derivative is
  ``∂P/∂x = x^{a-1} e^{-x} / Γ(a)``; the a-derivative is *not*
  implemented — a nonzero ``a`` tangent yields NaN rather than a silently
  wrong zero gradient (the reference raises; under tracing we cannot).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "atanh",
    "cbrt",
    "clamp_to_nonneg",
    "eps_numerics",
    "eps_numerics_2M_M",
    "eps_numerics_2M_N",
    "eps_numerics_P3_B",
    "expm1",
    "fac",
    "gamma_inc",
    "gamma_inc_inv",
    "lgamma",
    "gamma",
    "logsumexp",
    "raw_special_functions",
    "sgs_weight_function",
    "regularised_ratio",
    "rime_mass_fraction",
    "rime_density",
]


# ---------------------------------------------------------------------------
# dtype helpers
# ---------------------------------------------------------------------------

def float_dtype(*args):
    """The common floating dtype of the arguments (respecting x64 config)."""
    dt = jnp.result_type(*args)
    if not jnp.issubdtype(dt, jnp.floating):
        dt = jnp.result_type(float)
    return dt


def _finfo(dt):
    return jnp.finfo(dt)


def machine_eps(dt) -> float:
    return float(_finfo(dt).eps)


def floatmin(dt) -> float:
    return float(_finfo(dt).tiny)


# ---------------------------------------------------------------------------
# Smallness thresholds — two-tier epsilon discipline
# (reference src/Utilities.jl:254-341)
# ---------------------------------------------------------------------------

def eps_numerics(dt) -> float:
    """1-moment presence threshold: ``cbrt(floatmin)`` (~3.8e-13 @ f32)."""
    return float(floatmin(dt) ** (1.0 / 3.0))


def eps_numerics_2M_M(dt) -> float:
    """2-moment mass presence threshold: machine eps."""
    return machine_eps(dt)


def eps_numerics_2M_N(dt) -> float:
    """2-moment number presence threshold: machine eps."""
    return machine_eps(dt)


def eps_numerics_P3_B(dt) -> float:
    """P3 rime-volume (B_rim) presence threshold: machine eps."""
    return machine_eps(dt)


def clamp_to_nonneg(x):
    """Domain sanitization (NOT a physical threshold): ``max(x, 0)``."""
    return jnp.maximum(x, jnp.zeros_like(x))


def fac(n: int) -> int:
    """Integer factorial, host-side (reference src/Utilities.jl:299-308)."""
    if not 0 <= n <= 20:
        raise ValueError(f"fac(n) is defined for 0 <= n <= 20, got {n}")
    return math.factorial(n)


# ---------------------------------------------------------------------------
# Mosaic-safe elementwise transcendentals
#
# Pallas TPU lowering (Mosaic) implements exp/log/log1p/tanh/pow/sqrt but
# not expm1/atanh/cbrt/lgamma (probed on v5e). The versions below are built
# from the supported set so every op in this library lowers into a Pallas
# kernel unchanged; the XLA jit path uses the same definitions, keeping the
# two paths numerically identical.
# ---------------------------------------------------------------------------

def expm1(x):
    """``exp(x) - 1`` stable at 0, via ``tanh``: with ``t = tanh(x/2)``,
    ``e^x - 1 = 2t / (1 - t)`` (exact identity; tanh is a Mosaic
    primitive). Falls back to ``exp(x) - 1`` for |x| >= 1 where
    cancellation is gone and the identity's ``1 - t`` would underflow."""
    x = jnp.asarray(x, float_dtype(x))
    t = jnp.tanh(x / 2)
    small = jnp.abs(x) < 1.0
    t_s = jnp.where(small, t, jnp.zeros_like(t))
    return jnp.where(small, 2 * t_s / (1 - t_s), jnp.exp(x) - 1)


def atanh(x):
    """``atanh(x) = (log1p(x) - log1p(-x)) / 2`` (log1p is a Mosaic
    primitive)."""
    return (jnp.log1p(x) - jnp.log1p(-x)) / 2


def cbrt(x):
    """Signed cube root via ``pow`` (Mosaic primitive)."""
    x = jnp.asarray(x, float_dtype(x))
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


# Lanczos g=7, n=9 coefficients (double precision; Boost/Numerical Recipes
# standard set). Positive-argument only — every shape parameter in this
# library (mu + k + 1, a, b + delta, ...) is > 0.
_LANCZOS_G = 7.0
_LANCZOS_COEFFS = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)
_HALF_LOG_2PI = 0.5 * math.log(2 * math.pi)


def _lgamma_pos(z):
    """Mosaic-safe ``log Gamma(z)`` for ``z > 0`` (Lanczos, abs err
    ~1e-13 in f64). Dead-branch-safe: z <= 0 is sanitized, not NaN."""
    z = jnp.asarray(z, float_dtype(z))
    z = jnp.maximum(z, jnp.asarray(jnp.finfo(z.dtype).tiny, z.dtype)) - 1
    series = jnp.full_like(z, _LANCZOS_COEFFS[0])
    for i, c in enumerate(_LANCZOS_COEFFS[1:], start=1):
        series = series + c / (z + i)
    t = z + _LANCZOS_G + 0.5
    return _HALF_LOG_2PI + (z + 0.5) * jnp.log(t) - t + jnp.log(series)


# ---------------------------------------------------------------------------
# lgamma / gamma wrappers
# ---------------------------------------------------------------------------

def lgamma(a):
    # Python scalars evaluate host-side: keeps them weakly typed (a traced
    # f32 computation is not silently promoted to f64 under x64) and lets
    # XLA constant-fold parameter-only gamma factors.
    if isinstance(a, (int, float)) and not isinstance(a, bool):
        return math.lgamma(a)
    return _lgamma_pos(a)


def gamma(a):
    return jnp.exp(lgamma(a))


# ---------------------------------------------------------------------------
# Incomplete gamma — fixed-iteration series + Lentz continued fraction
# ---------------------------------------------------------------------------

def _maxiters(dt) -> int:
    # Reference: 20 iterations for Float32, 30 for Float64
    # (src/Utilities.jl:103)
    return 30 if dt == jnp.float64 else 20


def loop_unroll() -> bool:
    """Whether fixed-trip solver loops should fully unroll.

    Unrolling is numerics-identical (same operations, same order) but
    changes the compiled form: on TPU the rolled loops round-trip their
    full-size array carries through HBM every iteration — unrolling fuses
    the whole solve into one kernel with carries in registers (measured
    1.3-8x on the P3 collision/crossover kernels, v5e). On CPU the same
    unrolling inflates the LLVM-JIT'd program enough to crash XLA:CPU on
    the biggest P3 graphs (known code-memory exhaustion), so CPU keeps the
    rolled form. Backend-conditional COMPILATION, identical MATH.
    """
    import jax

    return jax.default_backend() == "tpu"


def _gamma_inc_core(a, x, lgamma_a):
    """Both-branch evaluation of (P, Q); inputs must share a float dtype."""
    dt = a.dtype
    n = _maxiters(dt)
    tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-30, dt)
    one = jnp.asarray(1.0, dt)
    zero = jnp.asarray(0.0, dt)

    use_series = x < a + 1

    # factor = x^a e^-x / Gamma(a), via logs for stability
    x_log_safe = jnp.maximum(x, jnp.asarray(floatmin(dt), dt))
    factor = jnp.exp(a * jnp.log(x_log_safe) - x - lgamma_a)

    # --- Series branch: P(a,x) = factor * sum_k x^k / (a+1)...(a+k) -----
    # Dead-branch sanitization: when the CF branch is active, run the series
    # on x_s = a (inside its domain) so the discarded values stay finite.
    x_s = jnp.where(use_series, x, a)
    a_safe = jnp.maximum(a, jnp.asarray(floatmin(dt), dt))

    def series_body(k, carry):
        term, sum_p = carry
        term = term * x_s / (a_safe + k)
        return term, sum_p + term

    term0 = one / a_safe
    # see loop_unroll: register-resident carries on TPU, rolled on CPU
    _, sum_p = lax.fori_loop(1, n + 1, series_body, (term0, term0),
                             unroll=loop_unroll())
    P_series = jnp.clip(factor * sum_p, zero, one)

    # --- Continued fraction (Lentz) branch: Q(a,x) ----------------------
    # Dead-branch sanitization: x_c = a + 2 keeps b_k positive.
    x_c = jnp.where(use_series, a + 2, x)
    b1 = x_c + 1 - a
    c0 = b1 + 1 / tiny
    d0 = 1 / jnp.where(jnp.abs(b1) < tiny, tiny, b1)
    h0 = d0

    def cf_body(k, carry):
        c, d, h = carry
        ak = -k * (k - a)
        bk = x_c + 2 * k + 1 - a
        d_tmp = bk + ak * d
        d = jnp.where(jnp.abs(d_tmp) < tiny, tiny, d_tmp)
        c_tmp = bk + ak / c
        c = jnp.where(jnp.abs(c_tmp) < tiny, tiny, c_tmp)
        d = 1 / d
        return c, d, h * (c * d)

    _, _, h = lax.fori_loop(1, n + 1, cf_body, (c0, d0, h0),
                            unroll=loop_unroll())
    Q_cf = jnp.clip(factor * h, zero, one)

    P = jnp.where(use_series, P_series, one - Q_cf)
    Q = jnp.where(use_series, one - P_series, Q_cf)

    # Edge cases (reference src/Utilities.jl:94-98)
    P = jnp.where(x <= 0, zero, P)
    Q = jnp.where(x <= 0, one, Q)
    P = jnp.where(jnp.isposinf(x), one, P)
    Q = jnp.where(jnp.isposinf(x), zero, Q)
    isnan = jnp.isnan(x) | jnp.isnan(a)
    nan = jnp.asarray(jnp.nan, dt)
    return jnp.where(isnan, nan, P), jnp.where(isnan, nan, Q)


def _gamma_inc_impl(a, x):
    dt = float_dtype(a, x)
    a = jnp.asarray(a, dt)
    x = jnp.asarray(x, dt)
    a, x = jnp.broadcast_arrays(a, x)
    return _gamma_inc_core(a, x, _lgamma_pos(a))


# Pallas/Mosaic escape hatch: Mosaic cannot lower custom_jvp_call with
# symbolic_zeros, and Pallas kernels are forward-only (differentiating
# through a pallas_call needs explicit custom rules anyway), so kernel
# wrappers trace with the raw implementations instead.
_RAW_SPECIAL = contextvars.ContextVar("cmt_raw_special", default=False)


@contextlib.contextmanager
def raw_special_functions():
    """Trace special functions without their ``custom_jvp`` wrappers.

    Also flips the library into "VMEM-lean" mode: nested quadratures loop
    over outer nodes (``lax.fori_loop``) instead of materializing the full
    (n_outer, n_inner, tile) tensors, keeping Mosaic's scoped-VMEM usage
    bounded. Pallas kernel wrappers enter this context around tracing.
    """
    token = _RAW_SPECIAL.set(True)
    try:
        yield
    finally:
        _RAW_SPECIAL.reset(token)


def in_pallas_trace() -> bool:
    """True while tracing inside :func:`raw_special_functions`."""
    return _RAW_SPECIAL.get()


@jax.custom_jvp
def _gamma_inc_cjvp(a, x):
    return _gamma_inc_impl(a, x)


def gamma_inc(a, x):
    """Regularized incomplete gamma ``(P(a,x), Q(a,x))``.

    Fixed-iteration (20 @ f32 / 30 @ f64) series / Lentz continued fraction
    approximation, matching the reference kernel at
    ``src/Utilities.jl:93-144``. Differentiable in ``x`` (analytic rule);
    a nonzero tangent in ``a`` produces NaN (unsupported, by design).
    """
    if _RAW_SPECIAL.get():
        return _gamma_inc_impl(a, x)
    return _gamma_inc_cjvp(a, x)


def _is_sym_zero(t) -> bool:
    return isinstance(t, jax.custom_derivatives.SymbolicZero)


@lambda f: _gamma_inc_cjvp.defjvp(f, symbolic_zeros=True)
def _gamma_inc_jvp(primals, tangents):
    a, x = primals
    da, dx = tangents
    dt = float_dtype(a, x)
    a = jnp.asarray(a, dt)
    x = jnp.asarray(x, dt)
    P, Q = gamma_inc(a, x)
    x_safe = jnp.maximum(x, jnp.asarray(floatmin(dt), dt))
    deriv = jnp.where(
        x > 0, jnp.exp((a - 1) * jnp.log(x_safe) - x - _lgamma_pos(a)), 0.0
    )
    # d/da is not implemented: a structurally-constant `a` (symbolic zero
    # tangent) is fine; an `a` that depends on the differentiation variable
    # poisons the gradient with NaN instead of a silently wrong zero
    # (the reference raises; src/Utilities.jl:146-158).
    zero = jnp.zeros_like(P)
    bad = zero if _is_sym_zero(da) else jnp.asarray(jnp.nan, dt) * da
    dxc = zero if _is_sym_zero(dx) else jnp.asarray(dx, dt)
    dP = deriv * dxc + bad
    dQ = -deriv * dxc + bad
    return (P, Q), (dP, dQ)


def gamma_inc_lower(a, x):
    """Convenience: lower regularized incomplete gamma ``P(a, x)``."""
    return gamma_inc(a, x)[0]


def gamma_inc_upper(a, x):
    """Convenience: upper regularized incomplete gamma ``Q(a, x)``."""
    return gamma_inc(a, x)[1]


# ---------------------------------------------------------------------------
# Inverse incomplete gamma — Halley iteration
# ---------------------------------------------------------------------------

_HALLEY_ITERS = 15  # reference src/Utilities.jl:225


def _ndtri_acklam(p):
    """Standard-normal inverse CDF, Acklam's rational approximation
    (max |rel err| ~1.15e-9) — pure arithmetic + log/sqrt, so it lowers
    on Mosaic (erfinv does not). Central + two tail branches, evaluated
    branchlessly."""
    dt = p.dtype
    a_ = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
    b_ = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
    c_ = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
    d_ = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
    tiny = jnp.asarray(floatmin(dt), dt)
    p_c = jnp.clip(p, tiny, 1 - machine_eps(dt))

    def poly(cs, x):
        r = jnp.zeros_like(x) + cs[0]
        for ci in cs[1:]:
            r = r * x + ci
        return r

    # central region
    qc = p_c - 0.5
    r = qc * qc
    x_mid = qc * poly(a_, r) / (poly(b_, r) * r + 1)
    # lower tail
    ql = jnp.sqrt(-2 * jnp.log(jnp.where(p_c < 0.02425, p_c, 0.01)))
    x_lo = poly(c_, ql) / (poly(d_, ql) * ql + 1)
    # upper tail
    qu = jnp.sqrt(-2 * jnp.log(jnp.where(p_c > 1 - 0.02425, 1 - p_c, 0.01)))
    x_hi = -poly(c_, qu) / (poly(d_, qu) * qu + 1)
    return jnp.where(p_c < 0.02425, x_lo,
                     jnp.where(p_c > 1 - 0.02425, x_hi, x_mid))


def _gamma_inc_inv_impl(a, p, q, n_iters=_HALLEY_ITERS):
    dt = float_dtype(a, p, q)
    a = jnp.asarray(a, dt)
    p = jnp.asarray(p, dt)
    q = jnp.asarray(q, dt)
    a, p, q = jnp.broadcast_arrays(a, p, q)

    tiny = jnp.asarray(floatmin(dt), dt)
    eps = jnp.asarray(machine_eps(dt), dt)

    # Initial guess (src/Utilities.jl:212-217), with a DiDonato–Morris-
    # style region fix beyond the reference: the series-inversion guess
    # (p Gamma(a+1))^(1/a) is the right start whenever it lands in the
    # small-x regime (< 1/2), not only for p < 0.5. For small a the true
    # root can be ~1e-3 at p ~ 0.6; started from a - log(q) ~ 1, fifteen
    # positivity-halving Halley steps cannot reach it and the inverse
    # returns garbage (the reference inherits exactly this failure).
    p_safe = jnp.maximum(p, tiny)
    q_safe = jnp.maximum(q, tiny)
    lgamma_a = _lgamma_pos(a)
    a_safe = jnp.maximum(a, tiny)
    guess_lo = jnp.exp((jnp.log(p_safe) + _lgamma_pos(a + 1)) / a_safe)
    # Large-x start: Wilson-Hilferty (chi-square cube-of-normal), far
    # closer than the reference's a - log(q) (e.g. at q = 1e-5 WH is
    # within ~5e-2 where a - log(q) can be off by >2x), so upper-tail
    # quantiles converge in ~3 Halley steps instead of ~6. The reference
    # start is kept as the fallback where WH collapses (t <= 0, small a).
    z = -_ndtri_acklam(q_safe)  # = ndtri(p), via q for upper-tail accuracy
    t_wh = 1 - 1 / (9 * a_safe) + z / (3 * jnp.sqrt(a_safe))
    guess_ref = a - jnp.log(q_safe)
    guess_hi = jnp.where(t_wh > 0.1, a * t_wh**3, guess_ref)
    # Extreme upper tail (q below ~1e-27): WH overshoots severalfold at
    # small-to-moderate a, landing where the residual is flat (Q(a,x0)
    # << q) so damped Halley crawls ~O(1) per step and 15 iterations
    # cannot walk back. There the classic asymptotic inversion of
    # Q ~ x^(a-1) e^-x / Gamma(a) — x* = L + (a-1) log L - lgamma(a),
    # L = -log q — is within a few percent; use it whenever the tail
    # regime is real (x* >> a; at large a with moderate L the quantile
    # sits near the bulk instead and WH is the right start).
    L_tail = -jnp.log(q_safe)
    guess_tail = L_tail + (a - 1) * jnp.log(jnp.maximum(L_tail, 1.0)) \
        - lgamma_a
    deep_tail = (L_tail > 60.0) & (guess_tail > 3 * a)
    guess_hi = jnp.where(deep_tail, jnp.maximum(guess_tail, tiny), guess_hi)
    x0 = jnp.where((p < 0.5) | (guess_lo < 0.5), guess_lo, guess_hi)
    x0 = jnp.maximum(x0, tiny)

    use_q = p > 0.5

    # NOTE: the convergence-freeze mask is carried as 0/1 float, not bool —
    # Mosaic fails to legalize scf.for with i1 vector carries.
    def body(_, carry):
        x, done = carry
        P, Q = _gamma_inc_core(a, x, lgamma_a)
        f = jnp.where(use_q, Q - q, P - p)
        x_pos = jnp.maximum(x, tiny)
        fprime_mag = jnp.exp((a - 1) * jnp.log(x_pos) - x - lgamma_a)
        fprime = jnp.where(use_q, -fprime_mag, fprime_mag)
        fp_zero = fprime == 0
        fprime_safe = jnp.where(fp_zero, jnp.asarray(1.0, dt), fprime)
        # f''/f' = (a - 1 - x)/x (sign-independent of residual choice)
        f2_over_f1 = (a - 1 - x) / x_pos
        denom = 1 - 0.5 * f / fprime_safe * f2_over_f1
        step = f / (fprime_safe * denom)
        # Protect against stepping to x <= 0
        step = jnp.where(x - step <= 0, 0.5 * x, step)
        x_new = x - step
        done_pre = (done > 0.5) | fp_zero
        x = jnp.where(done_pre, x, x_new)
        done_new = done_pre | (jnp.abs(step) < eps * x_new)
        return x, done_new.astype(dt)

    x, _ = lax.fori_loop(0, n_iters, body,
                         (x0, jnp.zeros_like(x0)), unroll=loop_unroll())

    x = jnp.where(p <= 0, jnp.asarray(0.0, dt), x)
    x = jnp.where(q <= 0, jnp.asarray(jnp.inf, dt), x)
    isnan = jnp.isnan(a) | jnp.isnan(p) | jnp.isnan(q)
    return jnp.where(isnan, jnp.asarray(jnp.nan, dt), x)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def _gamma_inc_inv_cjvp(a, p, q, n_iters):
    return _gamma_inc_inv_impl(a, p, q, n_iters)


def gamma_inc_inv(a, p, q, n_iters=_HALLEY_ITERS):
    """Inverse of :func:`gamma_inc`: ``x`` such that ``P(a,x) = p``.

    Halley's method, fixed 15 iterations with convergence freezing
    (reference ``src/Utilities.jl:205-252``). The ``Q - q`` residual is used
    for ``p > 0.5`` to avoid catastrophic cancellation. Differentiable in
    ``p`` via the inverse function theorem; ``a`` tangents yield NaN.

    ``n_iters`` trades precision for VPU work — each Halley step costs a
    full fixed-trip :func:`gamma_inc`. PSD integration-bound quantiles
    (tail windows whose integrand is ~0 at the endpoints) use 4:
    measured <=2.6e-7 relative on the bound over a in [0.3, 20] at the
    1e-5/1e-6 tails (the Wilson-Hilferty upper-tail start converges in
    3-4 steps; the reference's ``a - log q`` start needed 6), far below
    quadrature truncation error at a ~4x saving over the full 15. The
    JVP (inverse function theorem) is exact regardless of ``n_iters``.
    """
    if _RAW_SPECIAL.get():
        return _gamma_inc_inv_impl(a, p, q, n_iters)
    return _gamma_inc_inv_cjvp(a, p, q, n_iters)


@lambda f: _gamma_inc_inv_cjvp.defjvp(f, symbolic_zeros=True)
def _gamma_inc_inv_jvp(n_iters, primals, tangents):
    a, p, q = primals
    da, dp, _dq = tangents
    dt = float_dtype(a, p, q)
    a = jnp.asarray(a, dt)
    x = gamma_inc_inv(a, p, q, n_iters)
    x_safe = jnp.maximum(x, jnp.asarray(floatmin(dt), dt))
    dP_dx = jnp.exp((a - 1) * jnp.log(x_safe) - x - _lgamma_pos(a))
    dx_dp = jnp.where(dP_dx > 0, 1.0 / jnp.maximum(dP_dx, floatmin(dt)), 0.0)
    zero = jnp.zeros_like(x)
    bad = zero if _is_sym_zero(da) else jnp.asarray(jnp.nan, dt) * da
    dpc = zero if _is_sym_zero(dp) else jnp.asarray(dp, dt)
    return x, dx_dp * dpc + bad


# ---------------------------------------------------------------------------
# logsumexp over a stacked axis (reference: unrolled_logsumexp over tuples)
# ---------------------------------------------------------------------------

def logsumexp(x, axis=-1):
    """Shift-by-max ``log(sum(exp(x)))`` along ``axis``.

    Non-finite maxima are passed through directly (avoids Inf - Inf;
    reference ``src/Utilities.jl:399-412``).
    """
    xmax = jnp.max(x, axis=axis)
    finite = jnp.isfinite(xmax)
    shift = jnp.where(finite, xmax, jnp.zeros_like(xmax))
    s = jnp.sum(jnp.exp(x - jnp.expand_dims(shift, axis)), axis=axis)
    return jnp.where(finite, shift + jnp.log(s), xmax)


# ---------------------------------------------------------------------------
# SGS weight function + regularised ratios (reference src/Utilities.jl:415-509)
# ---------------------------------------------------------------------------

def sgs_weight_function(a, a_half):
    """Smooth monotone weight ``w(a) ∈ [0, 1]`` with ``w(a_half) = 1/2``.

    ``tanh ∘ atanh`` sigmoid with midpoint control; reference
    ``src/Utilities.jl:445-457``.
    """
    dt = float_dtype(a, a_half)
    a = jnp.asarray(a, dt)
    eps = machine_eps(dt)
    upper = jnp.minimum(jnp.asarray(1.0 - eps, dt), 42.0 * a_half)
    a_s = jnp.clip(a, eps, upper)
    k = -1.0 / (jnp.log2(jnp.asarray(1.0, dt) - a_half))
    inner = 1 - 2 * (1 - a_s) ** k
    inner = jnp.clip(inner, -1.0 + eps, 1.0 - eps)
    w = (1 + jnp.tanh(2 * atanh(inner))) / 2
    w = jnp.where(a < 0, jnp.zeros_like(w), w)
    w = jnp.where(4 * a < eps, jnp.zeros_like(w), w)
    w = jnp.where(a > jnp.minimum(jnp.asarray(1.0, dt), 42.0 * a_half),
                  jnp.ones_like(w), w)
    return w


def regularised_ratio(numerator, denominator, half=None, eps=None):
    """``numerator / denominator`` blended smoothly to 0 for small denominators.

    Reference ``src/Utilities.jl:469-479``.
    """
    dt = float_dtype(numerator, denominator)
    if half is None:
        half = machine_eps(dt)
    if eps is None:
        eps = machine_eps(dt) ** 2
    w = sgs_weight_function(denominator, half)
    denom_safe = jnp.where(
        denominator < eps, jnp.asarray(1.0, dt), denominator
    )
    out = w * numerator / denom_safe
    return jnp.where(denominator < eps, jnp.zeros_like(out), out)


def rime_mass_fraction(q_rim, q_ice, half=None, eps=None):
    """Regularised ``F_rim = q_rim / q_ice`` clamped to [0, 1]."""
    return regularised_ratio(jnp.minimum(q_rim, q_ice), q_ice, half, eps)


def rime_density(q_rim, b_rim, half=None, eps=None):
    """Regularised ``rho_rim = q_rim / b_rim``."""
    return regularised_ratio(q_rim, b_rim, half, eps)
