"""On-device ODE integration (replaces torchdiffeq.odeint, reference
train_gde.py:78-85 and run_gnode.py:134-135).

Design for XLA:
  * Fixed-step solvers (euler / midpoint / rk4) run as `lax.scan` over the
    requested time grid with a static number of substeps per interval —
    fully reverse-differentiable, optionally rematerialized with
    `jax.checkpoint` per step so long horizons fit memory (SURVEY.md §5
    "long-context" equivalent).
  * Adaptive Dopri5 runs as a *bounded* `lax.scan` with per-iteration
    accept/reject masking and a PI step-size controller. A bounded scan
    (instead of `lax.while_loop`) keeps reverse-mode autodiff available.
    Tolerances follow torchdiffeq semantics: err_norm = RMS of
    err / (atol + rtol * max(|y0|, |y1|)) <= 1 accepts the step.
  * `odeint_adjoint` integrates the adjoint system backwards with constant
    memory via `jax.custom_vjp` (continuous adjoint method).

Fixed-step semantics match torchdiffeq's fixed-grid solvers: one step per
consecutive pair of requested times (so `t=[0,1]`, method='euler' is a
single Euler step — exactly the reference GDE training configuration,
train_gde.py:482-485).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

# ---------------------------------------------------------------------------
# Fixed-step solvers
# ---------------------------------------------------------------------------


def _euler_step(func, t0, dt, y0):
    return y0 + dt * func(t0, y0)


def _midpoint_step(func, t0, dt, y0):
    k1 = func(t0, y0)
    k2 = func(t0 + dt / 2, y0 + dt / 2 * k1)
    return y0 + dt * k2


def _rk4_step(func, t0, dt, y0):
    k1 = func(t0, y0)
    k2 = func(t0 + dt / 2, y0 + dt / 2 * k1)
    k3 = func(t0 + dt / 2, y0 + dt / 2 * k2)
    k4 = func(t0 + dt, y0 + dt * k3)
    return y0 + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


_FIXED_STEPS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "rk4": _rk4_step,
}

# ---------------------------------------------------------------------------
# Dormand-Prince 5(4) tableau
# ---------------------------------------------------------------------------

_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
# 5th order solution weights (same as last A row: FSAL)
_DP_B = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
# 4th order embedded solution weights
_DP_B_STAR = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def _dopri5_step(func, t0, dt, y0):
    """One Dopri5 step: returns (y1, err) where err is the 5th-4th order
    difference estimate."""
    ks = []
    for i in range(7):
        ti = t0 + _DP_C[i] * dt
        yi = y0
        for j, aij in enumerate(_DP_A[i]):
            yi = yi + dt * aij * ks[j]
        ks.append(func(ti, yi))
    k = jnp.stack(ks)
    y1 = y0 + dt * jnp.tensordot(_DP_B, k, axes=1)
    err = dt * jnp.tensordot(_DP_B - _DP_B_STAR, k, axes=1)
    return y1, err


def _error_norm(err, y0, y1, rtol, atol):
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return jnp.sqrt(jnp.mean((err / scale) ** 2))


def _initial_step(func, t0, y0, rtol, atol):
    """Hairer's initial step size heuristic (as in torchdiffeq)."""
    f0 = func(t0, y0)
    scale = atol + jnp.abs(y0) * rtol
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = func(t0 + h0, y1)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / 5.0),
    )
    return jnp.minimum(100 * h0, h1)


class _AdaptState(NamedTuple):
    t: jnp.ndarray
    y: jnp.ndarray
    dt: jnp.ndarray
    prev_err: jnp.ndarray
    done: jnp.ndarray


def _dopri5_integrate_interval(func, y0, t0, t1, dt0, rtol, atol, max_steps):
    """Integrate from t0 to t1 with adaptive steps inside a bounded scan.

    Returns (y(t1), last_dt, last_err). Iterations after reaching t1 are
    masked no-ops, keeping the scan reverse-differentiable.
    """
    safety, min_factor, max_factor, order = 0.9, 0.2, 10.0, 5.0

    def body(s: _AdaptState, _):
        dt = jnp.minimum(s.dt, t1 - s.t)
        y1, err = _dopri5_step(func, s.t, dt, s.y)
        # Step-size control is treated as a non-differentiable schedule
        # (gradients through accepted solution values only) — matches the
        # discrete-adjoint convention of torchdiffeq/diffrax.
        en = jax.lax.stop_gradient(_error_norm(err, s.y, y1, rtol, atol))
        # Divergence guard (SURVEY.md §5 failure-detection): a non-finite
        # error estimate rejects the step and halves dt instead of
        # propagating NaNs.
        en = jnp.where(jnp.isfinite(en), en, jnp.inf)
        accept = en <= 1.0
        # PI controller (torchdiffeq uses ifactor/dfactor clipping).
        factor = jnp.clip(
            safety * (1.0 / jnp.maximum(en, 1e-10)) ** (1.0 / order),
            min_factor,
            max_factor,
        )
        new_dt = s.dt * factor
        t_next = jnp.where(accept, s.t + dt, s.t)
        y_next = jnp.where(accept, y1, s.y)
        done = s.done | (t_next >= t1 - 1e-12)
        # Freeze once done.
        t_next = jnp.where(s.done, s.t, t_next)
        y_next = jnp.where(s.done, s.y, y_next)
        new_dt = jnp.where(s.done, s.dt, new_dt)
        return _AdaptState(t_next, y_next, new_dt, en, done), None

    init = _AdaptState(
        t0, y0, jnp.maximum(dt0, 1e-8), jnp.ones_like(dt0), t0 >= t1 - 1e-12
    )
    out, _ = jax.lax.scan(body, init, None, length=max_steps)
    return out.y, out.dt, out.done


def odeint(
    func: Callable,
    y0,
    t: jnp.ndarray,
    *,
    method: str = "dopri5",
    rtol: float = 1e-3,
    atol: float = 1e-4,
    substeps: int = 1,
    max_steps: int = 64,
    checkpoint: bool = False,
):
    """Integrate dy/dt = func(t, y) at the times in `t` (t[0] is initial).

    Args:
      func: callable (t, y_pytree) -> dy_pytree.
      y0: initial state (any pytree of arrays).
      t: (T,) monotonically increasing times.
      method: 'euler' | 'midpoint' | 'rk4' (fixed-step; `substeps` substeps
        per interval) or 'dopri5' (adaptive; up to `max_steps` attempts per
        interval).
      checkpoint: rematerialize each step in the backward pass.

    Returns:
      pytree like y0 with a leading time axis of length len(t).
    """
    flat0, unravel = ravel_pytree(y0)

    def flat_func(ti, yf):
        dy = func(ti, unravel(yf))
        dyf, _ = ravel_pytree(dy)
        return dyf

    t = jnp.asarray(t, dtype=flat0.dtype)

    if method in _FIXED_STEPS:
        stepper = _FIXED_STEPS[method]

        def interval(y, t_pair):
            t0, t1 = t_pair
            dt = (t1 - t0) / substeps

            def sub(y, i):
                ti = t0 + i * dt
                y = stepper(flat_func, ti, dt, y)
                return y, None

            body = sub
            if checkpoint:
                body = jax.checkpoint(sub)
            y, _ = jax.lax.scan(body, y, jnp.arange(substeps, dtype=t.dtype))
            return y, y

        _, ys = jax.lax.scan(interval, flat0, (t[:-1], t[1:]))
    elif method == "dopri5":
        dt0 = jax.lax.stop_gradient(_initial_step(flat_func, t[0], flat0, rtol, atol))

        def interval(carry, t_pair):
            y, dt = carry
            t0, t1 = t_pair
            fn = functools.partial(
                _dopri5_integrate_interval,
                flat_func,
                rtol=rtol,
                atol=atol,
                max_steps=max_steps,
            )
            if checkpoint:
                fn = jax.checkpoint(fn)
            y, dt, done = fn(y, t0, t1, dt)
            return (y, dt), y

        (_, _), ys = jax.lax.scan(interval, (flat0, dt0), (t[:-1], t[1:]))
    else:
        raise ValueError(f"Unknown method {method!r}")

    ys = jnp.concatenate([flat0[None], ys], axis=0)
    return jax.vmap(unravel)(ys)


# ---------------------------------------------------------------------------
# Continuous adjoint
# ---------------------------------------------------------------------------


def odeint_adjoint(
    func: Callable,
    y0,
    t: jnp.ndarray,
    params,
    *,
    method: str = "dopri5",
    rtol: float = 1e-3,
    atol: float = 1e-4,
    substeps: int = 1,
    max_steps: int = 64,
):
    """odeint with O(1)-memory gradients via the continuous adjoint method.

    `func(t, y, params) -> dy`; gradients flow to y0 and params. The
    backward pass integrates the augmented system (y, a, grad_params)
    backwards in time with the same solver, instead of differentiating
    through solver internals (the checkpointed-adjoint design from
    SURVEY.md §2.7).
    """
    kw = dict(method=method, rtol=rtol, atol=atol, substeps=substeps,
              max_steps=max_steps)

    @jax.custom_vjp
    def _solve(y0, params):
        return odeint(lambda ti, y: func(ti, y, params), y0, t, **kw)

    def _fwd(y0, params):
        ys = _solve(y0, params)
        return ys, (ys, params)

    def _bwd(res, g):
        ys, params = res
        flat_y, unravel_y = ravel_pytree(jax.tree.map(lambda a: a[0], ys))
        flat_p, unravel_p = ravel_pytree(params)
        T = t.shape[0]

        def aug_dyn(ti, aug):
            yf, af, _ = aug
            y = unravel_y(yf)

            def f_y(yf_):
                d = func(ti, unravel_y(yf_), params)
                return ravel_pytree(d)[0]

            def f_p(pf_):
                d = func(ti, y, unravel_p(pf_))
                return ravel_pytree(d)[0]

            dy, vjp_y = jax.vjp(f_y, yf)
            (a_dot,) = vjp_y(af)
            _, vjp_p = jax.vjp(f_p, flat_p)
            (p_dot,) = vjp_p(af)
            return (dy, -a_dot, -p_dot)

        def backseg(carry, i):
            af, gp = carry
            # integrate augmented system from t[i] down to t[i-1]
            yi = ravel_pytree(jax.tree.map(lambda a: a[i], ys))[0]
            gi = ravel_pytree(jax.tree.map(lambda a: a[i], g))[0]
            af = af + gi
            aug0 = (yi, af, jnp.zeros_like(flat_p))
            t_seg = jnp.stack([-t[i], -t[i - 1]])

            def neg_dyn(ti, aug):
                d = aug_dyn(-ti, aug)
                return jax.tree.map(lambda a: -a, d)

            out = odeint(neg_dyn, aug0, t_seg, **kw)
            _, af1, gp1 = jax.tree.map(lambda a: a[-1], out)
            return (af1, gp + gp1), None

        a0 = jnp.zeros_like(flat_y)
        gp0 = jnp.zeros_like(flat_p)
        (af, gp), _ = jax.lax.scan(
            backseg, (a0, gp0), jnp.arange(T - 1, 0, -1)
        )
        g0 = ravel_pytree(jax.tree.map(lambda a: a[0], g))[0]
        af = af + g0
        return unravel_y(af), unravel_p(gp)

    _solve.defvjp(_fwd, _bwd)
    return _solve(y0, params)
