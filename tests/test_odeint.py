"""odeint numerics: closed-form comparisons, convergence order, adaptive
tolerance, gradients, adjoint (SURVEY.md §7 step 4; tolerance target 1e-5
vs reference torchdiffeq semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.ops.odeint import odeint, odeint_adjoint



def test_euler_single_step_matches_hand_computation():
    # Reference GDE config: t=[0,1], euler => exactly y0 + f(0, y0).
    f = lambda t, y: -y
    y0 = jnp.array([2.0, -1.0])
    ys = odeint(f, y0, jnp.array([0.0, 1.0]), method="euler")
    np.testing.assert_allclose(np.asarray(ys[1]), np.asarray(y0 - y0), atol=1e-12)


@pytest.mark.parametrize("method,order", [("euler", 1), ("midpoint", 2), ("rk4", 4)])
def test_fixed_step_convergence_order(method, order):
    f = lambda t, y: -y
    y0 = jnp.array([1.0])
    t = jnp.array([0.0, 1.0])
    errs = []
    for sub in (4, 8):
        ys = odeint(f, y0, t, method=method, substeps=sub)
        errs.append(abs(float(ys[1][0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.45, (errs, rate)


def test_rk4_harmonic_oscillator():
    # y'' = -y  as 2d system; solution cos(t).
    f = lambda t, y: jnp.stack([y[1], -y[0]])
    y0 = jnp.array([1.0, 0.0])
    t = jnp.linspace(0.0, 2 * np.pi, 41)
    ys = odeint(f, y0, t, method="rk4", substeps=4)
    np.testing.assert_allclose(
        np.asarray(ys[:, 0]), np.cos(np.asarray(t)), atol=1e-4
    )


def test_dopri5_matches_closed_form_to_tolerance():
    lam = -2.5
    f = lambda t, y: lam * y
    y0 = jnp.array([1.0, 3.0])
    t = jnp.linspace(0.0, 2.0, 9)
    ys = odeint(f, y0, t, method="dopri5", rtol=1e-6, atol=1e-8, max_steps=48)
    expected = np.exp(lam * np.asarray(t))[:, None] * np.asarray(y0)[None, :]
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=2e-4, atol=1e-5)


def test_dopri5_default_tolerances_reasonable():
    # Reference defaults rtol=1e-3, atol=1e-4 (train_gde.py:83-84).
    f = lambda t, y: jnp.sin(t) * y
    y0 = jnp.array([1.0])
    t = jnp.array([0.0, 3.0])
    ys = odeint(f, y0, t, method="dopri5", rtol=1e-3, atol=1e-4)
    expected = np.exp(1.0 - np.cos(3.0))
    assert abs(float(ys[1][0]) - expected) / expected < 1e-3


def test_pytree_state():
    f = lambda t, y: {"a": -y["a"], "b": 2 * y["b"]}
    y0 = {"a": jnp.ones(3), "b": jnp.ones((2, 2))}
    ys = odeint(f, y0, jnp.array([0.0, 0.5, 1.0]), method="rk4", substeps=16)
    np.testing.assert_allclose(np.asarray(ys["a"][2]), np.exp(-1.0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys["b"][2]), np.exp(2.0), atol=1e-4)


def test_gradients_fixed_step():
    # d/dtheta of solution of y' = -theta*y at t=1: -y0*exp(-theta)
    def loss(theta):
        f = lambda t, y: -theta * y
        ys = odeint(f, jnp.array([1.5]), jnp.array([0.0, 1.0]), method="rk4",
                    substeps=64)
        return ys[1][0]

    g = jax.grad(loss)(0.7)
    expected = -1.5 * np.exp(-0.7)
    np.testing.assert_allclose(float(g), expected, rtol=1e-4)


def test_gradients_dopri5():
    def loss(theta):
        f = lambda t, y: -theta * y
        ys = odeint(f, jnp.array([1.0]), jnp.array([0.0, 1.0]),
                    method="dopri5", rtol=1e-6, atol=1e-8, max_steps=48)
        return ys[1][0]

    g = jax.grad(loss)(1.2)
    np.testing.assert_allclose(float(g), -np.exp(-1.2), rtol=1e-4)


def test_adjoint_matches_direct():
    def f(t, y, p):
        return -p["theta"] * y + p["bias"]

    y0 = jnp.array([1.0, 2.0])
    t = jnp.array([0.0, 0.5, 1.0])
    params = {"theta": jnp.array(0.8), "bias": jnp.array(0.1)}

    def loss_direct(y0, params):
        ys = odeint(lambda ti, y: f(ti, y, params), y0, t, method="rk4",
                    substeps=32)
        return jnp.sum(ys[-1] ** 2)

    def loss_adj(y0, params):
        ys = odeint_adjoint(f, y0, t, params, method="rk4", substeps=32)
        return jnp.sum(ys[-1] ** 2)

    gd = jax.grad(loss_direct, argnums=(0, 1))(y0, params)
    ga = jax.grad(loss_adj, argnums=(0, 1))(y0, params)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(ga)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_checkpoint_same_values():
    f = lambda t, y: jnp.cos(y)
    y0 = jnp.array([0.3])
    t = jnp.linspace(0.0, 1.0, 5)
    a = odeint(f, y0, t, method="rk4", substeps=8, checkpoint=False)
    b = odeint(f, y0, t, method="rk4", substeps=8, checkpoint=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
