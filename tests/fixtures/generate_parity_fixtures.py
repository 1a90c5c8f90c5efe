"""Generate committed parity fixtures for tests/test_torch_parity.py.

Records reference outputs for:
  * SAGEConv(mean) forward on a fixed random graph
    (reference model: PyG SAGEConv, /root/reference/scripts/train_gde.py:20-45)
  * odeint euler trajectory over a 3-layer SAGE vector field
    (reference call: torchdiffeq.odeint(..., method='euler'),
     /root/reference/scripts/train_gde.py:78-85)
  * odeint dopri5 (rtol 1e-3, atol 1e-4) on a linear system y' = A y,
    together with the CLOSED-FORM solution exp(A t) y0 as independent
    ground truth.

Source priority:
  1. real torchdiffeq / torch_geometric, if importable -> source tags
     'torchdiffeq' / 'pyg';
  2. otherwise a documented plain-torch float64 reimplementation of the
     same math -> source tags 'plain-torch-reimpl'. For euler and SAGE
     this is algorithm-identical to the reference packages (one euler
     step per requested time pair; lin_l(mean_nbrs) + lin_r(x)); for
     dopri5 the closed-form expm trajectory is the authoritative target
     and the reimplementation tag records that no torchdiffeq binary was
     available in this image (no egress; torchdiffeq/PyG not baked in).

Regenerate (e.g. in an environment that has the real packages):
    python tests/fixtures/generate_parity_fixtures.py
The npz's `*_source` entries record which path produced each array.
"""
from __future__ import annotations

import pathlib

import numpy as np
import torch

OUT = pathlib.Path(__file__).parent / "parity_fixtures.npz"

torch.set_default_dtype(torch.float64)

try:
    import torchdiffeq  # type: ignore

    HAVE_TDE = True
except ImportError:
    HAVE_TDE = False

try:
    from torch_geometric.nn import SAGEConv  # type: ignore

    HAVE_PYG = True
except ImportError:
    HAVE_PYG = False


# --------------------------------------------------------------------------
# Shared problem definitions (fixed seeds — these define the fixtures)
# --------------------------------------------------------------------------

def sage_problem():
    rng = np.random.RandomState(0)
    N, Din, Dout = 11, 5, 4
    adj = rng.rand(N, N) < 0.3
    x = rng.randn(N, Din)
    wl = rng.randn(Din, Dout)
    bl = rng.randn(Dout)
    wr = rng.randn(Din, Dout)
    return adj, x, wl, bl, wr


def sage_field_problem():
    rng = np.random.RandomState(1)
    N, D, H = 9, 6, 8
    adj = rng.rand(N, N) < 0.35
    x0 = rng.randn(N, D)
    Ws = {
        "w1l": rng.randn(D, H) * 0.3,
        "b1": rng.randn(H) * 0.1,
        "w1r": rng.randn(D, H) * 0.3,
        "w2l": rng.randn(H, D) * 0.3,
        "b2": rng.randn(D) * 0.1,
        "w2r": rng.randn(H, D) * 0.3,
    }
    return adj, x0, Ws


def linear_problem():
    rng = np.random.RandomState(3)
    D = 6
    A = rng.randn(D, D) * 0.5
    A = A - A.T - 0.3 * np.eye(D)  # mildly contractive: well-conditioned
    y0 = rng.randn(D)
    t = np.linspace(0.0, 2.0, 9)
    return A, y0, t


# --------------------------------------------------------------------------
# Reference computations
# --------------------------------------------------------------------------

def plain_sage(x, adj, wl, bl, wr):
    """PyG SAGEConv(mean, root_weight=True, bias on lin_l): messages flow
    src->dst along adj[src, dst]; isolated nodes aggregate zero."""
    a = torch.tensor(adj, dtype=torch.get_default_dtype())
    deg = a.sum(0).clamp(min=1.0)
    agg = (a.T @ x) / deg[:, None]
    return agg @ torch.tensor(wl) + torch.tensor(bl) + x @ torch.tensor(wr)


def sage_forward():
    adj, x, wl, bl, wr = sage_problem()
    xt = torch.tensor(x)
    if HAVE_PYG:
        src, dst = np.nonzero(adj)
        conv = SAGEConv(x.shape[1], wl.shape[1], aggr="mean")
        with torch.no_grad():
            conv.lin_l.weight.copy_(torch.tensor(wl.T))
            conv.lin_l.bias.copy_(torch.tensor(bl))
            conv.lin_r.weight.copy_(torch.tensor(wr.T))
        edge_index = torch.tensor(np.stack([src, dst]), dtype=torch.long)
        out = conv(xt, edge_index).detach().numpy()
        return out, "pyg"
    return plain_sage(xt, adj, wl, bl, wr).numpy(), "plain-torch-reimpl"


def sage_field_euler():
    adj, x0, Ws = sage_field_problem()

    def f(y):
        h = plain_sage(y, adj, Ws["w1l"], Ws["b1"], Ws["w1r"]).relu()
        return plain_sage(h, adj, Ws["w2l"], Ws["b2"], Ws["w2r"])

    steps = 16
    t = torch.linspace(0.0, 1.0, steps + 1)
    if HAVE_TDE:
        traj = torchdiffeq.odeint(
            lambda ti, y: f(y), torch.tensor(x0), t, method="euler"
        )
        return traj.detach().numpy(), "torchdiffeq"
    y = torch.tensor(x0)
    dt = 1.0 / steps
    traj = [y.clone()]
    for _ in range(steps):
        y = y + dt * f(y)
        traj.append(y.clone())
    return torch.stack(traj).numpy(), "plain-torch-reimpl"


def linear_dopri5():
    A, y0, t = linear_problem()
    # Closed-form ground truth via eigendecomposition of the real matrix
    # (complex eigenpairs; imaginary parts cancel to ~1e-16).
    w, V = np.linalg.eig(A)
    Vinv = np.linalg.inv(V)
    exact = np.stack(
        [(V @ np.diag(np.exp(w * ti)) @ Vinv @ y0).real for ti in t]
    )
    if HAVE_TDE:
        At = torch.tensor(A)
        traj = torchdiffeq.odeint(
            lambda ti, y: y @ At.T,
            torch.tensor(y0),
            torch.tensor(t),
            method="dopri5",
            rtol=1e-3,
            atol=1e-4,
        )
        return exact, traj.detach().numpy(), "torchdiffeq"
    return exact, exact, "closed-form (no torchdiffeq in image)"


def main():
    sage_out, sage_src = sage_forward()
    euler_traj, euler_src = sage_field_euler()
    lin_exact, lin_dopri, dopri_src = linear_dopri5()
    adj, x, wl, bl, wr = sage_problem()
    fadj, fx0, fWs = sage_field_problem()
    A, y0, t = linear_problem()
    np.savez(
        OUT,
        # problems (inputs are part of the fixture so tests never drift)
        sage_adj=adj, sage_x=x, sage_wl=wl, sage_bl=bl, sage_wr=wr,
        field_adj=fadj, field_x0=fx0,
        **{f"field_{k}": v for k, v in fWs.items()},
        lin_A=A, lin_y0=y0, lin_t=t,
        # recorded reference outputs
        sage_out=sage_out,
        euler_traj=euler_traj,
        lin_exact=lin_exact,
        lin_dopri5=lin_dopri,
        # provenance
        sage_source=np.array(sage_src),
        euler_source=np.array(euler_src),
        dopri5_source=np.array(dopri_src),
    )
    print(f"wrote {OUT}")
    print(f"  sage_out:   {sage_src}")
    print(f"  euler_traj: {euler_src}")
    print(f"  dopri5:     {dopri_src}")


if __name__ == "__main__":
    main()
