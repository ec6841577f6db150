"""Golden parity for a CHAINED hypergradient path (trilevel, two darts
edges) vs an independent torch-autograd implementation — extends the
single-edge checks in test_solver_golden.py to the multi-edge composition of
``compute_path_grads`` (reference ``hypergradient/__init__.py:22-39``).
Runs in a float64 subprocess.

Graph: u2l={a:[c]}, l2u={c:[b], b:[a]} -> single path [a, b, c, a].
Losses: La touches (b, c); Lb couples (b, c); Lc couples (c, a). The chain
is v = dLa/db, edge (curr=b, prev=c), edge (curr=c, prev=a).
"""

import os
import subprocess
import sys

SCRIPT = r'''
import os, sys
sys.path.insert(0, %(root)r)

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import torch
torch.set_default_dtype(torch.float64)

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.module import from_fn
import optax

D = 5
rng = np.random.RandomState(11)
X = rng.randn(30, D); Y = (rng.randn(30) > 0).astype(np.float64)
A0 = 0.4 * rng.randn(D)
B0 = 0.3 * rng.randn(D)
C0 = 0.2 * rng.randn(D)
R_B, R_C = 0.02, 0.03

TX = torch.as_tensor(X); TY = torch.as_tensor(Y)
bce_t = lambda lo: torch.nn.functional.binary_cross_entropy_with_logits(lo, TY)


def La_t(b, c):
    return bce_t(TX @ (b + c))

def Lb_t(b, c):
    return bce_t(TX @ (b + c)) + 0.3 * torch.sum(c * b * b)

def Lc_t(c, a):
    return bce_t(TX @ c) + 0.5 * torch.sum(a * c * c)


def torch_chain():
    a0 = torch.as_tensor(A0); b0 = torch.as_tensor(B0); c0 = torch.as_tensor(C0)

    # v = dLa/db
    b = b0.clone().requires_grad_(True)
    (v,) = torch.autograd.grad(La_t(b, c0), b)

    # edge 1: curr=b (loss Lb), prev=c
    eps1 = R_B / (v.norm().item() + 1e-15)
    gs = []
    for sgn in (+1.0, -1.0):
        bb = b0 + sgn * eps1 * v
        cc = c0.clone().requires_grad_(True)
        (g,) = torch.autograd.grad(Lb_t(bb, cc), cc)
        gs.append(g)
    v2 = (gs[1] - gs[0]) / (2 * eps1)

    # edge 2: curr=c (loss Lc), prev=a
    eps2 = R_C / (v2.norm().item() + 1e-15)
    gs = []
    for sgn in (+1.0, -1.0):
        cc = c0 + sgn * eps2 * v2
        aa = a0.clone().requires_grad_(True)
        (g,) = torch.autograd.grad(Lc_t(cc, aa), aa)
        gs.append(g)
    return (gs[1] - gs[0]) / (2 * eps2)


def j_bce(logits):
    return optax.sigmoid_binary_cross_entropy(logits, jnp.asarray(Y)).mean()


class A(ImplicitProblem):
    def training_step(self, batch):
        return j_bce(batch @ (self.b.params["w"] + self.c.params["w"]))


class B(ImplicitProblem):
    def training_step(self, batch):
        b = self.module(); c = self.c.params["w"]
        return j_bce(batch @ (b + c)) + 0.3 * jnp.sum(c * b * b)


class C(ImplicitProblem):
    def training_step(self, batch):
        c = self.module()
        return j_bce(batch @ c) + 0.5 * jnp.sum(self.a.params["w"] * c * c)


loader = [jnp.asarray(X)]
a = A("a", module=from_fn(lambda p: p["w"], {"w": jnp.asarray(A0)}),
      optimizer=optim.sgd(lr=1.0), train_data_loader=loader,
      config=Config(type="darts"))
b = B("b", module=from_fn(lambda p: p["w"], {"w": jnp.asarray(B0)}),
      optimizer=optim.sgd(lr=0.0), train_data_loader=loader,
      config=Config(type="darts", darts_alpha=R_B, unroll_steps=1))
c = C("c", module=from_fn(lambda p: p["w"], {"w": jnp.asarray(C0)}),
      optimizer=optim.sgd(lr=0.0), train_data_loader=loader,
      config=Config(type="darts", darts_alpha=R_C, unroll_steps=1))
engine = Engine(config=EngineConfig(train_iters=1),
                problems=[a, b, c],
                dependencies={"u2l": {a: [c]},
                              "l2u": {c: [b], b: [a]}})
assert [[q.name for q in p] for p in a.paths] == [["a", "b", "c", "a"]]
engine.run()

a1 = np.asarray(engine.states["a"]["params"]["w"])
# a's direct grad is zero (La does not touch a's params); lr=1.0 =>
# A0 - a1 == hypergradient along the chain
j_hyper = np.asarray(A0) - a1
want = torch_chain().numpy()
err = np.max(np.abs(j_hyper - want))
print(f"chain max|diff| = {err:.3e}")
assert err < 1e-5, err
print("OK")
'''


def test_golden_chain_vs_torch():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"root": root}],
        capture_output=True, text=True, timeout=600,
    )
    print(result.stdout)
    print(result.stderr[-2000:], file=sys.stderr)
    assert result.returncode == 0
