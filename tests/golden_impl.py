"""Golden hypergradient parity check vs torch autograd (run as a subprocess
with JAX_ENABLE_X64=1 by test_solver_golden.py).

For each solver, the same bilevel problem (inner loss = BCE + 0.5 w^T
diag(lam) w, outer loss = BCE on held-out data) is evaluated at identical
(w, lam), and the implicit gradient produced by betty_tpu's jitted solver is
compared against an independent float64 torch-autograd implementation of the
reference algorithm (betty/hypergradient/{darts,cg,neumann,sama}.py +
utils.py precondition_adam). Required agreement: 1e-5 (BASELINE.md);
achieved: ~1e-12 in float64.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import optax
import torch

torch.set_default_dtype(torch.float64)

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.hypergradient.cg import cg as jax_cg
from betty_tpu.hypergradient.darts import darts as jax_darts
from betty_tpu.hypergradient.neumann import neumann as jax_neumann
from betty_tpu.hypergradient.sama import sama as jax_sama
from betty_tpu.module import from_fn

D, N = 6, 40
rng = np.random.RandomState(3)
X = rng.randn(N, D)
Y = ((X @ rng.randn(D)) > 0).astype(np.float64)
XV = rng.randn(N, D)
YV = ((XV @ rng.randn(D)) > 0).astype(np.float64)
W0 = 0.3 * rng.randn(D)
LAM0 = np.abs(rng.randn(D)) + 0.1

TOL = 1e-5


# ---------------- torch side ----------------
def t_inner_loss(w, lam):
    logits = torch.as_tensor(X) @ w
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, torch.as_tensor(Y)
    )
    return bce + 0.5 * torch.sum(lam * w * w)


def t_outer_loss(w):
    logits = torch.as_tensor(XV) @ w
    return torch.nn.functional.binary_cross_entropy_with_logits(
        logits, torch.as_tensor(YV)
    )


def t_direct_v():
    w = torch.as_tensor(W0).requires_grad_(True)
    (v,) = torch.autograd.grad(t_outer_loss(w), w)
    return v


def t_darts(v, R=0.01):
    lam = torch.as_tensor(LAM0).requires_grad_(True)
    eps = R / (v.norm().item() + 1e-15)
    w_p = torch.as_tensor(W0) + eps * v
    (grad_p,) = torch.autograd.grad(t_inner_loss(w_p, lam), lam)
    w_n = torch.as_tensor(W0) - eps * v
    (grad_n,) = torch.autograd.grad(t_inner_loss(w_n, lam), lam)
    return (grad_n - grad_p) / (2 * eps)


def t_neumann(v, iterations=4, alpha=0.7):
    w = torch.as_tensor(W0).requires_grad_(True)
    lam = torch.as_tensor(LAM0).requires_grad_(True)
    (in_grad,) = torch.autograd.grad(
        t_inner_loss(w, lam), w, create_graph=True
    )
    p = v.clone()
    vv = v.clone()
    for _ in range(iterations):
        (hvp,) = torch.autograd.grad(
            in_grad, w, grad_outputs=vv, retain_graph=True
        )
        vv = vv - alpha * hvp
        p = p + vv
    v2 = alpha * p
    (cross,) = torch.autograd.grad(in_grad, lam, grad_outputs=v2)
    return -cross


def t_cg(v, iterations=3, alpha_s=0.35):
    w = torch.as_tensor(W0).requires_grad_(True)
    lam = torch.as_tensor(LAM0).requires_grad_(True)
    (in_grad,) = torch.autograd.grad(
        t_inner_loss(w, lam), w, create_graph=True
    )
    x = torch.zeros_like(v)
    r = v.clone()
    p = v.clone()
    for _ in range(iterations):
        (hvp,) = torch.autograd.grad(
            in_grad, w, grad_outputs=p, retain_graph=True
        )
        numerator = torch.dot(r, r)
        denominator = torch.dot(alpha_s * hvp, p)
        ak = numerator / denominator
        x = x + ak * p
        r_new = r - ak * hvp
        beta = torch.dot(r_new, r_new) / numerator
        p = r_new + beta * p
        r = r_new
    x = alpha_s * x
    (cross,) = torch.autograd.grad(in_grad, lam, grad_outputs=x)
    return -cross


def t_sama_precondition(v, mu, nu, last_grad, b1, b2, eps_o, lr):
    exp_avg_old = (mu - (1 - b1) * last_grad) / b1
    exp_avg_sq_old = (nu - (1 - b2) * last_grad * last_grad) / b2
    scale = (1 - b1) * b2 * exp_avg_sq_old - b1 * (1 - b2) * last_grad * exp_avg_old
    scale = scale / (torch.sqrt(nu) + eps_o) ** 3
    return v * scale * lr


def t_sama(v, mu, nu, last_grad, R=1.0, b1=0.9, b2=0.999, eps_o=1e-8, lr=0.05):
    v = t_sama_precondition(v, mu, nu, last_grad, b1, b2, eps_o, lr)
    return t_darts(v, R=R)


# ---------------- jax side ----------------
def j_bce(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


class Outer(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        return j_bce(self.inner(inputs)[0], targets)


class Inner(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, params = self.module(inputs)
        return j_bce(outs, targets) + 0.5 * jnp.sum(self.outer() * params * params)


def build_jax(inner_config, inner_optimizer):
    outer = Outer(
        "outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.asarray(LAM0)}),
        optimizer=optim.sgd(lr=1.0),
        train_data_loader=[(jnp.asarray(XV), jnp.asarray(YV))],
        config=Config(),
    )
    inner = Inner(
        "inner",
        module=from_fn(lambda p, i: (i @ p["w"], p["w"]), {"w": jnp.asarray(W0)}),
        optimizer=inner_optimizer,
        train_data_loader=[(jnp.asarray(X), jnp.asarray(Y))],
        config=inner_config,
    )
    engine = Engine(
        config=EngineConfig(train_iters=1),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    )
    ctx = {
        n: {"params": s["params"], "extra": s["extra"]}
        for n, s in engine.states.items()
    }
    batch = (jnp.asarray(X), jnp.asarray(Y))
    return engine, outer, inner, ctx, batch


def j_direct_v(outer, inner, ctx):
    from betty_tpu.problems.problem import ctx_replace

    def loss(wp):
        c = ctx_replace(ctx, "inner", wp)
        l, _, _ = outer.eval_loss(c, (jnp.asarray(XV), jnp.asarray(YV)))
        return l

    return jax.grad(loss)(ctx["inner"]["params"])


def check(name, got, want, tol=TOL):
    got = np.asarray(got)
    want = want.detach().numpy()
    err = np.max(np.abs(got - want))
    status = "OK " if err < tol else "FAIL"
    print(f"{status} {name}: max|diff| = {err:.3e}")
    return err < tol


def main():
    ok = True

    # direct gradient sanity
    engine, outer, inner, ctx, batch = build_jax(
        Config(type="darts", darts_alpha=0.01), optim.sgd(lr=0.1)
    )
    v_j = j_direct_v(outer, inner, ctx)
    v_t = t_direct_v()
    ok &= check("direct grad v", v_j["w"], v_t)

    rng_key = jax.random.PRNGKey(0)

    # darts
    out = jax_darts(v_j, inner, outer, ctx, engine.states, batch, rng_key)
    ok &= check("darts", out["w"], t_darts(torch.as_tensor(np.asarray(v_j["w"]))))

    # neumann / cg: both HVP constructions (forward-over-reverse default
    # and the reference's reverse-over-reverse) must match torch
    for hvp_mode in ("jvp", "vjp"):
        engine, outer, inner, ctx, batch = build_jax(
            Config(type="neumann", neumann_iterations=4, neumann_alpha=0.7,
                   hvp_mode=hvp_mode),
            optim.sgd(lr=0.1),
        )
        v_j = j_direct_v(outer, inner, ctx)
        out = jax_neumann(v_j, inner, outer, ctx, engine.states, batch,
                          rng_key)
        ok &= check(
            f"neumann[{hvp_mode}]", out["w"],
            t_neumann(torch.as_tensor(np.asarray(v_j["w"]))),
        )

        engine, outer, inner, ctx, batch = build_jax(
            Config(type="cg", cg_iterations=3, cg_alpha=0.35,
                   hvp_mode=hvp_mode),
            optim.sgd(lr=0.1),
        )
        v_j = j_direct_v(outer, inner, ctx)
        out = jax_cg(v_j, inner, outer, ctx, engine.states, batch, rng_key)
        ok &= check(f"cg[{hvp_mode}]", out["w"],
                    t_cg(torch.as_tensor(np.asarray(v_j["w"]))))

    # sama (inject known adam moments + last_grad into state)
    engine, outer, inner, ctx, batch = build_jax(
        Config(type="sama", sama_adam_alpha=1.0), optim.adam(lr=0.05)
    )
    mu = 0.1 * rng.randn(D)
    nu = np.abs(rng.randn(D)) * 0.01 + 1e-4
    lg = 0.2 * rng.randn(D)
    st = dict(engine.states["inner"])
    adam_state = optim.find_adam_state(st["opt_state"])
    new_adam = adam_state._replace(
        mu={"w": jnp.asarray(mu)}, nu={"w": jnp.asarray(nu)}
    )

    def swap(s):
        if s is adam_state:
            return new_adam
        if isinstance(s, tuple) and type(s) is tuple:
            return tuple(swap(x) for x in s)
        if hasattr(s, "inner_state"):
            return s._replace(inner_state=swap(s.inner_state))
        return s

    st["opt_state"] = swap(st["opt_state"])
    st["last_grad"] = {"w": jnp.asarray(lg)}
    engine.states["inner"] = st

    v_j = j_direct_v(outer, inner, ctx)
    out = jax_sama(v_j, inner, outer, ctx, engine.states, batch, rng_key)
    want = t_sama(
        torch.as_tensor(np.asarray(v_j["w"])),
        torch.as_tensor(mu),
        torch.as_tensor(nu),
        torch.as_tensor(lg),
    )
    ok &= check("sama", out["w"], want)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
