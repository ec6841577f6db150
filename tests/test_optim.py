"""Optimizer parity vs torch.optim (SGD/momentum, Adam, AdamW).

The SAMA preconditioner reconstructs Adam moments from optimizer state, so
exact torch-equivalence of the optimizers is load-bearing for hypergradient
parity, not just a nicety."""

import jax.numpy as jnp
import numpy as np
import torch

from betty_tpu import optim

STEPS = 5
SHAPE = (7, 3)


def run_torch(opt_factory):
    torch.manual_seed(0)
    p = torch.nn.Parameter(torch.randn(*SHAPE, dtype=torch.float64))
    opt = opt_factory([p])
    rng = np.random.RandomState(1)
    for _ in range(STEPS):
        g = torch.as_tensor(rng.randn(*SHAPE))
        opt.zero_grad()
        p.grad = g.clone()
        opt.step()
    return p.detach().numpy()


def run_jax(optimizer):
    torch.manual_seed(0)
    p = {"w": jnp.asarray(torch.randn(*SHAPE, dtype=torch.float64).numpy(),
                          jnp.float32)}
    state = optimizer.init(p)
    rng = np.random.RandomState(1)
    for _ in range(STEPS):
        g = {"w": jnp.asarray(rng.randn(*SHAPE), jnp.float32)}
        updates, state = optimizer.update(g, state, p)
        p = {"w": p["w"] + updates["w"]}
    return np.asarray(p["w"])


def assert_close(a, b, tol=1e-5):
    assert np.max(np.abs(a - b)) < tol, np.max(np.abs(a - b))


def test_sgd_momentum():
    want = run_torch(lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=0.9))
    got = run_jax(optim.sgd(lr=0.1, momentum=0.9))
    assert_close(got, want)


def test_sgd_nesterov_wd():
    want = run_torch(
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.8, nesterov=True,
                                   weight_decay=0.01)
    )
    got = run_jax(optim.sgd(lr=0.05, momentum=0.8, nesterov=True,
                            weight_decay=0.01))
    assert_close(got, want)


def test_adam():
    want = run_torch(lambda ps: torch.optim.Adam(ps, lr=0.01))
    got = run_jax(optim.adam(lr=0.01))
    assert_close(got, want)


def test_adam_weight_decay():
    want = run_torch(lambda ps: torch.optim.Adam(ps, lr=0.01, weight_decay=0.1))
    got = run_jax(optim.adam(lr=0.01, weight_decay=0.1))
    assert_close(got, want)


def test_adamw():
    want = run_torch(lambda ps: torch.optim.AdamW(ps, lr=0.01, weight_decay=0.05))
    got = run_jax(optim.adamw(lr=0.01, weight_decay=0.05))
    assert_close(got, want)


def test_schedule_injection():
    """LR schedule applied per optimizer step (counterpart of
    betty/patch/scheduler.py re-attachment)."""
    sched = optim.step_lr(lr=0.1, step_size=2, gamma=0.1)
    opt = optim.sgd(lr=0.1, schedule=sched)
    p = {"w": jnp.ones(4)}
    state = opt.init(p)
    g = {"w": jnp.ones(4)}
    # steps 0,1 at lr=0.1; steps 2,3 at lr=0.01
    for step in range(4):
        updates, state = opt.update(g, state, p, sched_step=jnp.asarray(step))
        p = {"w": p["w"] + updates["w"]}
    expected = 1.0 - 0.1 - 0.1 - 0.01 - 0.01
    assert np.allclose(np.asarray(p["w"]), expected, atol=1e-6)
