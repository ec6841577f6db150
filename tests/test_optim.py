"""Optimizer parity vs torch.optim (SGD/momentum, Adam, AdamW).

The SAMA preconditioner reconstructs Adam moments from optimizer state, so
exact torch-equivalence of the optimizers is load-bearing for hypergradient
parity, not just a nicety."""

import jax
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


# ---------------------------------------------------------------- groups
def test_param_groups_vs_torch():
    """Per-group lr/momentum/weight_decay matches torch.optim.SGD param
    groups step-for-step, including a StepLR schedule decaying every group
    proportionally (reference param_groups hook, problem.py:253-254;
    used by examples/learning_by_ignoring/main.py:163-175)."""
    torch.manual_seed(0)
    pa = torch.nn.Parameter(torch.randn(*SHAPE, dtype=torch.float64))
    pb = torch.nn.Parameter(torch.randn(*SHAPE, dtype=torch.float64))
    opt = torch.optim.SGD([
        {"params": [pa], "lr": 0.1, "momentum": 0.9},
        {"params": [pb], "lr": 0.01, "momentum": 0.0, "weight_decay": 0.1},
    ], lr=0.05)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.5)
    rng = np.random.RandomState(1)
    for _ in range(STEPS):
        ga, gb = rng.randn(*SHAPE), rng.randn(*SHAPE)
        opt.zero_grad()
        pa.grad = torch.as_tensor(ga)
        pb.grad = torch.as_tensor(gb)
        opt.step()
        sched.step()

    torch.manual_seed(0)
    p = {
        "feat": {"w": jnp.asarray(
            torch.randn(*SHAPE, dtype=torch.float64).numpy(), jnp.float32)},
        "fc": {"w": jnp.asarray(
            torch.randn(*SHAPE, dtype=torch.float64).numpy(), jnp.float32)},
    }
    base = optim.sgd(lr=0.05, momentum=0.9,
                     schedule=optim.step_lr(0.05, step_size=2, gamma=0.5))
    grp = optim.grouped(base, [
        {"select": r"^feat", "lr": 0.1, "momentum": 0.9},
        {"select": None, "lr": 0.01, "momentum": 0.0, "weight_decay": 0.1},
    ], p)
    state = grp.init(p)
    rng = np.random.RandomState(1)
    for step in range(STEPS):
        ga, gb = rng.randn(*SHAPE), rng.randn(*SHAPE)
        g = {"feat": {"w": jnp.asarray(ga, jnp.float32)},
             "fc": {"w": jnp.asarray(gb, jnp.float32)}}
        updates, state = grp.update(g, state, p, sched_step=step)
        p = jax.tree_util.tree_map(lambda x, u: x + u, p, updates)

    assert_close(np.asarray(p["feat"]["w"]), pa.detach().numpy())
    assert_close(np.asarray(p["fc"]["w"]), pb.detach().numpy())


def _run_param_groups_program(compile_blocks):
    """Bilevel program whose inner problem uses the param_groups hook
    (lr=0.1 on ^feat, frozen fc); returns (feat, fc) after 3 iters."""
    import optax

    from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem
    from betty_tpu.module import from_fn

    class Outer(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            return optax.sigmoid_binary_cross_entropy(
                self.inner(x), y).mean()

    class Inner(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            out = x @ self.params["feat"] + self.params["fc"].sum()
            reg = self.outer()[0]
            l2 = sum(jnp.sum(p * p) for p in
                     jax.tree_util.tree_leaves(self.params))
            return (optax.sigmoid_binary_cross_entropy(out, y).mean()
                    + 0.5 * reg * l2)

        def param_groups(self):
            return [
                {"select": r"^feat", "lr": 0.1},
                {"select": None, "lr": 0.0},   # frozen group
            ]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 4), jnp.float32)
    y = jnp.asarray((rng.rand(32) > 0.5).astype(np.float32))

    inner = Inner(
        "inner",
        module=from_fn(lambda p, i: i @ p["feat"] + p["fc"].sum(),
                       {"feat": jnp.zeros(4), "fc": jnp.ones(2)}),
        optimizer=optim.sgd(lr=0.05),
        train_data_loader=[(x, y)],
        config=Config(type="darts"),
    )
    outer = Outer(
        "outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.full((1,), 0.01)}),
        optimizer=optim.sgd(lr=0.01),
        train_data_loader=[(x, y)],
        config=Config(),
    )
    eng = Engine(config=EngineConfig(train_iters=3,
                                     compile_blocks=compile_blocks),
                 problems=[outer, inner],
                 dependencies={"u2l": {outer: [inner]},
                               "l2u": {inner: [outer]}})
    eng.run()
    return (np.asarray(eng.states["inner"]["params"]["feat"]),
            np.asarray(eng.states["inner"]["params"]["fc"]))


def test_param_groups_hook_through_engine():
    """The Problem.param_groups hook wires into the engine: different
    leaves actually receive different learning rates."""
    feat, fc = _run_param_groups_program(compile_blocks=False)
    assert np.max(np.abs(feat)) > 0, "lr=0.1 group did not train"
    assert np.array_equal(fc, np.ones(2)), "lr=0 group moved"


def test_param_groups_compiled_blocks_match_driver():
    """Grouped optimizers trace correctly inside compiled blocks and match
    driver mode."""
    feat_driver, _ = _run_param_groups_program(compile_blocks=False)
    feat_block, fc_block = _run_param_groups_program(compile_blocks=True)
    assert np.array_equal(fc_block, np.ones(2))
    assert np.max(np.abs(feat_block - feat_driver)) < 1e-6
