"""Expert parallelism: Switch-style MoE with the expert axis sharded over
``ep`` (betty_tpu/models/moe.py) — absent in the reference (SURVEY.md §2.2).

Runs on the 8-virtual-device CPU mesh (conftest.py)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from betty_tpu.models.moe import init_moe_params, moe_ffn
from betty_tpu.parallel import make_mesh, tp_shardings

DIM, HID, E, T = 16, 32, 4, 64


def _setup(seed=0):
    params = init_moe_params(jax.random.PRNGKey(seed), DIM, HID, E)
    x = jnp.asarray(np.random.RandomState(1).randn(T, DIM), jnp.float32)
    return params, x


@pytest.mark.slow
def test_moe_routing_and_capacity():
    params, x = _setup()
    y_full, aux = moe_ffn(params, x, capacity=T)  # no drops
    # every token got exactly its gated top-1 expert output
    probs = jax.nn.softmax(x @ params["router"], axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    for e in range(E):
        tok = np.where(np.asarray(idx) == e)[0]
        if len(tok) == 0:
            continue
        h = jax.nn.gelu(x[tok] @ params["w1"][e] + params["b1"][e])
        want = (h @ params["w2"][e] + params["b2"][e]) * probs[tok, e][:, None]
        got = y_full[tok]
        assert float(jnp.max(jnp.abs(want - got))) < 1e-5

    # tight capacity drops overflow tokens to zero (residual passthrough)
    y_cap, _ = moe_ffn(params, x, capacity=2)
    dropped = np.where(np.all(np.asarray(y_cap) == 0.0, axis=1))[0]
    assert len(dropped) > 0
    assert float(aux) > 0


def test_expert_parallel_sharding_matches_unsharded():
    """Sharding the expert axis over ep must not change the math, and the
    expert weights must actually be partitioned."""
    params, x = _setup()
    y_ref, aux_ref = moe_ffn(params, x, capacity=T)

    mesh = make_mesh((("dp", 2), ("ep", 4)))
    sh = tp_shardings(
        params, mesh,
        rules=(
            (r"w[12]$|b[12]$", ("ep",)),
            (r"router$", ()),
        ),
    )
    params_sh = jax.tree_util.tree_map(jax.device_put, params, sh)
    assert params_sh["w1"].sharding.shard_shape(
        params_sh["w1"].shape)[0] == E // 4

    y_sh, aux_sh = jax.jit(lambda p: moe_ffn(p, x, capacity=T))(params_sh)
    assert float(jnp.max(jnp.abs(y_ref - y_sh))) < 1e-5
    assert abs(float(aux_ref) - float(aux_sh)) < 1e-6


def test_hypergradients_flow_through_router():
    """The dispatch einsums are differentiable: gradients reach both the
    router and the expert weights (what the darts/CG solvers need)."""
    params, x = _setup()

    def loss(p):
        y, aux = moe_ffn(p, x, capacity=T)
        return jnp.sum(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    assert float(jnp.max(jnp.abs(g["router"]))) > 0
    assert float(jnp.max(jnp.abs(g["w1"]))) > 0


def test_bilevel_engine_with_expert_parallel_moe():
    """Full bilevel darts program whose inner model contains an MoE FFN with
    the expert axis sharded over ep: trajectories match the unsharded run."""
    import optax

    from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
    from betty_tpu.module import from_fn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, DIM), jnp.float32)
    y = jnp.asarray(rng.randint(0, 2, T), jnp.int32)
    xv = jnp.asarray(rng.randn(32, DIM), jnp.float32)
    yv = jnp.asarray(rng.randint(0, 2, 32), jnp.int32)

    moe_p = init_moe_params(jax.random.PRNGKey(0), DIM, HID, E)
    out_w = jnp.asarray(0.1 * rng.randn(DIM, 2), jnp.float32)

    def apply(p, inp):
        h, aux = moe_ffn(p["moe"], inp, capacity=inp.shape[0])
        return (inp + h) @ p["out"], aux

    class Inner(ImplicitProblem):
        def training_step(self, batch):
            bx, by = batch
            logits, aux = self.module(bx)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, by)
            w = self.outer(jax.lax.stop_gradient(ce))
            return jnp.mean(w * ce) + 0.01 * aux

    class Outer(ImplicitProblem):
        def training_step(self, batch):
            bx, by = batch
            logits, _ = self.inner(bx)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, by).mean()

    from betty_tpu.models import MetaWeightNet
    from betty_tpu.module import from_flax

    def run(shard):
        inner = Inner(
            "inner",
            module=from_fn(apply, {"moe": moe_p, "out": out_w}),
            optimizer=optim.sgd(lr=0.05),
            train_data_loader=[(x, y)],
            config=Config(
                type="darts", unroll_steps=2,
                shard_rules=((r"moe/(w[12]|b[12])$", ("ep",)),
                             (r".*", ())) if shard else None,
            ),
        )
        outer = Outer(
            "outer",
            module=from_flax(MetaWeightNet(), jnp.zeros((8,)),
                             rng=jax.random.PRNGKey(1), train_kwarg="train"),
            optimizer=optim.adam(lr=1e-3),
            train_data_loader=[(xv, yv)],
            config=Config(),
        )
        eng = Engine(
            config=EngineConfig(
                train_iters=4,
                strategy="tp" if shard else "default",
                mesh_shape=(("dp", 2), ("ep", 4)) if shard else None,
            ),
            problems=[outer, inner],
            dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
        )
        eng.run()
        if shard:
            w1 = eng.states["inner"]["params"]["moe"]["w1"]
            assert w1.sharding.shard_shape(w1.shape)[0] == E // 4
        return np.concatenate([
            np.asarray(v).ravel()
            for v in jax.tree_util.tree_leaves(eng.states["inner"]["params"])
        ])

    w_ep = run(True)
    w_ref = run(False)
    err = float(np.max(np.abs(w_ep - w_ref)))
    assert err < 2e-5, f"expert-parallel run diverged: {err}"
