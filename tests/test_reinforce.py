"""REINFORCE (score-function / ES) hypergradient solver.

The reference registers ``reinforce`` but its body is an unfinished stub
(``betty/hypergradient/reinforce.py:6-25``), so these tests define the
solver's contract for betty_tpu: (1) on a smooth loss, the zeroth-order
estimate converges to darts' analytic central difference as samples grow;
(2) on a loss whose dependence on the upper parameters is piecewise
constant (zero gradient a.e. — where every AD-based solver returns zero),
reinforce recovers the smoothed slope; (3) it runs end-to-end through the
Engine and optimizes the standard bilevel fixture.
"""

import jax.numpy as jnp
import numpy as np

from betty_tpu import Config, EngineConfig

from fixtures import Inner, bce, final_outer_loss, make_engine


def _outer_delta(inner_config, seed=0, iters=1):
    """Run `iters` engine steps and return the outer parameter movement."""
    engine, outer, inner = make_engine(
        inner_config, EngineConfig(train_iters=iters), seed=seed
    )
    before = np.asarray(engine.states["outer"]["params"]["w"])
    engine.run()
    after = np.asarray(engine.states["outer"]["params"]["w"])
    return after - before


def test_reinforce_converges_to_darts_on_smooth_loss():
    # one meta step: the outer update is exactly -lr * hypergradient
    # (no direct grad: the outer loss touches its params only through
    # inner), so comparing deltas compares solver outputs
    d_darts = _outer_delta(Config(type="darts", unroll_steps=1))
    d_rf = _outer_delta(
        Config(
            type="reinforce",
            unroll_steps=1,
            reinforce_samples=4096,
            reinforce_sigma=1e-3,
        )
    )
    cos = float(
        np.dot(d_darts, d_rf) / (np.linalg.norm(d_darts) * np.linalg.norm(d_rf))
    )
    ratio = float(np.linalg.norm(d_rf) / np.linalg.norm(d_darts))
    assert cos > 0.98, f"direction diverges from darts: cos={cos}"
    assert 0.8 < ratio < 1.2, f"magnitude diverges from darts: ratio={ratio}"

    # estimator improves with sample count (MC error ~ 1/sqrt(n))
    d_small = _outer_delta(
        Config(
            type="reinforce",
            unroll_steps=1,
            reinforce_samples=64,
            reinforce_sigma=1e-3,
        )
    )
    err_small = np.linalg.norm(d_small - d_darts)
    err_large = np.linalg.norm(d_rf - d_darts)
    assert err_large < err_small


class _QuantizedInner(Inner):
    """Inner whose coupling to the outer parameters is piecewise constant:
    the weight-decay vector is snapped to a 0.25 grid, so the gradient of
    the inner loss w.r.t. the outer parameters is zero almost everywhere
    and darts' AD-based central difference sees nothing to differentiate."""

    QUANT = 0.25

    def training_step(self, batch):
        inputs, targets = batch
        outs, params = self.module(inputs)
        lam = jnp.round(self.outer() / self.QUANT) * self.QUANT
        return bce(outs, targets) + 0.5 * jnp.sum(lam * params * params)


def test_reinforce_sees_through_piecewise_constant_coupling():
    def delta(problem_cls, inner_config, seed=3):
        from betty_tpu import Engine, optim

        from fixtures import Outer, child_module, make_data, parent_module

        train, valid = make_data(seed)
        outer = Outer(
            name="outer", module=parent_module(),
            optimizer=optim.sgd(lr=1.0, momentum=0.9),
            train_data_loader=[valid], config=Config(),
        )
        inner = problem_cls(
            name="inner", module=child_module(),
            optimizer=optim.sgd(lr=0.1),
            train_data_loader=[train], config=inner_config,
        )
        engine = Engine(
            config=EngineConfig(train_iters=1),
            problems=[outer, inner],
            dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
        )
        before = np.asarray(engine.states["outer"]["params"]["w"])
        engine.run()
        return np.asarray(engine.states["outer"]["params"]["w"]) - before

    # darts through the quantized coupling: zero a.e.
    d_darts = delta(_QuantizedInner, Config(type="darts", unroll_steps=1))
    assert np.allclose(d_darts, 0.0, atol=1e-12), (
        "AD-based darts should see zero gradient through round()"
    )

    # reinforce with sigma at the quantization scale: recovers the
    # smoothed slope — compare against darts on the UN-quantized loss
    d_ref = delta(Inner, Config(type="darts", unroll_steps=1))
    d_rf = delta(
        _QuantizedInner,
        Config(
            type="reinforce", unroll_steps=1,
            reinforce_samples=4096, reinforce_sigma=0.25,
        ),
    )
    assert np.linalg.norm(d_rf) > 1e-6, "reinforce returned ~zero"
    cos = float(
        np.dot(d_ref, d_rf) / (np.linalg.norm(d_ref) * np.linalg.norm(d_rf))
    )
    assert cos > 0.7, f"smoothed gradient direction off: cos={cos}"


def test_reinforce_optimizes_bilevel_fixture():
    # same shape as tests/test_regression.py (reference CI gate): 2000
    # iterations at unroll_steps=100 = 20 meta steps, outer loss < 0.48
    cfg = Config(
        type="reinforce", unroll_steps=100,
        reinforce_samples=32, reinforce_sigma=0.01,
    )
    engine, outer, inner = make_engine(cfg, EngineConfig(train_iters=2000))
    engine.run()
    assert final_outer_loss(engine, outer) < 0.48  # reference regression bar


def test_reinforce_compiled_blocks_match_driver():
    """The solver's lax.scan + fold_in sampling must trace inside compiled
    blocks and reproduce driver mode exactly (same keys, same math)."""
    from betty_tpu import EngineConfig

    def run(compile_blocks):
        cfg = Config(
            type="reinforce", unroll_steps=10,
            reinforce_samples=8, reinforce_sigma=0.01,
        )
        engine, outer, inner = make_engine(
            cfg, EngineConfig(train_iters=50, compile_blocks=compile_blocks)
        )
        engine.run()
        return np.asarray(engine.states["outer"]["params"]["w"])

    w_driver = run(False)
    w_block = run(True)
    # looser than test_compile's 1e-6: the score-function coefficient
    # divides O(1e-6) loss differences by sigma*eps, so XLA's scanned-vs-
    # unrolled fp32 reassociation noise is amplified ~1e3x. Different
    # sample KEYS would diverge at O(1e-1) (a fresh noise realization);
    # 1e-3 still pins both modes to the same directions and math.
    assert np.max(np.abs(w_driver - w_block)) < 1e-3
