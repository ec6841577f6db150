"""Numerical regression gates — mirrors reference ``test/test_regression.py``:
full 2000-iteration bilevel HPO runs per solver, asserting final outer loss
< 0.48 (same threshold as the reference CI)."""

from betty_tpu import Config, EngineConfig

from fixtures import final_outer_loss, make_engine

THRESHOLD = 0.48


def run(config):
    engine, outer, inner = make_engine(config, EngineConfig(train_iters=2000))
    engine.run()
    return final_outer_loss(engine, outer)


def test_darts():
    assert run(Config(unroll_steps=100)) < THRESHOLD


def test_cg():
    assert run(
        Config(type="cg", cg_iterations=3, cg_alpha=0.1, unroll_steps=100)
    ) < THRESHOLD


def test_neumann():
    assert run(
        Config(type="neumann", neumann_iterations=5, unroll_steps=100)
    ) < THRESHOLD


def test_sama():
    """The reference regression suite covers darts/cg/neumann only; sama is
    exercised here too (requires an Adam-family inner optimizer)."""
    from betty_tpu import optim

    engine, outer, inner = make_engine(
        Config(type="sama", unroll_steps=100),
        EngineConfig(train_iters=2000),
        inner_optimizer=optim.adam(lr=0.1),
    )
    engine.run()
    assert final_outer_loss(engine, outer) < THRESHOLD
