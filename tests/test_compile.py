"""Compiled-block mode must match driver mode numerically (same math, same
RNG folding; tiny fp32 reassociation differences from XLA fusing scanned vs
unrolled programs are allowed), while dispatching one XLA program per
schedule period."""

import numpy as np

from betty_tpu import Config, EngineConfig

from fixtures import final_outer_loss, make_engine


def run(compile_blocks, iters=200, roll_back=False, config=None):
    engine, outer, inner = make_engine(
        config or Config(unroll_steps=20),
        EngineConfig(train_iters=iters, compile_blocks=compile_blocks,
                     roll_back=roll_back),
    )
    engine.run()
    return engine, outer, inner


def test_block_matches_driver():
    e1, o1, i1 = run(False)
    e2, o2, i2 = run(True)
    w1 = np.asarray(e1.states["inner"]["params"]["w"])
    w2 = np.asarray(e2.states["inner"]["params"]["w"])
    assert np.max(np.abs(w1 - w2)) < 1e-6, np.max(np.abs(w1 - w2))
    l1 = np.asarray(e1.states["outer"]["params"]["w"])
    l2 = np.asarray(e2.states["outer"]["params"]["w"])
    assert np.max(np.abs(l1 - l2)) < 1e-6
    assert i1.count == i2.count and o1.count == o2.count


def test_block_matches_driver_rollback():
    e1, o1, i1 = run(False, iters=60, roll_back=True,
                     config=Config(unroll_steps=10))
    e2, o2, i2 = run(True, iters=60, roll_back=True,
                     config=Config(unroll_steps=10))
    w1 = np.asarray(e1.states["inner"]["params"]["w"])
    w2 = np.asarray(e2.states["inner"]["params"]["w"])
    assert np.max(np.abs(w1 - w2)) < 1e-6, np.max(np.abs(w1 - w2))


def test_block_matches_driver_gas():
    cfg = Config(unroll_steps=4, gradient_accumulation=2)
    e1, o1, i1 = run(False, iters=32, config=cfg)
    e2, o2, i2 = run(True, iters=32, config=cfg)
    w1 = np.asarray(e1.states["inner"]["params"]["w"])
    w2 = np.asarray(e2.states["inner"]["params"]["w"])
    assert np.max(np.abs(w1 - w2)) < 1e-6


def test_block_remainder_driver_fallback():
    """train_iters not a multiple of the period: remainder runs via driver."""
    e1, o1, i1 = run(False, iters=25, config=Config(unroll_steps=10))
    e2, o2, i2 = run(True, iters=25, config=Config(unroll_steps=10))
    assert i1.count == i2.count == 25
    w1 = np.asarray(e1.states["inner"]["params"]["w"])
    w2 = np.asarray(e2.states["inner"]["params"]["w"])
    assert np.max(np.abs(w1 - w2)) < 1e-6


def test_block_regression_gate():
    engine, outer, inner = run(True, iters=2000,
                               config=Config(unroll_steps=100))
    assert final_outer_loss(engine, outer) < 0.48
