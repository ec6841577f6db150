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


def test_block_warmup_driver_handoff():
    """warmup_steps>0: driver mode runs until steady state, then blocks."""
    e1, o1, i1 = run(False, iters=30, config=Config(unroll_steps=2,
                                                    warmup_steps=5))
    e2, o2, i2 = run(True, iters=30, config=Config(unroll_steps=2,
                                                   warmup_steps=5))
    assert i1.count == i2.count == 30
    assert o1.count == o2.count
    w1 = np.asarray(e1.states["inner"]["params"]["w"])
    w2 = np.asarray(e2.states["inner"]["params"]["w"])
    assert np.max(np.abs(w1 - w2)) < 1e-6


def test_block_itd_maml():
    """IterativeProblem (MAML) under compiled blocks matches driver mode."""
    import jax
    import jax.numpy as jnp

    from betty_tpu import Engine, EngineConfig, ImplicitProblem, IterativeProblem, optim
    from betty_tpu.module import from_fn

    D, STEPS = 4, 3
    rng = np.random.RandomState(5)
    T_IN = rng.randn(D).astype(np.float32)
    T_OUT = rng.randn(D).astype(np.float32)
    TH0 = rng.randn(D).astype(np.float32)

    class Meta(ImplicitProblem):
        def training_step(self, batch):
            return 0.5 * jnp.sum((self.adapt.params["w"] - batch) ** 2)

    class Adapt(IterativeProblem):
        def training_step(self, batch):
            return 0.5 * jnp.sum((self.module() - batch) ** 2)

        def on_inner_loop_start(self):
            self.set_params({"w": self.meta.params["w"]})

        def unroll_init(self, start_params):
            return {"w": self.meta.params["w"]}

    def build(compile_blocks):
        meta = Meta("meta", module=from_fn(lambda p: p["w"], {"w": jnp.asarray(TH0)}),
                    optimizer=optim.sgd(lr=0.5),
                    train_data_loader=[jnp.asarray(T_OUT)],
                    config=Config(first_order=False))
        adapt = Adapt("adapt", module=from_fn(lambda p: p["w"], {"w": jnp.zeros(D)}),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=[jnp.asarray(T_IN)],
                      config=Config(unroll_steps=STEPS))
        eng = Engine(config=EngineConfig(train_iters=2 * STEPS,
                                         compile_blocks=compile_blocks),
                     problems=[meta, adapt],
                     dependencies={"u2l": {meta: [adapt]},
                                   "l2u": {adapt: [meta]}})
        eng.run()
        return np.asarray(eng.states["meta"]["params"]["w"])

    w_driver = build(False)
    w_block = build(True)
    assert np.max(np.abs(w_driver - w_block)) < 1e-6, (w_driver, w_block)


def test_fastpath_device_loader_matches_host_loader():
    """The in-block gather fast path (device-resident ArrayLoader) consumes
    the same batch sequence and produces the same numerics as host staging."""
    import jax.numpy as jnp

    from betty_tpu import Engine, optim
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=512)

    def build(device):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0, momentum=0.9),
                      train_data_loader=ArrayLoader(
                          np.asarray(valid[0]), np.asarray(valid[1]),
                          batch_size=64, seed=1, device=device),
                      config=Config())
        inner = Inner("inner", module=child_module(),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=ArrayLoader(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=64, seed=0, device=device),
                      config=Config(unroll_steps=5))
        eng = Engine(config=EngineConfig(train_iters=20, compile_blocks=True),
                     problems=[outer, inner],
                     dependencies={"u2l": {outer: [inner]},
                                   "l2u": {inner: [outer]}})
        eng.run()
        return np.asarray(eng.states["inner"]["params"]["w"])

    w_host = build(False)
    w_dev = build(True)
    assert np.max(np.abs(w_host - w_dev)) < 1e-6, np.max(np.abs(w_host - w_dev))


def test_fastpath_composes_with_mesh():
    """The device-resident gather fast path runs under a dp mesh: dataset
    replicated, index rows dp-sharded, so the in-block gather materializes
    each device's batch shard directly. Numerics match (a) the same mesh in
    driver mode and (b) the host-staging block path."""
    import jax

    from betty_tpu import Engine, optim
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    train, valid = make_data(n=512)

    def build(compile_blocks, device):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0, momentum=0.9),
                      train_data_loader=ArrayLoader(
                          np.asarray(valid[0]), np.asarray(valid[1]),
                          batch_size=64, seed=1, device=device),
                      config=Config())
        inner = Inner("inner", module=child_module(),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=ArrayLoader(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=64, seed=0, device=device),
                      config=Config(unroll_steps=5))
        eng = Engine(config=EngineConfig(train_iters=20,
                                         compile_blocks=compile_blocks,
                                         strategy="dp"),
                     problems=[outer, inner],
                     dependencies={"u2l": {outer: [inner]},
                                   "l2u": {inner: [outer]}})
        eng.run()
        return np.asarray(eng.states["inner"]["params"]["w"])

    w_fast = build(True, device=True)    # mesh + in-block gather fast path
    w_stage = build(True, device=False)  # mesh + host staging blocks
    w_driver = build(False, device=True)  # mesh + driver mode
    assert np.max(np.abs(w_fast - w_stage)) < 1e-6, np.max(np.abs(w_fast - w_stage))
    assert np.max(np.abs(w_fast - w_driver)) < 1e-6, np.max(np.abs(w_fast - w_driver))


def test_block_validation_call_count_matches_driver():
    """Block mode runs validation exactly as many times as driver mode even
    with a user-set block_periods that would otherwise span several
    valid_step boundaries (the engine caps the effective block size)."""
    from betty_tpu import Engine

    calls = []

    class ValEngine(Engine):
        def validation(self):
            calls.append(self.global_step)
            return {"metric": 0.0}

    def count(compile_blocks):
        calls.clear()
        engine, outer, inner = make_engine(
            Config(unroll_steps=2),
            EngineConfig(train_iters=60, valid_step=7,
                         compile_blocks=compile_blocks, block_periods=50),
            engine_cls=ValEngine,
        )
        engine.run()
        return len(calls)

    n_driver = count(False)
    n_block = count(True)
    assert n_driver == n_block == 60 // 7, (n_driver, n_block)


def test_fastpath_warmup_remainder_stream_continuity():
    """Device-resident fastpath + warmup driver phase + non-divisible driver
    remainder consume ONE continuous batch stream: the take_indices cursor
    starts where warmup iteration stopped and the live iterator resumes
    where the blocks stopped (no silently re-served batches)."""
    from betty_tpu import Engine, optim
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=192)

    def build(compile_blocks):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0, momentum=0.9),
                      train_data_loader=ArrayLoader(
                          np.asarray(valid[0]), np.asarray(valid[1]),
                          batch_size=16, seed=1, device=True),
                      config=Config())
        inner = Inner("inner", module=child_module(),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=ArrayLoader(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=16, seed=0, device=True),
                      config=Config(unroll_steps=2, warmup_steps=5))
        eng = Engine(config=EngineConfig(train_iters=100,
                                         compile_blocks=compile_blocks,
                                         block_periods=4),
                     problems=[outer, inner],
                     dependencies={"u2l": {outer: [inner]},
                                   "l2u": {inner: [outer]}})
        eng.run()
        return eng, outer, inner

    e1, o1, i1 = build(False)
    e2, o2, i2 = build(True)
    assert i1.count == i2.count == 100
    # 6 batches/epoch, 100 batches consumed -> identical epoch bookkeeping
    assert i1.epoch_counter == i2.epoch_counter
    assert i1.batches_served == i2.batches_served
    w1 = np.asarray(e1.states["inner"]["params"]["w"])
    w2 = np.asarray(e2.states["inner"]["params"]["w"])
    assert np.max(np.abs(w1 - w2)) < 1e-6, np.max(np.abs(w1 - w2))
    l1 = np.asarray(e1.states["outer"]["params"]["w"])
    l2 = np.asarray(e2.states["outer"]["params"]["w"])
    assert np.max(np.abs(l1 - l2)) < 1e-6


def test_fastpath_eligibility_with_declared_identity_postprocess():
    """A loader subclass that overrides postprocess but declares it inert
    (postprocess_is_identity=True, e.g. augmentation switched off) stays on
    the in-block gather fast path; without the declaration it is excluded.
    Regression guard for the benchmark workload's BatchLoader."""
    import jax.numpy as jnp

    from betty_tpu import Engine, optim
    from betty_tpu.compile import BlockRunner
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=256)

    class MaybeAug(ArrayLoader):
        def __init__(self, *arrays, augment=False, **kw):
            super().__init__(*arrays, **kw)
            self.augment = augment
            self.postprocess_is_identity = not augment
            # augmented batches stay host-side in real loaders; here the
            # negative case keeps device=True so the eligibility check is
            # rejected by the identity flag itself, not by dl.device

        def postprocess(self, batch):
            if self.augment:
                x, y = batch
                return -np.asarray(x), y
            return batch

    def build(augment):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0),
                      train_data_loader=MaybeAug(
                          np.asarray(valid[0]), np.asarray(valid[1]),
                          batch_size=64, seed=1, device=True,
                          augment=augment),
                      config=Config())
        inner = Inner("inner", module=child_module(),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=MaybeAug(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=64, seed=0, device=True,
                          augment=augment),
                      config=Config(unroll_steps=2))
        eng = Engine(config=EngineConfig(train_iters=4),
                     problems=[outer, inner],
                     dependencies={"u2l": {outer: [inner]},
                                   "l2u": {inner: [outer]}})
        eng.train()
        return BlockRunner(eng, scan_periods=2)

    assert set(build(False).fastpath) == {"outer", "inner"}
    assert not build(True).fastpath


def test_cross_problem_hook_mutation_block_equals_driver():
    """on_inner_loop_start may set_params on a DIFFERENT problem (cross-
    problem warm start, e.g. learning_by_ignoring-style coupling); compiled
    blocks must apply those writes like driver mode does."""
    import jax.numpy as jnp

    from betty_tpu import Engine, optim
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=256)

    class DecayingInner(Inner):
        def on_inner_loop_start(self):
            import jax as _jax

            # mutate the OUTER problem's params at each inner-loop start
            self.outer.set_params(
                _jax.tree_util.tree_map(lambda w: w * 0.9, self.outer.params)
            )

    def build(compile_blocks):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0),
                      train_data_loader=[(valid[0][:64], valid[1][:64])],
                      config=Config())
        inner = DecayingInner("inner", module=child_module(),
                              optimizer=optim.sgd(lr=0.1),
                              train_data_loader=[(train[0][:64], train[1][:64])],
                              config=Config(unroll_steps=2))
        eng = Engine(config=EngineConfig(train_iters=8,
                                         compile_blocks=compile_blocks),
                     problems=[outer, inner],
                     dependencies={"u2l": {outer: [inner]},
                                   "l2u": {inner: [outer]}})
        eng.run()
        import jax as _jax

        return (np.asarray(_jax.tree_util.tree_leaves(
                    eng.states["outer"]["params"])[0]),
                np.asarray(eng.states["inner"]["params"]["w"]))

    o_drv, i_drv = build(False)
    o_blk, i_blk = build(True)
    assert np.max(np.abs(o_drv - o_blk)) < 1e-5, (o_drv, o_blk)
    assert np.max(np.abs(i_drv - i_blk)) < 1e-5
