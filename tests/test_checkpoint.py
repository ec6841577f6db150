"""Engine-level checkpoint / resume (capability the reference lacks;
SURVEY.md §5.4)."""

import numpy as np

from betty_tpu import Config, EngineConfig

from fixtures import make_engine


def test_checkpoint_roundtrip(tmp_path):
    engine, outer, inner = make_engine(
        Config(unroll_steps=2), EngineConfig(train_iters=6)
    )
    engine.run()
    w_trained = np.asarray(engine.states["inner"]["params"]["w"]).copy()
    engine.save_checkpoint(str(tmp_path))

    engine2, outer2, inner2 = make_engine(
        Config(unroll_steps=2), EngineConfig(train_iters=6)
    )
    engine2.load_checkpoint(str(tmp_path))
    assert engine2.global_step == 6
    assert inner2._count == 6
    w_restored = np.asarray(engine2.states["inner"]["params"]["w"])
    assert np.array_equal(w_trained, w_restored)

    # training can continue from the restored state
    engine2.train_iters = 2
    engine2.run()
    assert inner2._count == 8


def test_resume_exactness_midepoch_midunroll(tmp_path):
    """Interrupted-and-resumed training equals uninterrupted training bit
    for bit: ArrayLoader iterator positions are persisted (mid-epoch cut)
    and roll-back caches + inner-loop flags survive a mid-unroll cut."""
    import jax.numpy as jnp

    from betty_tpu import Engine, optim
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=160)

    def build(iters):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0, momentum=0.9),
                      train_data_loader=ArrayLoader(
                          np.asarray(valid[0]), np.asarray(valid[1]),
                          batch_size=16, seed=1),
                      config=Config())
        inner = Inner("inner", module=child_module(),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=ArrayLoader(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=16, seed=0),
                      config=Config(unroll_steps=4))
        eng = Engine(config=EngineConfig(train_iters=iters, roll_back=True),
                     problems=[outer, inner],
                     dependencies={"u2l": {outer: [inner]},
                                   "l2u": {inner: [outer]}})
        return eng, outer, inner

    # uninterrupted: 14 iterations (5 batches/epoch -> mid-epoch at 7;
    # unroll 4 -> iteration 7 is mid-unroll with a live roll-back cache)
    e_full, _, _ = build(14)
    e_full.run()
    w_full = np.asarray(e_full.states["inner"]["params"]["w"])
    l_full = np.asarray(e_full.states["outer"]["params"]["w"])

    # interrupted at 7, checkpointed, resumed in a FRESH engine for 7 more
    e_a, _, i_a = build(7)
    e_a.run()
    assert i_a._state_cache is not None  # mid-unroll: cache is live
    e_a.save_checkpoint(str(tmp_path))

    e_b, _, i_b = build(14)
    e_b.load_checkpoint(str(tmp_path))
    assert i_b._count == 7 and not i_b._inner_loop_start
    assert i_b._state_cache is not None
    for _ in range(7):
        e_b.global_step += 1
        e_b.train_step()

    w_res = np.asarray(e_b.states["inner"]["params"]["w"])
    l_res = np.asarray(e_b.states["outer"]["params"]["w"])
    assert np.array_equal(w_full, w_res), np.max(np.abs(w_full - w_res))
    assert np.array_equal(l_full, l_res)


def test_auto_resume_elastic_restart(tmp_path):
    """EngineConfig(auto_resume=True): a crashed-and-relaunched run picks up
    its periodic checkpoint and finishes with the uninterrupted result
    (train_iters is the TOTAL target). The reference delegates this to
    torchrun; here it's one config flag."""
    import jax.numpy as jnp

    from betty_tpu import Engine, optim
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=160)

    def build(iters, ckpt=None, auto=False):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0, momentum=0.9),
                      train_data_loader=ArrayLoader(
                          np.asarray(valid[0]), np.asarray(valid[1]),
                          batch_size=16, seed=1),
                      config=Config())
        inner = Inner("inner", module=child_module(),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=ArrayLoader(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=16, seed=0),
                      config=Config(unroll_steps=2))
        eng = Engine(config=EngineConfig(
                         train_iters=iters,
                         checkpoint_dir=str(ckpt) if ckpt else None,
                         checkpoint_step=4 if ckpt else 0,
                         auto_resume=auto),
                     problems=[outer, inner],
                     dependencies={"u2l": {outer: [inner]},
                                   "l2u": {inner: [outer]}})
        return eng

    # uninterrupted 14-iteration run
    e_full = build(14)
    e_full.run()
    w_full = np.asarray(e_full.states["inner"]["params"]["w"])

    # "crashed" run: dies after 6 iterations (last checkpoint at step 4)
    ckpt = tmp_path / "ckpt"
    e_a = build(6, ckpt=ckpt)
    e_a.run()

    # relaunch the SAME program (total target 14); auto-resume restores
    # step 4 and runs the remaining 10
    e_b = build(14, ckpt=ckpt, auto=True)
    e_b.run()
    assert e_b.global_step == 14
    w_res = np.asarray(e_b.states["inner"]["params"]["w"])
    assert np.array_equal(w_full, w_res), np.max(np.abs(w_full - w_res))


def test_itd_midunroll_checkpoint_resume(tmp_path):
    """A mid-unroll checkpoint of an IterativeProblem persists the recorded
    differentiation start state + consumed batches, so a fresh engine
    resumes and the parent's unroll replay matches the uninterrupted run
    bit for bit (review finding r2: previously crashed in get_unroll_data)."""
    import jax
    import jax.numpy as jnp
    import optax

    from betty_tpu import Engine, IterativeProblem, ImplicitProblem, optim
    from betty_tpu.data import ArrayLoader
    from betty_tpu.module import from_fn
    from fixtures import make_data

    train, valid = make_data(n=160)

    class Meta(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            return optax.sigmoid_binary_cross_entropy(
                self.adapt(x), y).mean()

    class Adapt(IterativeProblem):
        def training_step(self, batch):
            x, y = batch
            return optax.sigmoid_binary_cross_entropy(
                self.module(x), y).mean()

        def unroll_init(self, start_params):
            return self.meta.params  # MAML: differentiate to the meta-init

    def build(iters):
        meta = Meta("meta",
                    module=from_fn(lambda p, x: x @ p["w"],
                                   {"w": jnp.zeros(train[0].shape[1])}),
                    optimizer=optim.sgd(lr=0.5),
                    train_data_loader=ArrayLoader(
                        np.asarray(valid[0]), np.asarray(valid[1]),
                        batch_size=16, seed=1),
                    config=Config(first_order=False))
        adapt = Adapt("adapt",
                      module=from_fn(lambda p, x: x @ p["w"],
                                     {"w": jnp.zeros(train[0].shape[1])}),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=ArrayLoader(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=16, seed=0),
                      config=Config(unroll_steps=4))
        eng = Engine(config=EngineConfig(train_iters=iters),
                     problems=[meta, adapt],
                     dependencies={"u2l": {meta: [adapt]},
                                   "l2u": {adapt: [meta]}})
        return eng, meta, adapt

    e_full, _, _ = build(14)
    e_full.run()
    w_full = np.asarray(e_full.states["meta"]["params"]["w"])

    # cut at 6: 6 % 4 = 2 -> two recorded unroll batches are mid-flight
    e_a, _, a_a = build(6)
    e_a.run()
    assert a_a._unroll_start_state is not None and len(a_a._unroll_batches) == 2
    e_a.save_checkpoint(str(tmp_path))

    e_b, _, a_b = build(14)
    e_b.load_checkpoint(str(tmp_path))
    assert len(a_b._unroll_batches) == 2, "unroll recording not restored"
    for _ in range(8):
        e_b.global_step += 1
        e_b.train_step()
    w_res = np.asarray(e_b.states["meta"]["params"]["w"])
    assert np.max(np.abs(w_full - w_res)) < 1e-7, np.max(np.abs(w_full - w_res))
