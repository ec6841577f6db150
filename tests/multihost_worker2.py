"""Worker for the multi-host hardening tests (test_multihost.py —
VERDICT r2 #6): N-process clusters exercising FSDP sharding and the
collective engine-checkpoint save/restore path.

argv: out_path mode
  mode "fsdp": bilevel program with a wide MLP classifier under
    strategy="fsdp" on the N-device global mesh; asserts parameters are
    REALLY sharded across processes, trains, process 0 writes finals.
  mode "ckpt": same program; trains 6 iters, engine.save_checkpoint
    (collective _to_host allgather on every process), rebuilds a FRESH
    engine, restores, asserts bit-exact params, continues 6 more iters,
    process 0 writes finals (parent compares vs a straight 12-iter run).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np

DIM, WIDE = 32, 512


def build(batch_per_host, iters, strategy="fsdp", ckpt_dir=None,
          auto_resume=False):
    import jax.numpy as jnp
    import optax

    from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
    from betty_tpu.data import ArrayLoader
    from betty_tpu.models import MLP, MetaWeightNet
    from betty_tpu.module import from_flax

    rng = np.random.RandomState(0)
    x_tr = rng.randn(256, DIM).astype(np.float32)
    y_tr = rng.randint(0, 2, 256).astype(np.int32)
    x_me = rng.randn(128, DIM).astype(np.float32)
    y_me = rng.randint(0, 2, 128).astype(np.int32)

    class RW(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            logits = self.classifier(x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    class Clf(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            logits = self.module(x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            w = self.rw(jax.lax.stop_gradient(ce))
            return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-6)

    clf = Clf("classifier",
              module=from_flax(MLP(features=[WIDE, 2]),
                               jnp.zeros((8, DIM)),
                               rng=jax.random.PRNGKey(0)),
              optimizer=optim.sgd(lr=0.05, momentum=0.9),
              train_data_loader=ArrayLoader(x_tr, y_tr,
                                            batch_size=batch_per_host,
                                            shuffle=False),
              config=Config(type="darts", unroll_steps=2))
    rw = RW("rw",
            module=from_flax(MetaWeightNet(), jnp.zeros((8,)),
                             rng=jax.random.PRNGKey(1), train_kwarg="train"),
            optimizer=optim.adam(lr=1e-3),
            train_data_loader=ArrayLoader(x_me, y_me,
                                          batch_size=batch_per_host,
                                          shuffle=False),
            config=Config())
    engine = Engine(
        config=EngineConfig(train_iters=iters, strategy=strategy,
                            checkpoint_dir=ckpt_dir,
                            auto_resume=auto_resume),
        problems=[rw, clf],
        dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}},
    )
    return engine


def finals(engine):
    from betty_tpu.checkpoint import _to_host

    return np.concatenate([
        np.asarray(v).ravel()
        for v in jax.tree_util.tree_leaves(
            _to_host(engine.states["classifier"]["params"])
        )
    ])


def main():
    out_path, mode = sys.argv[1], sys.argv[2]
    if mode != "ref":
        # join the cluster BEFORE the first jax.process_count() query
        # (Engine would do this lazily, but the assertions below run first)
        from betty_tpu.parallel.mesh import maybe_init_distributed

        maybe_init_distributed()
    if mode == "ref":
        # single process, global batch 32: the numeric reference the
        # N-process runs must match
        engine = build(32, iters=12, strategy="default")
        engine.run()
        np.savez(out_path, final=finals(engine))
        print("REF_OK")
        return
    nprocs = jax.process_count()
    assert nprocs >= 2
    batch_per_host = 32 // nprocs

    if mode == "fsdp":
        engine = build(batch_per_host, iters=12)
        wide = engine.states["classifier"]["params"]["Dense_0"]["kernel"]
        shard = wide.sharding.shard_shape(wide.shape)
        assert not wide.is_fully_addressable, "fsdp param not global"
        assert np.prod(shard) == wide.size // nprocs, (
            f"fsdp param not sharded {nprocs}-way: {shard} of {wide.shape}"
        )
        engine.run()
        f = finals(engine)
        if jax.process_index() == 0:
            np.savez(out_path, final=f)
        print("FSDP_OK", jax.process_index())
    elif mode == "ckpt":
        ckpt_dir = sys.argv[3]
        engine = build(batch_per_host, iters=6, ckpt_dir=None)
        engine.run()
        engine.save_checkpoint(ckpt_dir)  # collective allgather, one writer
        before = finals(engine)

        engine2 = build(batch_per_host, iters=6)  # 6 MORE (total 12)
        from betty_tpu.checkpoint import restore_engine_state

        restore_engine_state(engine2, ckpt_dir)
        after = finals(engine2)
        assert np.array_equal(before, after), "restore not bit-exact"
        assert engine2.global_step == 6
        print("RESTORE_OK", jax.process_index())

        # params stayed sharded after restore
        wide = engine2.states["classifier"]["params"]["Dense_0"]["kernel"]
        assert not wide.is_fully_addressable
        engine2.run()  # continues 6..12
        f = finals(engine2)
        if jax.process_index() == 0:
            np.savez(out_path, final=f)
        print("CKPT_OK", jax.process_index())
    else:
        raise SystemExit(f"unknown mode {mode}")
    print("WORKER_OK", jax.process_index())


if __name__ == "__main__":
    main()
