"""Worker for the 2-process multi-host test (test_multihost.py).

Each process joins a local JAX cluster (BETTY_COORDINATOR_ADDRESS env,
picked up by Engine.configure_systems -> maybe_init_distributed), gets one
CPU device, and trains the bilevel logistic fixture with strategy="dp" on
the 2-device global mesh. ArrayLoaders are auto-sharded per host
(examples i::2); global batches are assembled with
jax.make_array_from_process_local_data. shuffle=False makes each global
batch the same example SET as the single-process run, so (mean losses being
permutation-invariant) the trajectory must match the single-process
reference written by the parent test.

Process 0 writes its final parameters to argv[1].
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# env-var platform selection is overridden on this host; the config API works
jax.config.update("jax_platforms", "cpu")
# CPU cross-process collectives need gloo (TPU pods need nothing)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np


def main():
    out_path = sys.argv[1]

    from betty_tpu import Config, Engine, EngineConfig, optim
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=256)

    def build(compile_blocks):
        outer = Outer("outer", module=parent_module(),
                      optimizer=optim.sgd(lr=1.0, momentum=0.9),
                      train_data_loader=ArrayLoader(
                          np.asarray(valid[0]), np.asarray(valid[1]),
                          batch_size=16, shuffle=False),
                      config=Config())
        inner = Inner("inner", module=child_module(),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=ArrayLoader(
                          np.asarray(train[0]), np.asarray(train[1]),
                          batch_size=16, shuffle=False),
                      config=Config(unroll_steps=4))
        engine = Engine(
            config=EngineConfig(train_iters=24, strategy="dp",
                                compile_blocks=compile_blocks),
            problems=[outer, inner],
            dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
        )
        return engine, inner

    engine, inner = build(False)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2
    # per-host shard: fixture train = 128 examples -> 64 local, 4 local
    # batches of 16 per epoch (matching the 1-process run's 4 batches of 32)
    assert inner.train_data_loader[0].n == 64
    engine.run()

    # compiled-block mode on the same 2-process cluster must match driver
    # mode (host-staged segments assembled as globally-sharded arrays)
    engine_b, _ = build(True)
    engine_b.run()
    w_d = np.asarray(jax.device_get(engine.states["inner"]["params"]["w"]))
    w_b = np.asarray(jax.device_get(engine_b.states["inner"]["params"]["w"]))
    assert np.max(np.abs(w_d - w_b)) < 1e-5, np.max(np.abs(w_d - w_b))
    print("BLOCK_OK", jax.process_index())

    if jax.process_index() == 0:
        np.savez(
            out_path,
            inner=np.asarray(
                jax.device_get(engine.states["inner"]["params"]["w"])
            ),
            outer=np.asarray(
                jax.device_get(engine.states["outer"]["params"]["w"])
            ),
        )
    print("WORKER_OK", jax.process_index())


if __name__ == "__main__":
    main()
