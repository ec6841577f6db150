"""Measure the compiled-block data-staging cost (VERDICT r3 weak #6).

``compile.py`` claims the host-staging fallback (multi-loader / custom
get_batch / multi-host) is "same numerics, more dispatches" than the
in-block gather fast path. This script puts numbers on that claim:

* per-block host->device TRANSFER COUNT (``jax.device_put`` /
  ``jax.make_array_from_process_local_data`` calls) and staged BYTES,
* wall-clock per schedule period,

for three configurations of the same bilevel fixture (unroll 4, K=8
periods/block):

  A. single process, device-resident ArrayLoaders  -> in-block gather
     fast path (indices only),
  B. single process, host ArrayLoaders             -> host staging,
  C. two processes (run via tests' BETTY_* env)    -> host staging with
     make_array_from_process_local_data + gloo assembly.

Run directly for A/B; for C, launch two processes the way
tests/test_multihost.py does, each with this script and
``--mode multiproc``. Results are recorded in PARITY.md ("compiled-block
staging cost") and the compile.py comment cites them.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

import jax

jax.config.update("jax_platforms", "cpu")
if os.environ.get("BETTY_COORDINATOR_ADDRESS"):
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np


class TransferCounter:
    """Counts host->device staging calls and bytes through the two APIs
    the block runner uses."""

    def __init__(self):
        self.calls = 0
        self.bytes = 0
        self._orig_put = jax.device_put
        self._orig_mk = jax.make_array_from_process_local_data

    def install(self):
        def counting_put(x, *a, **k):
            if not isinstance(x, jax.Array):  # device->device moves are free
                self.calls += 1
                self.bytes += int(np.asarray(x).nbytes)
            return self._orig_put(x, *a, **k)

        def counting_mk(sharding, x, *a, **k):
            self.calls += 1
            self.bytes += int(np.asarray(x).nbytes)
            return self._orig_mk(sharding, x, *a, **k)

        jax.device_put = counting_put
        jax.make_array_from_process_local_data = counting_mk

    def uninstall(self):
        jax.device_put = self._orig_put
        jax.make_array_from_process_local_data = self._orig_mk

    def reset(self):
        self.calls = 0
        self.bytes = 0


def build_engine(device_loaders, strategy=None, batch=32):
    from betty_tpu import Config, Engine, EngineConfig, optim
    from betty_tpu.data import ArrayLoader
    from fixtures import Inner, Outer, child_module, make_data, parent_module

    train, valid = make_data(n=512)
    # multi-host runs shard the loader per process; halve the local batch
    if jax.process_count() > 1:
        batch //= jax.process_count()
    outer = Outer("outer", module=parent_module(),
                  optimizer=optim.sgd(lr=1.0, momentum=0.9),
                  train_data_loader=ArrayLoader(
                      np.asarray(valid[0]), np.asarray(valid[1]),
                      batch_size=batch, shuffle=False,
                      device=device_loaders),
                  config=Config())
    inner = Inner("inner", module=child_module(),
                  optimizer=optim.sgd(lr=0.1),
                  train_data_loader=ArrayLoader(
                      np.asarray(train[0]), np.asarray(train[1]),
                      batch_size=batch, shuffle=False,
                      device=device_loaders),
                  config=Config(unroll_steps=4))
    engine = Engine(
        config=EngineConfig(train_iters=0, compile_blocks=True,
                            **({"strategy": strategy} if strategy else {})),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    )
    engine.train()
    return engine


def measure(engine, K=8, blocks=20):
    from betty_tpu.compile import BlockRunner

    runner = BlockRunner(engine, scan_periods=K)
    counter = TransferCounter()
    runner.run_block()  # compile
    jax.block_until_ready(engine.states["inner"]["params"]["w"])

    counter.install()
    try:
        t0 = time.perf_counter()
        for _ in range(blocks):
            runner.run_block()
        jax.block_until_ready(engine.states["inner"]["params"]["w"])
        dt = time.perf_counter() - t0
    finally:
        counter.uninstall()
    periods = K * blocks
    return {
        "fastpath": sorted(runner.fastpath),
        "transfers_per_period": counter.calls / periods,
        "staged_bytes_per_period": counter.bytes / periods,
        "ms_per_period": 1e3 * dt / periods,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["single", "multiproc"],
                    default="single")
    args = ap.parse_args()

    if args.mode == "single":
        for name, dev in [("A fastpath (device loaders)", True),
                          ("B host staging (host loaders)", False)]:
            engine = build_engine(device_loaders=dev)
            r = measure(engine)
            print(f"{name}: {r}")
    else:
        engine = build_engine(device_loaders=False, strategy="dp")
        assert jax.process_count() == 2
        r = measure(engine)
        if jax.process_index() == 0:
            print(f"C 2-process host staging: {r}")
        print("WORKER_OK", jax.process_index())


if __name__ == "__main__":
    main()
