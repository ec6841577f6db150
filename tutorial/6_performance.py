"""Tutorial 6 — the TPU performance path (no reference counterpart).

The reference dispatches one optimizer step per Python iteration; on TPU
the per-dispatch host latency dominates once each step is fast. betty_tpu
removes that ceiling with three composable dials, all one-liners:

1. ``EngineConfig(compile_blocks=True)`` — the engine simulates the step
   recursion once (unroll_steps / gradient_accumulation / roll_back are
   static config), fuses a whole schedule period into ONE XLA program, and
   scans K periods per dispatch (``block_periods``; auto-capped so no
   validation boundary is skipped).
2. ``ArrayLoader(..., device=True)`` — the dataset lives in HBM; compiled
   blocks are fed *index rows only* and the per-step batch gathers execute
   inside the compiled program. A block of 32 meta-steps costs one dispatch
   and a few hundred bytes of host traffic.
3. ``Config(precision="bf16")`` — inner steps compute in bfloat16 on the
   MXU while hypergradients stay fp32 (``solver_precision`` policy;
   bit-identical meta-gradients, ~15% end-to-end on the MWN workload).

Measured on one TPU v5e chip (bench.py): ~273 meta-steps/s end-to-end on
Meta-Weight-Net (ResNet-32 + reweighter MLP, darts; fp32 and bf16 within
noise of each other at this model size) — within ~4% of a hand-written
single-purpose JAX implementation of the same step.

Also shown: ``EngineConfig(remat=...)`` via ``Config(remat=True)`` trades
FLOPs for activation memory, and ``donate_state=True`` halves transient HBM
on direct-attached chips.

A fourth dial for dropout-heavy models: ``EngineConfig(rng_impl="rbg")``
generates masks with the TPU hardware RngBitGenerator instead of threefry
(+28% on the 355M north-star block, where threefry mask generation
profiled at ~17% of device time). Streams differ from threefry, so keep
the default when comparing trajectories against the reference.
"""

import time

from common import (
    Classifier,
    Loader,
    Reweight,
    classifier_module,
    make_imbalanced_mnist,
    reweight_module,
)

from betty_tpu import Config, Engine, EngineConfig, optim

x_train, y_train = make_imbalanced_mnist(imbalance=20, seed=0)
x_meta, y_meta = make_imbalanced_mnist(n=256, imbalance=1, seed=1)

TRAIN_ITERS = 512


def build(compile_blocks, device_data, precision):
    classifier = Classifier(
        name="classifier",
        module=classifier_module(64),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=Loader(x_train, y_train, 64, device=device_data),
        config=Config(type="darts", unroll_steps=1, precision=precision),
    )
    reweight = Reweight(
        name="reweight",
        module=reweight_module(64),
        optimizer=optim.adam(lr=1e-4),
        train_data_loader=Loader(x_meta, y_meta, 64, seed=1,
                                 device=device_data),
        config=Config(precision=precision),
    )
    return Engine(
        config=EngineConfig(train_iters=TRAIN_ITERS,
                            compile_blocks=compile_blocks),
        problems=[reweight, classifier],
        dependencies={"u2l": {reweight: [classifier]},
                      "l2u": {classifier: [reweight]}},
    )


if __name__ == "__main__":
    for name, cfg in [
        ("driver, host data, fp32", (False, False, "fp32")),
        ("blocks, host data, fp32", (True, False, "fp32")),
        ("blocks, device data, fp32", (True, True, "fp32")),
        ("blocks, device data, bf16", (True, True, "bf16")),
    ]:
        engine = build(*cfg)
        t0 = time.perf_counter()
        engine.run()
        dt = time.perf_counter() - t0
        print(f"{name:28s}: {TRAIN_ITERS / dt:7.1f} meta-steps/s "
              f"(incl. compile)")
