"""Tutorial 7 — model parallelism: tp / pp / ep / sp (no reference counterpart).

Tutorial 5 scaled the BATCH over devices (dp/zero/fsdp). When one model —
or the second-order solver state around it — outgrows a chip, betty_tpu
also shards the MODEL, still with one process and zero communication code:

* ``strategy="tp"``      — Megatron tensor parallelism: attention heads
  column/row-parallel, MLP column-then-row, embeddings vocab-sharded over
  the ``mdl`` mesh axis; pin individual layouts with ``Config.shard_rules``.
* GPipe pipelining       — ``models.make_pipelined_transformer(mesh)``
  stacks encoder blocks with a leading depth axis sharded over ``pp``;
  microbatches flow through the stages via scan+ppermute, and every
  hypergradient solver differentiates straight through the pipeline.
* Expert parallelism     — ``models.moe``: Switch top-1 MoE whose expert
  axis shards over ``ep`` (GShard dispatch einsums).
* Sequence parallelism   — ``make_pipelined_transformer(seq_axis="sp")``
  shards inter-block activations on the sequence dimension (Megatron-SP).

Run without TPUs:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python tutorial/7_model_parallelism.py --mode tp
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# honor JAX_PLATFORMS=cpu even when a TPU plugin overrides the env var
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.models import (
    MetaWeightNet,
    TransformerClassifier,
    make_pipelined_transformer,
)
from betty_tpu.module import from_flax

parser = argparse.ArgumentParser()
parser.add_argument("--mode", default="tp", choices=["tp", "pp", "sp"])
parser.add_argument("--train_iters", type=int, default=20)
args = parser.parse_args()

VOCAB, LEN, DIM, DEPTH, HEADS = 256, 16, 64, 4, 4
BATCH = 32


def loader(seed):
    r = np.random.RandomState(seed)
    while True:
        yield (r.randint(2, VOCAB, size=(BATCH, LEN)).astype(np.int32),
               r.randint(0, 2, size=BATCH).astype(np.int32))


class Classifier(ImplicitProblem):
    def training_step(self, batch):
        ids, y = batch
        ce = optax.softmax_cross_entropy_with_integer_labels(
            self.module(ids), y)
        w = self.reweight(jax.lax.stop_gradient(ce))
        return jnp.mean(w * ce)


class Reweight(ImplicitProblem):
    def training_step(self, batch):
        ids, y = batch
        return optax.softmax_cross_entropy_with_integer_labels(
            self.classifier(ids), y).mean()


# one mesh, two axes: batch over "dp", model over the second axis
if args.mode == "tp":
    mesh_shape = (("dp", 2), ("mdl", 4))
    module = from_flax(
        TransformerClassifier(vocab_size=VOCAB, max_len=LEN, dim=DIM,
                              depth=DEPTH, heads=HEADS, num_classes=2),
        jnp.ones((BATCH, LEN), jnp.int32),
        rng=jax.random.PRNGKey(0), train_kwarg="train",
    )
    clf_config = Config(type="darts", unroll_steps=1)
    strategy = "tp"  # Megatron rules pick the layouts automatically
elif args.mode == "pp":
    from betty_tpu.parallel import make_mesh

    mesh_shape = (("dp", 2), ("pp", 4))
    module = make_pipelined_transformer(
        make_mesh(mesh_shape), vocab_size=VOCAB, max_len=LEN, dim=DIM,
        depth=DEPTH, heads=HEADS, num_classes=2,
        rng=jax.random.PRNGKey(0), num_microbatches=4,
    )
    # stage parameters (leading depth axis) sharded over pp
    clf_config = Config(type="darts", unroll_steps=1,
                        shard_rules=((r"^blocks", ("pp",)),))
    strategy = "tp"
else:  # sp
    from betty_tpu.parallel import make_mesh

    mesh_shape = (("dp", 2), ("sp", 4))
    module = make_pipelined_transformer(
        make_mesh(mesh_shape), vocab_size=VOCAB, max_len=LEN, dim=DIM,
        depth=DEPTH, heads=HEADS, num_classes=2,
        rng=jax.random.PRNGKey(0), seq_axis="sp",
    )
    clf_config = Config(type="darts", unroll_steps=1)
    strategy = "dp"

classifier = Classifier(
    name="classifier", module=module,
    optimizer=optim.adamw(lr=1e-4),
    train_data_loader=loader(0), config=clf_config,
)
reweight = Reweight(
    name="reweight",
    module=from_flax(MetaWeightNet(), jnp.zeros((BATCH,)),
                     rng=jax.random.PRNGKey(1), train_kwarg="train"),
    optimizer=optim.adam(lr=1e-4),
    train_data_loader=loader(1), config=Config(type="darts", log_step=10),
)
engine = Engine(
    config=EngineConfig(train_iters=args.train_iters, strategy=strategy,
                        mesh_shape=mesh_shape),
    problems=[reweight, classifier],
    dependencies={"u2l": {reweight: [classifier]},
                  "l2u": {classifier: [reweight]}},
)
engine.run()

p = engine.states["classifier"]["params"]
leaf = jax.tree_util.tree_leaves(p)[0]
sharded = sum(
    1 for x in jax.tree_util.tree_leaves(p)
    if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
)
print(f"mode={args.mode}: {sharded} parameter leaves model-sharded; "
      f"example leaf sharding: {leaf.sharding}")
