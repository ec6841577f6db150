"""Tutorial 8 — writing a custom hypergradient solver.

Counterpart of the reference's custom-hypergradient guide
(``docs/tutorial/intermediate/intermediate_hypergradient.rst``): plug a new
best-response-Jacobian-vector-product algorithm into the solver registry
without touching any other part of the MLO program.

A solver computes, for one edge (curr=lower, prev=upper) of a backprop path,

    v'  =  (d w*(lambda) / d lambda)^T  @  v

where w* is the lower problem's best response to the upper parameters
lambda. The reference's solvers receive live torch modules and perturb them
in place; betty_tpu solvers are PURE functions over the immutable trace
context, so they compose with jit / scan / sharding automatically:

    def my_solver(vector, curr, prev, ctx, states, curr_batch, rng):
        vector      v (pytree matching curr's params)
        curr/prev   Problem objects (config, eval_loss, paths)
        ctx         {problem_name: {"params": ..., "extra": ...}} frozen view
        states      full engine states (optimizer moments etc. — SAMA reads
                    Adam moments from here)
        curr_batch  curr's current batch
        rng         per-step PRNG key
        returns     v' (pytree matching prev's params)

Register it once:  register_solver("t1t2", my_solver); select it per problem
with Config(type="t1t2").

Below: the T1-T2 (one-step unrolled differentiation) solver — the exact
mixed second derivative -(d^2 C / d lambda d w) @ v, which darts
approximates by central differences — implemented in six lines with jvp.
"""

import jax
import numpy as np

from common import (
    Classifier,
    Loader,
    Reweight,
    classifier_module,
    make_imbalanced_mnist,
    reweight_module,
)

from betty_tpu import Config, Engine, EngineConfig, optim
from betty_tpu.hypergradient import register_solver
from betty_tpu.utils import neg


def t1t2(vector, curr, prev, ctx, states, curr_batch, rng):
    """Exact cross-Hessian-vector product: -(d^2 C / d prev d curr) @ v.

    darts approximates this with two perturbed gradient evaluations
    (betty_tpu/hypergradient/darts.py); jvp gives it exactly for the same
    cost order: one forward-over-reverse pass.
    """
    from betty_tpu.problems.problem import ctx_replace

    def grad_wrt_prev(curr_params):
        def loss(prev_params):
            c = ctx_replace(ctx, curr.name, curr_params)
            c = ctx_replace(c, prev.name, prev_params)
            return curr.eval_loss(c, curr_batch, rng=rng)[0]

        return jax.grad(loss)(ctx[prev.name]["params"])

    w0 = ctx[curr.name]["params"]
    _, cross = jax.jvp(grad_wrt_prev, (w0,), (vector,))
    return neg(cross)


register_solver("t1t2", t1t2)


def main():
    x_train, y_train = make_imbalanced_mnist(imbalance=20, seed=0)
    x_meta, y_meta = make_imbalanced_mnist(n=256, imbalance=1, seed=1)

    classifier = Classifier(
        name="classifier",
        module=classifier_module(128),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=Loader(x_train, y_train, batch_size=128, seed=0),
        config=Config(type="t1t2", unroll_steps=1),  # <- the custom solver
    )
    reweight = Reweight(
        name="reweight",
        module=reweight_module(128),
        optimizer=optim.adam(lr=1e-4),
        train_data_loader=Loader(x_meta, y_meta, batch_size=128, seed=1),
        config=Config(),
    )
    engine = Engine(
        config=EngineConfig(train_iters=100),
        problems=[reweight, classifier],
        dependencies={"u2l": {reweight: [classifier]},
                      "l2u": {classifier: [reweight]}},
    )
    engine.run()

    w = np.asarray(
        jax.tree_util.tree_leaves(engine.states["reweight"]["params"])[0]
    )
    assert np.all(np.isfinite(w))
    print("custom t1t2 solver trained; reweighter first-leaf norm:",
          float(np.linalg.norm(w)))


if __name__ == "__main__":
    main()
