"""Reference-in-the-loop engine parity (run as a subprocess with
JAX_ENABLE_X64=1 by test_reference_parity.py).

Unlike tests/golden_impl.py (which checks solver *functions* against
hand-transcribed torch oracles), this harness runs the ACTUAL reference
library at /root/reference (leopard-ai/betty, pure Python + torch) end to
end: both frameworks are built on the identical float64 bilevel fixture
(same data batches, same initial parameters, same optimizers) and stepped
in lockstep via their engines' ``train_step``; per-global-step parameter
trajectories of BOTH problems must agree to <= 1e-5 (BASELINE.md) across
darts/cg/neumann/sama x unroll x gradient accumulation x roll_back x
warmup x LR schedule. A transcription error in a re-implemented oracle
cannot pass here — the reference itself is the oracle.

Reference drive points: betty/engine.py:86-91 (train_step),
betty/problems/problem.py:371-454 (step recursion; identical semantics
asserted here trajectory-by-trajectory).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as F

torch.set_default_dtype(torch.float64)

# --- reference (the real thing) ---
from betty.engine import Engine as RefEngine
from betty.configs import Config as RefConfig, EngineConfig as RefEngineConfig
from betty.problems import ImplicitProblem as RefImplicitProblem

# --- betty_tpu ---
from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
from betty_tpu.module import from_fn

DIM = 20
TOL = 1e-5

rng = np.random.RandomState(7)
W_GT = rng.randn(DIM)
_X = rng.randn(120, DIM)
_Y = ((_X @ W_GT + 0.1 * rng.randn(120)) > 0).astype(np.float64)
# 3 train batches / 2 valid batches so loader cycling order is exercised
TRAIN_BATCHES = [(_X[i * 20 : (i + 1) * 20], _Y[i * 20 : (i + 1) * 20]) for i in range(3)]
VALID_BATCHES = [(_X[60 + i * 30 : 60 + (i + 1) * 30], _Y[60 + i * 30 : 60 + (i + 1) * 30]) for i in range(2)]
W0 = 0.3 * rng.randn(DIM)  # nonzero so solvers see nontrivial curvature
LAM0 = np.abs(rng.randn(DIM)) + 0.5


# ---------------------------------------------------------------- reference
class RefChildNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.w = torch.nn.Parameter(torch.as_tensor(W0.copy()))

    def forward(self, inputs):
        return inputs @ self.w, self.w


class RefParentNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.w = torch.nn.Parameter(torch.as_tensor(LAM0.copy()))

    def forward(self):
        return self.w


class RefOuter(RefImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.inner(inputs)[0]
        return F.binary_cross_entropy_with_logits(outs, targets)

    def param_callback(self):
        for p in self.trainable_parameters():
            p.data.clamp_(min=1e-8)


class RefInner(RefImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, params = self.module(inputs)
        return F.binary_cross_entropy_with_logits(outs, targets) + 0.5 * torch.sum(
            self.outer() * params * params
        )


def build_ref(sc):
    train_loader = [
        (torch.as_tensor(x.copy()), torch.as_tensor(y.copy())) for x, y in TRAIN_BATCHES
    ]
    valid_loader = [
        (torch.as_tensor(x.copy()), torch.as_tensor(y.copy())) for x, y in VALID_BATCHES
    ]
    inner_module = RefChildNet()
    outer_module = RefParentNet()
    if sc["inner_opt"] == "adam":
        inner_optimizer = torch.optim.Adam(inner_module.parameters(), lr=0.05)
    else:
        inner_optimizer = torch.optim.SGD(inner_module.parameters(), lr=0.1)
    outer_optimizer = torch.optim.SGD(outer_module.parameters(), lr=0.1, momentum=0.9)
    inner_scheduler = None
    if sc.get("sched"):
        inner_scheduler = torch.optim.lr_scheduler.StepLR(
            inner_optimizer, step_size=4, gamma=0.5
        )

    outer = RefOuter(
        name="outer",
        module=outer_module,
        optimizer=outer_optimizer,
        train_data_loader=valid_loader,
        config=RefConfig(),
    )
    inner = RefInner(
        name="inner",
        module=inner_module,
        optimizer=inner_optimizer,
        scheduler=inner_scheduler,
        train_data_loader=train_loader,
        config=RefConfig(
            type=sc["solver"],
            unroll_steps=sc["unroll"],
            gradient_accumulation=sc["gas"],
            warmup_steps=sc["warmup"],
            **sc.get("solver_kwargs", {}),
        ),
    )
    engine = RefEngine(
        config=RefEngineConfig(train_iters=sc["iters"], roll_back=sc["rb"]),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    )
    return engine, outer, inner


# ---------------------------------------------------------------- betty_tpu
class JaxOuter(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.inner(inputs)[0]
        return optax.sigmoid_binary_cross_entropy(outs, targets).mean()

    def param_callback(self):
        self.set_params(
            jax.tree_util.tree_map(lambda p: jnp.clip(p, min=1e-8), self.params)
        )


class JaxInner(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, params = self.module(inputs)
        return optax.sigmoid_binary_cross_entropy(outs, targets).mean() + 0.5 * jnp.sum(
            self.outer() * params * params
        )


def build_jax(sc):
    train_loader = [(jnp.asarray(x), jnp.asarray(y)) for x, y in TRAIN_BATCHES]
    valid_loader = [(jnp.asarray(x), jnp.asarray(y)) for x, y in VALID_BATCHES]
    sched = optim.step_lr(0.1, step_size=4, gamma=0.5) if sc.get("sched") else None
    if sc["inner_opt"] == "adam":
        inner_optimizer = optim.adam(lr=0.05)
    else:
        inner_optimizer = optim.sgd(lr=0.1, schedule=sched)

    outer = JaxOuter(
        name="outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.asarray(LAM0)}),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=valid_loader,
        config=Config(),
    )
    inner = JaxInner(
        name="inner",
        module=from_fn(lambda p, i: (i @ p["w"], p["w"]), {"w": jnp.asarray(W0)}),
        optimizer=inner_optimizer,
        train_data_loader=train_loader,
        config=Config(
            type=sc["solver"],
            unroll_steps=sc["unroll"],
            gradient_accumulation=sc["gas"],
            warmup_steps=sc["warmup"],
            **sc.get("solver_kwargs", {}),
        ),
    )
    engine = Engine(
        config=EngineConfig(train_iters=sc["iters"], roll_back=sc["rb"]),
        problems=[outer, inner],
        dependencies={"u2l": {outer: [inner]}, "l2u": {inner: [outer]}},
    )
    return engine, outer, inner


# ---------------------------------------------------------------- BatchNorm case
#
# The reference's darts solver runs perturbed forwards in train mode, so
# torch BN *running stats* also update during hypergradient evaluation and
# during the upper problem's forwards through the lower module
# (/root/reference/betty/hypergradient/darts.py:39-57). betty_tpu's policy
# (problems/problem.py:356-370) updates a problem's mutable collections only
# during its OWN training step. Running statistics never feed a train-mode
# forward (train mode normalizes by batch statistics), so PARAMETER
# trajectories must agree exactly despite the different stats cadence — this
# scenario proves that, and measures the (validation-only) stats divergence.

BN_MOM, BN_EPS = 0.1, 1e-5
H = 8
FC1_W = 0.3 * rng.randn(H, DIM)
FC1_B = 0.1 * rng.randn(H)
FC2_W = 0.3 * rng.randn(1, H)
FC2_B = 0.1 * rng.randn(1)


class RefBNNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(DIM, H)
        self.bn = torch.nn.BatchNorm1d(H, momentum=BN_MOM, eps=BN_EPS)
        self.fc2 = torch.nn.Linear(H, 1)
        with torch.no_grad():
            self.fc1.weight.copy_(torch.as_tensor(FC1_W))
            self.fc1.bias.copy_(torch.as_tensor(FC1_B))
            self.fc2.weight.copy_(torch.as_tensor(FC2_W))
            self.fc2.bias.copy_(torch.as_tensor(FC2_B))

    def forward(self, x):
        h = torch.relu(self.bn(self.fc1(x)))
        return self.fc2(h).squeeze(-1)


class RefBNInner(RefImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.module(inputs)
        l2 = sum(p.pow(2).sum() for p in self.module.parameters())
        return F.binary_cross_entropy_with_logits(outs, targets) + 0.5 * self.outer() * l2


class RefBNOuter(RefImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.inner(inputs)
        return F.binary_cross_entropy_with_logits(outs, targets)

    def param_callback(self):
        for p in self.trainable_parameters():
            p.data.clamp_(min=1e-8)


def jax_bn_module():
    from betty_tpu.module import FunctionalModule

    def apply_fn(variables, x, train=True, rngs=None, mutable=()):
        p, bs = variables["params"], variables["batch_stats"]
        h = x @ p["fc1_w"].T + p["fc1_b"]
        if train:
            mean = h.mean(0)
            var = ((h - mean) ** 2).mean(0)  # biased, as torch uses in-forward
            n = h.shape[0]
            new_stats = {
                "rm": (1 - BN_MOM) * bs["rm"] + BN_MOM * mean,
                # torch stores the UNBIASED variance in running_var
                "rv": (1 - BN_MOM) * bs["rv"] + BN_MOM * var * n / (n - 1),
            }
        else:
            mean, var = bs["rm"], bs["rv"]
            new_stats = bs
        hn = (h - mean) / jnp.sqrt(var + BN_EPS) * p["gamma"] + p["beta"]
        out = (jax.nn.relu(hn) @ p["fc2_w"].T + p["fc2_b"]).squeeze(-1)
        if mutable:
            return out, {"batch_stats": new_stats}
        return out

    variables = {
        "params": {
            "fc1_w": jnp.asarray(FC1_W), "fc1_b": jnp.asarray(FC1_B),
            "gamma": jnp.ones(H), "beta": jnp.zeros(H),
            "fc2_w": jnp.asarray(FC2_W), "fc2_b": jnp.asarray(FC2_B),
        },
        "batch_stats": {"rm": jnp.zeros(H), "rv": jnp.ones(H)},
    }
    return FunctionalModule(apply_fn, variables=variables,
                            mutable_collections=("batch_stats",))


class JaxBNInner(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.module(inputs)
        l2 = sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(self.params))
        return optax.sigmoid_binary_cross_entropy(outs, targets).mean() + 0.5 * self.outer() * l2


class JaxBNOuter(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.inner(inputs)
        return optax.sigmoid_binary_cross_entropy(outs, targets).mean()

    def param_callback(self):
        self.set_params(
            jax.tree_util.tree_map(lambda p: jnp.clip(p, min=1e-8), self.params)
        )


def run_batchnorm_case(iters=12, unroll=2):
    # reference
    inner_module = RefBNNet()
    outer_module = RefParentNet()
    with torch.no_grad():
        outer_module.w.data = torch.full((1,), 0.05, dtype=torch.float64)
    ref_outer = RefBNOuter(
        name="outer", module=outer_module,
        optimizer=torch.optim.SGD(outer_module.parameters(), lr=0.1, momentum=0.9),
        train_data_loader=[
            (torch.as_tensor(x.copy()), torch.as_tensor(y.copy())) for x, y in VALID_BATCHES
        ],
        config=RefConfig(),
    )
    ref_inner = RefBNInner(
        name="inner", module=inner_module,
        optimizer=torch.optim.SGD(inner_module.parameters(), lr=0.1),
        train_data_loader=[
            (torch.as_tensor(x.copy()), torch.as_tensor(y.copy())) for x, y in TRAIN_BATCHES
        ],
        config=RefConfig(type="darts", unroll_steps=unroll),
    )
    ref_engine = RefEngine(
        config=RefEngineConfig(train_iters=iters),
        problems=[ref_outer, ref_inner],
        dependencies={"u2l": {ref_outer: [ref_inner]}, "l2u": {ref_inner: [ref_outer]}},
    )

    # betty_tpu
    jax_outer = JaxBNOuter(
        name="outer",
        module=from_fn(lambda p: p["w"][0], {"w": jnp.full((1,), 0.05)}),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=[(jnp.asarray(x), jnp.asarray(y)) for x, y in VALID_BATCHES],
        config=Config(),
    )
    jax_inner = JaxBNInner(
        name="inner", module=jax_bn_module(),
        optimizer=optim.sgd(lr=0.1),
        train_data_loader=[(jnp.asarray(x), jnp.asarray(y)) for x, y in TRAIN_BATCHES],
        config=Config(type="darts", unroll_steps=unroll),
    )
    jax_engine = Engine(
        config=EngineConfig(train_iters=iters),
        problems=[jax_outer, jax_inner],
        dependencies={"u2l": {jax_outer: [jax_inner]}, "l2u": {jax_inner: [jax_outer]}},
    )

    param_err = 0.0
    for _ in range(iters):
        ref_engine.train_step()
        jax_engine.global_step += 1
        jax_engine.train_step()
        ref_p = {
            "fc1_w": inner_module.fc1.weight.detach().numpy(),
            "fc1_b": inner_module.fc1.bias.detach().numpy(),
            "gamma": inner_module.bn.weight.detach().numpy(),
            "beta": inner_module.bn.bias.detach().numpy(),
            "fc2_w": inner_module.fc2.weight.detach().numpy(),
            "fc2_b": inner_module.fc2.bias.detach().numpy(),
        }
        jax_p = jax_engine.states["inner"]["params"]
        for k in ref_p:
            param_err = max(param_err, float(np.max(np.abs(ref_p[k] - np.asarray(jax_p[k])))))
        param_err = max(
            param_err,
            float(np.max(np.abs(
                outer_module.w.detach().numpy()
                - np.asarray(jax_engine.states["outer"]["params"]["w"])
            ))),
        )

    # running-stats divergence (validation-only effect, by design — betty_tpu
    # updates stats once per own-step; torch also updates in solver forwards)
    bs = jax_engine.states["inner"]["extra"]["batch_stats"]
    rm_ref = inner_module.bn.running_mean.detach().numpy()
    rv_ref = inner_module.bn.running_var.detach().numpy()
    rm_diff = float(np.max(np.abs(rm_ref - np.asarray(bs["rm"]))))
    rv_diff = float(np.max(np.abs(rv_ref - np.asarray(bs["rv"]))))
    stats_moved = float(np.max(np.abs(np.asarray(bs["rm"])))) > 1e-3
    ok = param_err <= TOL and stats_moved
    status = "OK " if ok else "FAIL"
    print(
        f"{status} batchnorm darts u{unroll}: param traj |diff| = {param_err:.3e}; "
        f"running-stats |diff| rm={rm_diff:.3e} rv={rv_diff:.3e} "
        f"(expected nonzero: stats-update cadence differs by design, "
        f"PARITY.md)"
    )
    return ok


# ---------------------------------------------------------------- trilevel
#
# learning_by_ignoring's graph (reference examples/learning_by_ignoring/
# main.py:327-329): u2l={reweight:[pretrain]},
# l2u={pretrain:[finetune, reweight], finetune:[reweight]} — the top problem
# has TWO hypergradient paths (direct via pretrain and chained via finetune),
# exercising multi-path accumulation (reference problem.py:572-597) against
# the actual reference engine.

RHO = 0.7
XT = rng.randn(60, DIM)
YT = ((XT @ W_GT + 0.1 * rng.randn(60)) > 0).astype(np.float64)
TARGET_BATCHES = [(XT[i * 20 : (i + 1) * 20], YT[i * 20 : (i + 1) * 20]) for i in range(3)]
WP0 = 0.3 * rng.randn(DIM)
WF0 = 0.3 * rng.randn(DIM)
LAMW0 = 0.1 * rng.randn(DIM)


class RefPretrain(RefImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, _ = self.module(inputs)
        lw = torch.sigmoid(self.reweight(inputs)[0])
        ce = F.binary_cross_entropy_with_logits(outs, targets, reduction="none")
        return torch.mean(lw * ce)


class RefFinetune(RefImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, wf = self.module(inputs)
        wp = self.pretrain(inputs)[1]
        prox = 0.5 * RHO * torch.sum((wf - wp) ** 2)
        return F.binary_cross_entropy_with_logits(outs, targets) + prox


class RefReweight(RefImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.finetune(inputs)[0]
        outs_p = self.pretrain(inputs)[0]
        return F.binary_cross_entropy_with_logits(outs, targets) + 0.1 * (
            F.binary_cross_entropy_with_logits(outs_p, targets)
        )


class JaxPretrain(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, _ = self.module(inputs)
        lw = jax.nn.sigmoid(self.reweight(inputs)[0])
        ce = optax.sigmoid_binary_cross_entropy(outs, targets)
        return jnp.mean(lw * ce)


class JaxFinetune(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs, wf = self.module(inputs)
        wp = self.pretrain(inputs)[1]
        prox = 0.5 * RHO * jnp.sum((wf - wp) ** 2)
        return optax.sigmoid_binary_cross_entropy(outs, targets).mean() + prox


class JaxReweight(ImplicitProblem):
    def training_step(self, batch):
        inputs, targets = batch
        outs = self.finetune(inputs)[0]
        outs_p = self.pretrain(inputs)[0]
        return (
            optax.sigmoid_binary_cross_entropy(outs, targets).mean()
            + 0.1 * optax.sigmoid_binary_cross_entropy(outs_p, targets).mean()
        )


def _linear_module_torch(w0):
    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.w = torch.nn.Parameter(torch.as_tensor(w0.copy()))

        def forward(self, inputs):
            return inputs @ self.w, self.w

    return Net()


def run_trilevel_case(unroll=1, iters=10, solver="darts"):
    def t_loader(batches):
        return [(torch.as_tensor(x.copy()), torch.as_tensor(y.copy())) for x, y in batches]

    def j_loader(batches):
        return [(jnp.asarray(x), jnp.asarray(y)) for x, y in batches]

    # reference
    pre_mod = _linear_module_torch(WP0)
    ref_pre = RefPretrain(
        name="pretrain", module=pre_mod,
        optimizer=torch.optim.SGD(pre_mod.parameters(), lr=0.1),
        train_data_loader=t_loader(TRAIN_BATCHES),
        config=RefConfig(type=solver, unroll_steps=unroll),
    )
    fin_mod = _linear_module_torch(WF0)
    ref_fin = RefFinetune(
        name="finetune", module=fin_mod,
        optimizer=torch.optim.SGD(fin_mod.parameters(), lr=0.1),
        train_data_loader=t_loader(TARGET_BATCHES),
        config=RefConfig(type=solver, unroll_steps=1),
    )
    rw_mod = _linear_module_torch(LAMW0)
    ref_rw = RefReweight(
        name="reweight", module=rw_mod,
        optimizer=torch.optim.SGD(rw_mod.parameters(), lr=0.1, momentum=0.9),
        train_data_loader=t_loader(VALID_BATCHES),
        config=RefConfig(retain_graph=True),
    )
    ref_engine = RefEngine(
        config=RefEngineConfig(train_iters=iters),
        problems=[ref_rw, ref_fin, ref_pre],
        dependencies={
            "u2l": {ref_rw: [ref_pre]},
            "l2u": {ref_pre: [ref_fin, ref_rw], ref_fin: [ref_rw]},
        },
    )

    # betty_tpu
    def lin(w0):
        return from_fn(lambda p, i: (i @ p["w"], p["w"]), {"w": jnp.asarray(w0)})

    jax_pre = JaxPretrain(
        name="pretrain", module=lin(WP0), optimizer=optim.sgd(lr=0.1),
        train_data_loader=j_loader(TRAIN_BATCHES),
        config=Config(type=solver, unroll_steps=unroll),
    )
    jax_fin = JaxFinetune(
        name="finetune", module=lin(WF0), optimizer=optim.sgd(lr=0.1),
        train_data_loader=j_loader(TARGET_BATCHES),
        config=Config(type=solver, unroll_steps=1),
    )
    jax_rw = JaxReweight(
        name="reweight", module=lin(LAMW0),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=j_loader(VALID_BATCHES),
        config=Config(retain_graph=True),
    )
    jax_engine = Engine(
        config=EngineConfig(train_iters=iters),
        problems=[jax_rw, jax_fin, jax_pre],
        dependencies={
            "u2l": {jax_rw: [jax_pre]},
            "l2u": {jax_pre: [jax_fin, jax_rw], jax_fin: [jax_rw]},
        },
    )

    err = 0.0
    for _ in range(iters):
        ref_engine.train_step()
        jax_engine.global_step += 1
        jax_engine.train_step()
        for ref_p, name in ((ref_pre, "pretrain"), (ref_fin, "finetune"),
                            (ref_rw, "reweight")):
            e = float(np.max(np.abs(
                ref_p.module.w.detach().numpy()
                - np.asarray(jax_engine.states[name]["params"]["w"])
            )))
            err = max(err, e)
    ok = err <= TOL
    status = "OK " if ok else "FAIL"
    print(f"{status} trilevel LBI-graph {solver} u{unroll} (2 paths): "
          f"max traj |diff| = {err:.3e}")
    return ok


# ---------------------------------------------------------------- penalty
def run_penalty_case(iters=10):
    """PenaltyProblem (reference betty/problems/penalty_problem.py) as the
    inner problem of the bilevel fixture — same step semantics as
    ImplicitProblem minus SAMA last_grad caching."""
    from betty.problems.penalty_problem import PenaltyProblem as RefPenaltyProblem
    from betty_tpu import PenaltyProblem

    class RefPenInner(RefPenaltyProblem):
        training_step = RefInner.training_step

    class JaxPenInner(PenaltyProblem):
        training_step = JaxInner.training_step

    inner_module = RefChildNet()
    pen_inner = RefPenInner(
        name="inner", module=inner_module,
        optimizer=torch.optim.Adam(inner_module.parameters(), lr=0.05),
        train_data_loader=[
            (torch.as_tensor(x.copy()), torch.as_tensor(y.copy()))
            for x, y in TRAIN_BATCHES
        ],
        config=RefConfig(type="darts", unroll_steps=2),
    )
    outer_module = RefParentNet()
    ref_outer = RefOuter(
        name="outer", module=outer_module,
        optimizer=torch.optim.SGD(outer_module.parameters(), lr=0.1, momentum=0.9),
        train_data_loader=[
            (torch.as_tensor(x.copy()), torch.as_tensor(y.copy()))
            for x, y in VALID_BATCHES
        ],
        config=RefConfig(),
    )
    ref_engine = RefEngine(
        config=RefEngineConfig(train_iters=iters),
        problems=[ref_outer, pen_inner],
        dependencies={"u2l": {ref_outer: [pen_inner]},
                      "l2u": {pen_inner: [ref_outer]}},
    )

    jax_inner = JaxPenInner(
        name="inner",
        module=from_fn(lambda p, i: (i @ p["w"], p["w"]), {"w": jnp.asarray(W0)}),
        optimizer=optim.adam(lr=0.05),
        train_data_loader=[(jnp.asarray(x), jnp.asarray(y)) for x, y in TRAIN_BATCHES],
        config=Config(type="darts", unroll_steps=2),
    )
    jax_outer = JaxOuter(
        name="outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.asarray(LAM0)}),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=[(jnp.asarray(x), jnp.asarray(y)) for x, y in VALID_BATCHES],
        config=Config(),
    )
    jax_engine = Engine(
        config=EngineConfig(train_iters=iters),
        problems=[jax_outer, jax_inner],
        dependencies={"u2l": {jax_outer: [jax_inner]},
                      "l2u": {jax_inner: [jax_outer]}},
    )

    err = 0.0
    for _ in range(iters):
        ref_engine.train_step()
        jax_engine.global_step += 1
        jax_engine.train_step()
        err = max(err, float(np.max(np.abs(
            pen_inner.module.w.detach().numpy()
            - np.asarray(jax_engine.states["inner"]["params"]["w"])
        ))))
        err = max(err, float(np.max(np.abs(
            ref_outer.module.w.detach().numpy()
            - np.asarray(jax_engine.states["outer"]["params"]["w"])
        ))))
    ok = err <= TOL
    status = "OK " if ok else "FAIL"
    print(f"{status} PenaltyProblem darts u2 adam: max traj |diff| = {err:.3e}")
    return ok


# ------------------------------------------------------- param_groups + sama
WA0 = 0.3 * rng.randn(DIM)
WB0 = 0.3 * rng.randn(DIM)


def run_param_groups_sama_case(iters=12, unroll=3):
    """Per-group lr through the SAMA preconditioner (reference reads
    param_group['lr'] per parameter, hypergradient/utils.py:45-61) — the
    actual reference engine with a two-group torch.optim.Adam vs betty_tpu's
    param_groups hook."""

    class RefTwo(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.wa = torch.nn.Parameter(torch.as_tensor(WA0.copy()))
            self.wb = torch.nn.Parameter(torch.as_tensor(WB0.copy()))

        def forward(self, inputs):
            w = self.wa + self.wb
            return inputs @ w, w

    class RefTwoInner(RefImplicitProblem):
        training_step = RefInner.training_step

        def param_groups(self):
            # the reference DISCARDS groups passed via the optimizer ctor
            # (patch_optimizer re-instantiates from module.parameters() with
            # ctor defaults, betty/patch/optimizer.py:14-17); per-group
            # hyperparams must come through this hook (problem.py:253-254)
            return [
                {"params": [self.module.wa], "lr": 0.05},
                {"params": [self.module.wb], "lr": 0.01},
            ]

    mod = RefTwo()
    ref_inner = RefTwoInner(
        name="inner", module=mod,
        optimizer=torch.optim.Adam(mod.parameters(), lr=0.05),
        train_data_loader=[
            (torch.as_tensor(x.copy()), torch.as_tensor(y.copy()))
            for x, y in TRAIN_BATCHES
        ],
        config=RefConfig(type="sama", unroll_steps=unroll,
                         sama_adam_alpha=1.0),
    )
    outer_module = RefParentNet()
    ref_outer = RefOuter(
        name="outer", module=outer_module,
        optimizer=torch.optim.SGD(outer_module.parameters(), lr=0.1,
                                  momentum=0.9),
        train_data_loader=[
            (torch.as_tensor(x.copy()), torch.as_tensor(y.copy()))
            for x, y in VALID_BATCHES
        ],
        config=RefConfig(),
    )
    ref_engine = RefEngine(
        config=RefEngineConfig(train_iters=iters),
        problems=[ref_outer, ref_inner],
        dependencies={"u2l": {ref_outer: [ref_inner]},
                      "l2u": {ref_inner: [ref_outer]}},
    )

    class JaxTwoInner(ImplicitProblem):
        training_step = JaxInner.training_step

        def param_groups(self):
            return [
                {"select": r"^wa", "lr": 0.05},
                {"select": None, "lr": 0.01},
            ]

    jax_inner = JaxTwoInner(
        name="inner",
        module=from_fn(
            lambda p, i: (i @ (p["wa"] + p["wb"]), p["wa"] + p["wb"]),
            {"wa": jnp.asarray(WA0), "wb": jnp.asarray(WB0)},
        ),
        optimizer=optim.adam(lr=0.05),
        train_data_loader=[(jnp.asarray(x), jnp.asarray(y)) for x, y in TRAIN_BATCHES],
        config=Config(type="sama", unroll_steps=unroll, sama_adam_alpha=1.0),
    )
    jax_outer = JaxOuter(
        name="outer",
        module=from_fn(lambda p: p["w"], {"w": jnp.asarray(LAM0)}),
        optimizer=optim.sgd(lr=0.1, momentum=0.9),
        train_data_loader=[(jnp.asarray(x), jnp.asarray(y)) for x, y in VALID_BATCHES],
        config=Config(),
    )
    jax_engine = Engine(
        config=EngineConfig(train_iters=iters),
        problems=[jax_outer, jax_inner],
        dependencies={"u2l": {jax_outer: [jax_inner]},
                      "l2u": {jax_inner: [jax_outer]}},
    )

    err = 0.0
    for _ in range(iters):
        ref_engine.train_step()
        jax_engine.global_step += 1
        jax_engine.train_step()
        for t_p, key in ((mod.wa, "wa"), (mod.wb, "wb")):
            err = max(err, float(np.max(np.abs(
                t_p.detach().numpy()
                - np.asarray(jax_engine.states["inner"]["params"][key])
            ))))
        err = max(err, float(np.max(np.abs(
            outer_module.w.detach().numpy()
            - np.asarray(jax_engine.states["outer"]["params"]["w"])
        ))))
    ok = err <= TOL
    status = "OK " if ok else "FAIL"
    print(f"{status} param_groups sama u{unroll} (per-group lr): "
          f"max traj |diff| = {err:.3e}")
    return ok


# ---------------------------------------------------------------- harness
SCENARIOS = [
    dict(name="darts u1", solver="darts", unroll=1, gas=1, rb=False, warmup=0,
         iters=8, inner_opt="sgd"),
    dict(name="darts u5", solver="darts", unroll=5, gas=1, rb=False, warmup=0,
         iters=15, inner_opt="sgd"),
    dict(name="darts u2 roll_back", solver="darts", unroll=2, gas=1, rb=True,
         warmup=0, iters=12, inner_opt="sgd"),
    dict(name="darts u2 gas2", solver="darts", unroll=2, gas=2, rb=False,
         warmup=0, iters=16, inner_opt="sgd"),
    dict(name="darts u2 warmup4", solver="darts", unroll=2, gas=1, rb=False,
         warmup=4, iters=14, inner_opt="sgd"),
    dict(name="darts u2 sched", solver="darts", unroll=2, gas=1, rb=False,
         warmup=0, iters=12, inner_opt="sgd", sched=True),
    dict(name="darts u2 clip0.5", solver="darts", unroll=2, gas=1, rb=False,
         warmup=0, iters=12, inner_opt="sgd",
         solver_kwargs=dict(gradient_clipping=0.5)),
    dict(name="cg u3", solver="cg", unroll=3, gas=1, rb=False, warmup=0,
         iters=12, inner_opt="sgd",
         solver_kwargs=dict(cg_iterations=3, cg_alpha=0.35)),
    dict(name="neumann u3", solver="neumann", unroll=3, gas=1, rb=False,
         warmup=0, iters=12, inner_opt="sgd",
         solver_kwargs=dict(neumann_iterations=4, neumann_alpha=0.7)),
    dict(name="sama u5 adam", solver="sama", unroll=5, gas=1, rb=False,
         warmup=0, iters=15, inner_opt="adam",
         solver_kwargs=dict(sama_adam_alpha=1.0)),
]


def run_ref(sc):
    engine, outer, inner = build_ref(sc)
    traj = []
    for _ in range(sc["iters"]):
        engine.train_step()
        traj.append((
            inner.module.w.detach().numpy().copy(),
            outer.module.w.detach().numpy().copy(),
        ))
    return traj


def run_jax(sc):
    engine, outer, inner = build_jax(sc)
    traj = []
    for _ in range(sc["iters"]):
        engine.global_step += 1
        engine.train_step()
        traj.append((
            np.asarray(engine.states["inner"]["params"]["w"]),
            np.asarray(engine.states["outer"]["params"]["w"]),
        ))
    return traj


def main():
    ok = True
    for sc in SCENARIOS:
        ref_traj = run_ref(sc)
        jax_traj = run_jax(sc)
        err = 0.0
        first_bad = None
        for t, ((ri, ro), (ji, jo)) in enumerate(zip(ref_traj, jax_traj)):
            e = max(np.max(np.abs(ri - ji)), np.max(np.abs(ro - jo)))
            if e > err:
                err = e
            if e > TOL and first_bad is None:
                first_bad = t
        status = "OK " if err <= TOL else f"FAIL@step{first_bad}"
        print(f"{status} {sc['name']}: max traj |diff| = {err:.3e}")
        ok &= err <= TOL
    ok &= run_batchnorm_case()
    ok &= run_trilevel_case(unroll=1)
    ok &= run_trilevel_case(unroll=3)
    ok &= run_penalty_case()
    ok &= run_param_groups_sama_case()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
