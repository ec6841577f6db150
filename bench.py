"""Headline benchmark: Meta-Weight-Net reweighting (ResNet-32 classifier +
MLP reweighter) — BASELINE.json's primary metric, measured honestly:

* meta-steps/sec for **darts, cg, neumann** (median of timing windows =
  sustained; peak also reported — the shared test chip shows run-to-run
  contention),
* **MFU** from the compiled block's XLA cost analysis against the chip's
  bf16 peak,
* **framework overhead** vs a hand-written single-purpose JAX implementation
  of the identical MWN meta-step (same models, solver math, optimizers —
  the delta is what the framework costs),
* **wall-clock to target validation accuracy** on the CI-runnable
  reweighting-under-label-noise workload (cg solver; BASELINE.md names
  CG/Neumann for this metric),
* **fused Pallas vector ops** speedup for the CG loop on a ~25M-parameter
  model (TPU only).

Prints ONE JSON line. ``value`` is the darts *median* meta-steps/s;
``vs_baseline`` compares against the reference (leopard-ai/betty + torch)
executed on the same workload shapes on this machine's CPU — the only
hardware the reference can use here (it publishes no throughput numbers,
BASELINE.md) — so it is a TPU-vs-host-CPU ratio, NOT hardware-normalized;
the ``note`` field says so.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

CACHE = Path(__file__).resolve().parent / ".bench_reference_cache.json"

META_STEPS_TIMED = 96
BATCH = 128

# bf16 peak FLOP/s per chip (public spec sheets), keyed on device_kind
# substrings; used for the MFU denominator.
PEAK_BF16 = (
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5", 197e12),     # v5e ("TPU v5 lite")
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def peak_flops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_BF16:
        if key in kind:
            return val, kind
    return None, kind


def device_sync(tree):
    """Force completion of the computation producing ``tree`` and return a
    scalar. MEASURED on this runtime (axon tunnel): jax.block_until_ready
    returns IMMEDIATELY without waiting, and bulk host transfers run at
    ~1 MB/s — so honest timing requires a DEPENDENT readback of a tiny
    value: an on-device scalar reduction of the first leaf, then a 4-byte
    transfer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:128].astype(jnp.float32))))


def _sync(engine):
    return device_sync(engine.states["classifier"]["params"])


def hbm_peak_bytes():
    """Device memory high-water mark (None when the runtime doesn't report
    memory_stats, e.g. some tunneled backends)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return int(stats.get("peak_bytes_in_use", 0)) or None


def _compiled_block(runner):
    """AOT-compile the runner's block once and memoize it on the runner —
    block_cost_flops and hbm_static_analysis share it (an extra lower+
    compile costs minutes at the 355M scale when the persistent cache is
    cold)."""
    compiled = getattr(runner, "_bench_compiled", None)
    if compiled is None:
        compiled = runner._jit_block.lower(
            *runner._last_abstract_args
        ).compile()
        runner._bench_compiled = compiled
    return compiled


def block_cost_flops(runner, periods):
    """Per-meta-step FLOPs from XLA cost analysis of the compiled block."""
    import sys as _sys

    try:
        cost = _compiled_block(runner).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"]) / periods
    except Exception as e:  # pragma: no cover
        print(f"# cost analysis unavailable: {e!r}", file=_sys.stderr)
        return None


def hbm_static_analysis(runner):
    """Compile-time HBM footprint of the compiled block from XLA's memory
    analysis — available even where the runtime reports no memory_stats
    (the axon tunnel returns None there). arguments = resident state +
    staged index rows, temps = transient activations/remat residuals,
    alias = donated buffers shared between argument and output."""
    try:
        ma = _compiled_block(runner).memory_analysis()
        if ma is None:
            return None
        peak = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                + ma.output_size_in_bytes - ma.alias_size_in_bytes)
        return {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
            "upper_bound_gib": round(peak / 2**30, 2),
        }
    except Exception:  # pragma: no cover — backend without the API
        return None


def bench_solver(solver, precision="fp32"):
    """Compiled-block mode with device-resident data (the TPU execution
    path), K periods per dispatch. Timing is synced with an actual device
    readback. Returns (median, peak, flops_per_meta_step|None)."""
    import statistics

    sys.path.insert(0, str(Path(__file__).resolve().parent / "examples" / "learning_to_reweight"))
    from main import build_engine, parse_args  # noqa: E402

    from betty_tpu.compile import BlockRunner

    argv = [
        "--train_iters", "0",
        "--batch_size", str(BATCH),
        "--train_size", str(BATCH * 16),
        "--meta_size", str(BATCH * 8),
        "--device_data",
        "--solver", solver,
        "--precision", precision,
    ]
    if solver == "cg":
        argv += ["--cg_iterations", "3", "--cg_alpha", "1.0"]
    if solver == "neumann":
        argv += ["--neumann_iterations", "5", "--neumann_alpha", "0.01"]
    engine = build_engine(parse_args(argv))
    engine.train()
    K = 32
    runner = BlockRunner(engine, scan_periods=K)

    for _ in range(2):  # warmup (compile + first transfers)
        runner.run_block()
    _sync(engine)

    rates = []
    for _ in range(5):
        n_blocks = max(1, META_STEPS_TIMED // K)
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            runner.run_block()
        _sync(engine)
        t1 = time.perf_counter()
        rates.append(n_blocks * K / (t1 - t0))

    # XLA cost analysis counts the K-period lax.scan BODY once, so the raw
    # number already ~equals ONE meta-step's flops (unroll=1 here) — do NOT
    # divide by K (r2's MFU line made that mistake and under-reported ~Kx)
    flops = block_cost_flops(runner, 1)
    return (statistics.median(rates), max(rates), flops,
            hbm_static_analysis(runner))


def bench_handwritten():
    """Hand-written single-purpose JAX MWN meta-step — identical math to the
    framework's darts path (same models/optimizers/shapes, lax.scan over
    K steps, device-resident data), with zero framework machinery. The
    framework's throughput relative to this is the real overhead figure."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from betty_tpu import optim
    from betty_tpu.models import MetaWeightNet, ResNet32

    K = 32
    R = 0.01  # darts_alpha default
    resnet, mwn = ResNet32(10), MetaWeightNet()
    sample = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    vc = resnet.init(jax.random.PRNGKey(0), sample, train=False)
    vm = mwn.init(jax.random.PRNGKey(1), jnp.zeros((BATCH,)), train=False)
    pc, bs = vc["params"], vc.get("batch_stats", {})
    pm = vm["params"]

    tx_c = optim.sgd(lr=0.1, momentum=0.9, weight_decay=5e-4, nesterov=True).tx
    tx_m = optim.adam(lr=1e-5).tx
    oc, om = tx_c.init(pc), tx_m.init(pm)

    rng = np.random.RandomState(0)
    x_tr = jax.device_put(rng.randn(BATCH * 16, 32, 32, 3).astype(np.float32))
    y_tr = jax.device_put(rng.randint(0, 10, BATCH * 16).astype(np.int32))
    x_me = jax.device_put(rng.randn(BATCH * 8, 32, 32, 3).astype(np.float32))
    y_me = jax.device_put(rng.randint(0, 10, BATCH * 8).astype(np.int32))

    def ce_vec(logits, y):
        return optax.softmax_cross_entropy_with_integer_labels(logits, y)

    def meta_step(carry, idx):
        pc, bs, oc, pm, om = carry
        tr_idx, me_idx = idx
        xb, yb = x_tr[tr_idx], y_tr[tr_idx]

        def inner_loss(pc_, pm_):
            logits, mut = resnet.apply(
                {"params": pc_, "batch_stats": bs}, xb, train=True,
                mutable=["batch_stats"],
            )
            ce = ce_vec(logits, yb)
            w = mwn.apply({"params": pm_}, jax.lax.stop_gradient(ce), train=True)
            return jnp.mean(w * ce), mut["batch_stats"]

        (loss, new_bs), gc = jax.value_and_grad(inner_loss, has_aux=True)(pc, pm)
        upd, oc = tx_c.update(gc, oc, pc)
        pc = jax.tree_util.tree_map(lambda p, u: p + u, pc, upd)

        # outer (darts): v = d meta_loss / d pc, central difference for pm
        xm, ym = x_me[me_idx], y_me[me_idx]

        def meta_loss(pc_):
            logits, _ = resnet.apply(
                {"params": pc_, "batch_stats": new_bs}, xm, train=True,
                mutable=["batch_stats"],  # train-mode fwd; stats discarded
            )
            return ce_vec(logits, ym).mean()

        v = jax.grad(meta_loss)(pc)
        vnorm = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(v)))
        eps = R / (vnorm + 1e-15)

        def inner_wrt_pm(pm_, pc_):
            logits, _ = resnet.apply(
                {"params": pc_, "batch_stats": bs}, xb, train=True,
                mutable=["batch_stats"],  # perturbed fwd; stats discarded
            )
            ce = ce_vec(logits, yb)
            w = mwn.apply({"params": pm_}, jax.lax.stop_gradient(ce),
                          train=True)
            return jnp.mean(w * ce)

        ax = lambda a, t1, t2: jax.tree_util.tree_map(lambda x, y: x + a * y, t1, t2)
        gp = jax.grad(inner_wrt_pm)(pm, ax(eps, pc, v))
        gn = jax.grad(inner_wrt_pm)(pm, ax(-eps, pc, v))
        hyper = jax.tree_util.tree_map(lambda n, p: (n - p) / (2 * eps), gn, gp)
        updm, om = tx_m.update(hyper, om, pm)
        pm = jax.tree_util.tree_map(lambda p, u: p + u, pm, updm)
        return (pc, new_bs, oc, pm, om), loss

    @jax.jit
    def run_k(carry, idxs):
        return jax.lax.scan(meta_step, carry, idxs)

    ridx = np.random.RandomState(1)
    def idxs():
        return (
            jnp.asarray(ridx.randint(0, BATCH * 16, (K, BATCH)), jnp.int32),
            jnp.asarray(ridx.randint(0, BATCH * 8, (K, BATCH)), jnp.int32),
        )

    carry = (pc, bs, oc, pm, om)
    carry, _ = run_k(carry, idxs())  # compile
    device_sync(carry)

    rates = []
    for _ in range(5):
        n_blocks = max(1, META_STEPS_TIMED // K)
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            carry, _ = run_k(carry, idxs())
        device_sync(carry)
        t1 = time.perf_counter()
        rates.append(n_blocks * K / (t1 - t0))
    return max(rates)  # best window: least contention-contaminated


def bench_wallclock_to_acc(target_acc=0.9, max_iters=3000, check_every=50,
                           cifar_target_acc=0.85):
    """Wall-clock (incl. compile) to reach target clean-test accuracy on a
    reweighting-under-40%-label-noise workload, cg solver (BASELINE.md's
    named metric). DATA: synthetic separable features by default (this
    environment has no dataset egress) — the JSON labels it so. Setting
    ``BETTY_CIFAR_NPZ=/path/to/cifar.npz`` (x_train/y_train/x_test/y_test
    image arrays) switches to the real-CIFAR form of the metric with a
    ResNet-32 classifier."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
    from betty_tpu.compile import BlockRunner
    from betty_tpu.data import ArrayLoader
    from betty_tpu.models import MLP, MetaWeightNet
    from betty_tpu.module import from_flax

    DIM, N = 32, 2048
    rng = np.random.RandomState(0)

    cifar = os.environ.get("BETTY_CIFAR_NPZ")
    if cifar and os.path.exists(cifar):
        # the CIFAR form has its own explicit gate (ResNet-32 under 40%
        # uniform noise plateaus below the synthetic task's 0.9 within a
        # bounded-iteration bench) — not the synthetic target_acc
        return _bench_wallclock_cifar(cifar, target_acc=cifar_target_acc,
                                      max_iters=max_iters,
                                      check_every=check_every)

    def make_clean(n, seed):
        r = np.random.RandomState(seed)
        y = r.randint(0, 2, n)
        protos = np.stack([np.ones(DIM), -np.ones(DIM)])
        x = (protos[y] * 0.4 + r.randn(n, DIM)).astype(np.float32)
        return x, y.astype(np.int32)

    x_tr, y_tr = make_clean(N, 0)
    flips = rng.rand(N) < 0.4
    y_tr = np.where(flips, 1 - y_tr, y_tr).astype(np.int32)
    x_me, y_me = make_clean(256, 1)
    x_te, y_te = make_clean(2048, 2)

    class RW(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            logits = self.classifier(x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    class Clf(ImplicitProblem):
        def training_step(self, batch):
            x, y = batch
            logits = self.module(x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            w = self.rw(jax.lax.stop_gradient(ce))
            return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-6)

    t_start = time.perf_counter()
    clf = Clf("classifier",
              module=from_flax(MLP(features=[128, 64, 2]), jnp.zeros((128, DIM)),
                               rng=jax.random.PRNGKey(0)),
              optimizer=optim.sgd(lr=0.01, momentum=0.9),
              train_data_loader=ArrayLoader(x_tr, y_tr, batch_size=128,
                                            device=True),
              config=Config(type="cg", cg_iterations=3, cg_alpha=1.0))
    rw = RW("rw",
            module=from_flax(MetaWeightNet(), jnp.zeros((128,)),
                             rng=jax.random.PRNGKey(1), train_kwarg="train"),
            optimizer=optim.adam(lr=3e-3),
            train_data_loader=ArrayLoader(x_me, y_me, batch_size=128, seed=1,
                                          device=True),
            config=Config())
    engine = Engine(config=EngineConfig(train_iters=max_iters),
                    problems=[rw, clf],
                    dependencies={"u2l": {rw: [clf]}, "l2u": {clf: [rw]}})
    engine.train()
    runner = BlockRunner(engine, scan_periods=check_every)

    x_te_d, y_te_d = jnp.asarray(x_te), np.asarray(y_te)

    def acc():
        logits = clf.module_fn.apply_fn(
            {"params": engine.states["classifier"]["params"],
             **engine.states["classifier"]["extra"]}, x_te_d
        )
        return float((np.asarray(logits).argmax(1) == y_te_d).mean())

    steps = 0
    reached = None
    while steps < max_iters:
        runner.run_block()
        steps += check_every
        if acc() >= target_acc:
            reached = steps
            break
    seconds = time.perf_counter() - t_start
    return {
        "target_acc": target_acc,
        "seconds": round(seconds, 2),
        "meta_steps": reached if reached is not None else -1,
        "final_acc": round(acc(), 4),
        "solver": "cg",
        "includes_compile": True,
        "data": "synthetic-separable (no dataset egress here; set "
                "BETTY_CIFAR_NPZ for the real-CIFAR form)",
    }


def _bench_wallclock_cifar(npz_path, target_acc, max_iters, check_every,
                           extra_argv=()):
    """Real-CIFAR wall-clock-to-accuracy: the learning_to_reweight example
    under 40% label noise with a ResNet-32, via its real-dataset path.
    ``extra_argv`` is appended to the example argv (argparse keeps the last
    occurrence, so tests can shrink batch/meta sizes)."""
    import jax
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent / "examples"
                           / "learning_to_reweight"))
    from main import build_engine, parse_args  # noqa: E402

    from betty_tpu.compile import BlockRunner

    t_start = time.perf_counter()
    args = parse_args([
        "--train_iters", str(max_iters), "--batch_size", "128",
        "--data-dir", npz_path,
        # uniform 40% label noise — the reference README's noisy-label MWN
        # setting (both flags required: type=None makes corrupt_labels a
        # no-op regardless of ratio)
        "--corruption_type", "uniform", "--corruption_ratio", "0.4",
        "--solver", "cg", "--cg_iterations", "3", "--cg_alpha", "1.0",
        "--device_data",
        *extra_argv,
    ])
    engine = build_engine(args)
    engine.train()
    runner = BlockRunner(engine, scan_periods=check_every)
    steps, reached = 0, None
    while steps < max_iters:
        runner.run_block()
        steps += check_every
        stats = engine.validation() or {}
        acc = stats.get("test_acc", stats.get("acc", 0.0)) / 100.0
        if acc >= target_acc:
            reached = steps
            break
    return {
        "target_acc": target_acc,
        "seconds": round(time.perf_counter() - t_start, 2),
        "meta_steps": reached if reached is not None else -1,
        "final_acc": round(acc, 4),
        "solver": "cg",
        "includes_compile": True,
        "data": f"real CIFAR ({npz_path})",
    }


def bench_fused_ops(cg_iterations=10):
    """CG hypergradient on a ~25M-param MLP: fused Pallas vector kernels vs
    pure-XLA tree math (VERDICT r1 #8). TPU only (interpret mode on CPU
    would measure nothing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    if jax.default_backend() != "tpu":
        return None

    from betty_tpu import Config, Engine, EngineConfig, ImplicitProblem, optim
    from betty_tpu.models import MLP
    from betty_tpu.module import from_flax, from_fn

    D, B = 2500, 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, B).astype(np.int32))
    xv = jnp.asarray(rng.randn(B, D).astype(np.float32))
    yv = jnp.asarray(rng.randint(0, 10, B).astype(np.int32))

    class Outer(ImplicitProblem):
        def training_step(self, batch):
            bx, by = batch
            return optax.softmax_cross_entropy_with_integer_labels(
                self.inner(bx), by
            ).mean()

    class Inner(ImplicitProblem):
        def training_step(self, batch):
            bx, by = batch
            logits = self.module(bx)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, by)
            l2 = sum(jnp.sum(p * p)
                     for p in jax.tree_util.tree_leaves(self.params))
            return ce.mean() + 0.5 * self.outer()[0] * l2

    def build(fused):
        outer = Outer("outer", module=from_fn(lambda p: p["w"],
                                              {"w": jnp.full((1,), 1e-4)}),
                      optimizer=optim.sgd(lr=0.1),
                      train_data_loader=[(xv, yv)], config=Config())
        inner = Inner("inner",
                      module=from_flax(MLP(features=[D, D, D, D, 10]),
                                       jnp.zeros((B, D)),
                                       rng=jax.random.PRNGKey(0)),
                      optimizer=optim.sgd(lr=0.01),
                      train_data_loader=[(x, y)],
                      config=Config(type="cg", cg_iterations=cg_iterations,
                                    cg_alpha=1.0,
                                    use_fused_vector_ops=fused))
        engine = Engine(config=EngineConfig(train_iters=1),
                        problems=[outer, inner],
                        dependencies={"u2l": {outer: [inner]},
                                      "l2u": {inner: [outer]}})
        return engine, outer, inner

    def timed(fused):
        """Time the jitted CG hypergradient solve in isolation (the code the
        kernels change); the full outer update adds identical work in both
        modes."""
        from betty_tpu.hypergradient.cg import cg as cg_solver
        from betty_tpu.problems.problem import ctx_replace

        engine, outer, inner = build(fused)
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(engine.states["inner"]["params"]))
        ctx = {n: {"params": s["params"], "extra": s["extra"]}
               for n, s in engine.states.items()}
        rng_key = jax.random.PRNGKey(0)

        def outer_loss(ip):
            c = ctx_replace(ctx, "inner", ip)
            loss, _, _ = outer.eval_loss(c, (xv, yv))
            return loss

        v = jax.grad(outer_loss)(ctx["inner"]["params"])
        solve = jax.jit(
            lambda vec: cg_solver(vec, inner, outer, ctx, engine.states,
                                  (x, y), rng_key)
        )
        r = solve(v)
        device_sync(r)
        t0 = time.perf_counter()
        for _ in range(8):
            r = solve(v)
        device_sync(r)
        return (time.perf_counter() - t0) / 8, n_params

    plain_s, n_params = timed(False)
    fused_s, _ = timed(True)
    return {
        "model_params": n_params,
        "cg_iterations": cg_iterations,
        "plain_ms": round(plain_s * 1e3, 2),
        "fused_ms": round(fused_s * 1e3, 2),
        "speedup": round(plain_s / fused_s, 3),
        "verdict": "xla-wins-in-context" if fused_s > plain_s
                   else "fused-kernels-win",
    }


def bench_flash_attention(B=8, H=16, S=512, D=64):
    """Blockwise Pallas attention vs plain XLA einsum attention at the
    north-star head geometry, seq 512, bf16: fwd and fwd+bwd step times
    (VERDICT r2 #2). TPU only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        return None

    from betty_tpu.ops.flash_attention import (
        flash_attention,
        reference_attention,
    )

    rng = np.random.RandomState(0)

    def mk(_):
        return jnp.asarray(
            rng.randn(B, H, S, D).astype(np.float32)
        ).astype(jnp.bfloat16)

    q, k, v, w = mk(0), mk(1), mk(2), mk(3)

    def timeit(f, *a, n=30):
        r = f(*a)
        device_sync(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        device_sync(r)
        return (time.perf_counter() - t0) / n

    def loss(attn):
        return lambda q, k, v: jnp.sum(
            (attn(q, k, v) * w).astype(jnp.float32))

    f_ref = jax.jit(reference_attention)
    f_fla = jax.jit(flash_attention)
    vg_ref = jax.jit(jax.grad(loss(reference_attention), argnums=(0, 1, 2)))
    vg_fla = jax.jit(jax.grad(loss(flash_attention), argnums=(0, 1, 2)))

    t_ref_f, t_fla_f = timeit(f_ref, q, k, v), timeit(f_fla, q, k, v)
    t_ref_b, t_fla_b = timeit(vg_ref, q, k, v), timeit(vg_fla, q, k, v)
    err = float(jnp.max(jnp.abs(
        f_fla(q, k, v).astype(jnp.float32) -
        f_ref(q, k, v).astype(jnp.float32))))
    speedup = t_ref_b / t_fla_b
    return {
        "shape": f"B{B} H{H} S{S} D{D} bf16",
        "fwd_ms": {"xla": round(t_ref_f * 1e3, 3),
                   "flash": round(t_fla_f * 1e3, 3)},
        "fwd_bwd_ms": {"xla": round(t_ref_b * 1e3, 3),
                       "flash": round(t_fla_b * 1e3, 3)},
        "fwd_speedup": round(t_ref_f / t_fla_f, 3),
        "fwd_bwd_speedup": round(speedup, 3),
        "max_err_vs_xla": float(f"{err:.2e}"),
        "verdict": "flash-wins" if speedup > 1.0 else "xla-wins-in-context",
        # Measured offline (r4 study, r5 refresh; ~12 min Mosaic compiles —
        # too slow for the driver bench): inside the full 355M SAMA
        # meta-program at B4/S512, r4 measured 0.67x regardless of remat
        # treatment; the r5 layout-native q/k/v projections (_HeadProj/
        # _OutProj delete the (B,L,H,D)<->(B,H,L,D) boundary copies)
        # lifted it to 0.74x — plain 2.489/2.404 vs flash 1.812
        # meta-periods/s — with the residual ~26% pinned to the
        # custom-call fusion barrier itself (time-share bound: even a free
        # attention op caps the win at ~1.07x at S512). At S1024 — the
        # regime where plain pays quadratic score re-materialization and
        # flash could structurally win — the late-r5 B2 measurement (both
        # arms minimal remat, both fit at ~11 GiB static) reads plain
        # 1.928 vs flash 1.280 meta-periods/s: the barrier still
        # dominates. Full study: docs/memory.md + flash_attention.py
        # docstring. use_flash stays default-off on the models.
        "in_context_northstar_B4_seq512_speedup_measured_offline": 0.74,
        "in_context_northstar_B2_seq1024_speedup_measured_offline": 0.66,
    }


def transformer_fwd_flops(n_matmul_params, batch, seq, heads, head_dim,
                          layers):
    """Analytic matmul FLOPs of ONE encoder forward: 2*P*T for the dense
    projections plus the two S x S attention matmuls per layer."""
    tokens = batch * seq
    return (2.0 * n_matmul_params * tokens
            + layers * 4.0 * batch * heads * seq * seq * head_dim)


def bench_sama_roberta_large(use_flash=False, K=2, timed_blocks=4,
                             remat=True, remat_policy="full",
                             rng_impl="rbg", batch=32, seq=128):
    """THE north-star scale (BASELINE.md): SAMA data reweighting with a
    RoBERTa-large-sized encoder (355M params, 24L/1024d/16h) on the real
    chip — bf16, unroll 5, compiled-block mode, device-resident data.
    Emits meta-period wall-clock, ANALYTIC-FLOPs MFU over the inner
    transformer computation, XLA-cost-analysis MFU, and the HBM
    high-water mark (VERDICT r2 #1)."""
    import statistics

    import jax

    sys.path.insert(0, str(
        Path(__file__).resolve().parent / "examples" / "bert_data_reweighting"
    ))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bert_bench_ns",
        Path(__file__).resolve().parent / "examples" / "bert_data_reweighting"
        / "main.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bert_bench_ns"] = mod
    spec.loader.exec_module(mod)

    from betty_tpu.compile import BlockRunner

    BATCH_NS, SEQ = batch, seq
    argv = [
        "--model", "large", "--train_iters", "0",
        "--batch_size", str(BATCH_NS), "--seq_len", str(SEQ),
        "--train_size", "512", "--meta_size", "256",
        "--unroll_steps", "5", "--precision", "bf16",
        "--hypergradient", "sama", "--device_data",
        # hardware RngBitGenerator for dropout masks: threefry mask
        # generation is pure VPU arithmetic and profiles at ~17% of block
        # device time at this scale (paid twice per layer: masks are
        # regenerated in the backward under remat). Measured ladder at
        # B32/S128/dots: threefry 1.553 vs rbg 1.989 meta-periods/s (+28%).
        "--rng_impl", rng_impl,
    ]
    if use_flash:
        argv.append("--flash")
    # state donation is unconditional: without it the dispatch holds input
    # AND output copies of the 5.7GB state — required headroom for 355M on
    # a 16GB chip shared with other tenants
    argv.append("--donate")
    if remat:
        argv.append("--remat")
        argv += ["--remat_policy", remat_policy]
    try:
        engine = mod.build_engine(mod.parse_args(argv))
        engine.train()
        runner = BlockRunner(engine, scan_periods=K)
        t0 = time.perf_counter()
        runner.run_block()
        _sync(engine)
    except Exception as e:  # pragma: no cover — shared-chip OOM etc.
        return {"error": f"{type(e).__name__}: {str(e)[:200]}",
                "model": "roberta-large-scale (355M)"}
    compile_s = time.perf_counter() - t0

    rates = []
    for _ in range(timed_blocks):
        t0 = time.perf_counter()
        runner.run_block()
        _sync(engine)
        rates.append(K / (time.perf_counter() - t0))
    med = statistics.median(rates)

    # analytic FLOPs: matmul params = total minus embeddings
    import numpy as np

    params = engine.states["classifier"]["params"]
    emb = sum(
        int(np.prod(x.shape))
        for p, x in jax.tree_util.tree_leaves_with_path(params)
        if "Embed" in str(p) or "pos_embedding" in str(p)
    )
    total = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(params))
    p_mm = total - emb
    f_fwd = transformer_fwd_flops(p_mm, BATCH_NS, SEQ, heads=16, head_dim=64,
                                  layers=24)
    # per meta-period: 5 inner fwd+bwd (3 fwd-units each) + SAMA's meta
    # grad (3) + two perturbed forwards (1 each) = 20 fwd-units.
    # (Algorithmic FLOPs: remat recompute is excluded, per MFU convention.)
    unroll = 5
    f_period = (3 * unroll + 5) * f_fwd
    # NOTE: XLA's cost analysis counts each lax.scan BODY once (not trip-
    # count times), so it under-reports the 5-step inner unroll; reported
    # for transparency, mfu_analytic is the honest number.
    # the K-period lax.scan body is counted ONCE by cost analysis (same
    # rule bench_solver documents) — divide by 1, not K
    xla_flops = block_cost_flops(runner, 1)

    peak, kind = peak_flops()
    out = {
        "model": "roberta-large-scale (355M)",
        "params_total": total,
        "batch": BATCH_NS, "seq_len": SEQ, "unroll_steps": unroll,
        "precision": "bf16", "solver": "sama",
        "use_flash_attention": bool(use_flash),
        "remat": bool(remat), "donate_state": True,
        "remat_policy": remat_policy if remat else None,
        # measured ladder at this shape: r3 under threefry RNG (blanket
        # replay 1.372, dots 1.553, no-remat 1.586 meta-periods/s); re-run
        # under the rbg default late r5: dots 2.039, no-remat 2.075
        # (53.4% MFU) — the ~2% gap is RNG-independent. "dots" stays the
        # default: within ~2% of no-remat while keeping activation HBM
        # bounded (no-remat stops fitting at seq>=512 or larger batch).
        "remat_ladder_measured_meta_periods_per_sec": {
            "full": 1.372, "dots": 1.553, "none": 1.586,
            "dots_rbg": 2.039, "none_rbg": 2.075},
        # dropout-mask PRNG: threefry (JAX default) vs the TPU hardware
        # RngBitGenerator, both at B32/S128/dots remat (chip, r3)
        "rng_impl": rng_impl,
        "rng_ladder_measured_meta_periods_per_sec": {
            "threefry": 1.553, "rbg": 1.989},
        "meta_periods_per_sec_median": round(med, 3),
        "sec_per_meta_period": round(1.0 / med, 4),
        "first_block_incl_compile_s": round(compile_s, 1),
        "analytic_gflops_per_meta_period": round(f_period / 1e9, 1),
        "mfu_analytic": round(f_period * med / peak, 4) if peak else None,
        "xla_cost_gflops_per_meta_period_scan_bodies_once":
            round(xla_flops / 1e9, 1) if xla_flops else None,
    }
    hbm = hbm_peak_bytes()
    if hbm:
        out["hbm_peak_bytes"] = hbm
        out["hbm_peak_gib"] = round(hbm / 2**30, 2)
    hbm_static = hbm_static_analysis(runner)
    if hbm_static:
        out["hbm_static_analysis"] = hbm_static
    return out


def bench_sama_transformer(batch=32):
    """North-star shape at single-chip scale (BASELINE.md: SAMA RoBERTa
    reweighting): the bert_data_reweighting example's encoder (~17M params,
    seq 128, batch 32, unroll 5, bf16, SAMA) in compiled-block mode with
    device-resident data. Reported as meta-periods/s (one period = 5 inner
    transformer fwd+bwd steps + the SAMA hypergradient + both updates).

    ``batch`` parameterizes the MFU ladder (VERDICT r3 weak #5: name what
    binds the small-model MFU): at dim 256 the per-layer matmuls are
    (B*128, 256)x(256, 256..1024) — far below MXU-saturating shapes, so
    MFU should climb with batch if the binding resource is matmul size
    (and flatten if HBM- or dispatch-bound).

    r5 diagnosis of the B128->B512 MFU inversion (VERDICT r4 weak #5,
    36%->25%): reproduced (33.6%->25.1% in the r5 run), and pinned OUTSIDE
    the framework — a bare hand-written jit(value_and_grad) of the same
    4L/dim-256 encoder measures 22.0% MFU at B128 and 18.9% at B512
    (-14% relative), so XLA's program for this model gets less efficient
    at B512 regardless of the meta-machinery. Dropout-mask generation is
    not the binder (disabling dropout recovers ~1pt at B512, ~2pt at
    B128); the SAMA meta step is the LESS efficient phase (unroll=1,
    which weights it more, drops B512 to 21.6%) but is batch-independent.
    At dim 256 the per-token compute is tiny relative to activation HBM
    traffic (arithmetic intensity ~dim), and B512's larger activation
    working set (1.3GB live in the backward) pushes the program from
    cache-friendly tiles into streaming HBM — a model-shape property, not
    a framework one; the 355M/dim-1024 north-star climbs with batch as
    expected. The ladder row is annotated rather than 'fixed'."""
    import statistics

    sys.path.insert(0, str(
        Path(__file__).resolve().parent / "examples" / "bert_data_reweighting"
    ))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bert_bench",
        Path(__file__).resolve().parent / "examples" / "bert_data_reweighting"
        / "main.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bert_bench"] = mod
    spec.loader.exec_module(mod)

    from betty_tpu.compile import BlockRunner

    args = mod.parse_args([
        "--train_iters", "0", "--batch_size", str(batch), "--seq_len", "128",
        "--train_size", str(max(1024, 4 * batch)), "--meta_size",
        str(max(256, 2 * batch)),
        "--unroll_steps", "5", "--precision", "bf16",
        "--hypergradient", "sama", "--device_data",
        # hardware RNG for dropout masks (EngineConfig.rng_impl): measured
        # 62.1 (threefry) vs 89.9 (rbg) meta-periods/s on this row (chip,
        # r3) — the 17M model's mask generation is relatively even more
        # expensive than at 355M scale
        "--rng_impl", "rbg",
    ])
    engine = mod.build_engine(args)
    engine.train()
    K = 8
    runner = BlockRunner(engine, scan_periods=K)
    for _ in range(2):
        runner.run_block()
    _sync(engine)

    rates = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(4):
            runner.run_block()
        _sync(engine)
        rates.append(4 * K / (time.perf_counter() - t0))
    med = statistics.median(rates)
    out = {
        "batch": batch,
        "meta_periods_per_sec_median": round(med, 3),
        "meta_periods_per_sec_peak": round(max(rates), 3),
        "unroll_steps": 5,
        "precision": "bf16",
        "rng_impl": "rbg",
        "rng_ladder_measured_meta_periods_per_sec": {
            "threefry": 62.1, "rbg": 89.9},
        "solver": "sama",
    }
    # analytic MFU (XLA cost analysis counts scan bodies once — useless
    # for a 5-step unroll): same 20-fwd-unit accounting as the 355M entry
    import jax
    import numpy as np

    params = engine.states["classifier"]["params"]
    emb = sum(
        int(np.prod(x.shape))
        for p, x in jax.tree_util.tree_leaves_with_path(params)
        if "Embed" in str(p) or "pos_embedding" in str(p)
    )
    total = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(params))
    f_fwd = transformer_fwd_flops(total - emb, batch, 128, heads=8,
                                  head_dim=32, layers=4)
    f_period = 20 * f_fwd
    peak, _ = peak_flops()
    out["analytic_gflops_per_meta_period"] = round(f_period / 1e9, 1)
    if peak:
        out["mfu_analytic"] = round(f_period * med / peak, 4)
    hbm = hbm_peak_bytes()
    if hbm:
        out["hbm_peak_bytes"] = hbm
    hbm_static = hbm_static_analysis(runner)
    if hbm_static:
        out["hbm_static_analysis"] = hbm_static
    return out


def bench_imagenet_pruning(batch=64, image=256, crop=224, timed=6):
    """ImageNet-scale execution of the pruning example (VERDICT r3 missing
    #3): ResNet-50 (stages 3-4-6-3, width 64, 1000 classes) at 224^2 with
    the device-side RandomResizedCrop/flip/normalize pipeline
    (betty_tpu/data/augment.py), EMA teacher, bilevel reweighting (darts),
    bf16, synthetic data at a realistic per-chip batch. Reference
    counterpart: examples/imagenet_pruning/README.md:10-24 (4-GPU DDP
    ResNet-50).

    r5 structural accounting (VERDICT r4 weak #1): the r4 row (0.28
    steps/s, 0.4% MFU) ran driver mode with per-step HOST batches — ~100MB
    of images per meta-step through the tunneled runtime; it measured the
    transfer. With device-resident data + compiled blocks the same
    workload runs 6.87 meta-steps/s (440 img/s, 10.1% MFU) at B64 and
    4.03 steps/s (516 img/s, 11.8% MFU) at B128 — a 24.5x recovery. The
    remaining gap to the 20% aspiration is NOT framework overhead: a
    bare hand-written jit(value_and_grad) ResNet-50 fwd+bwd (no bilevel,
    no teacher, no augment) measures 14.2% MFU at B64 (fwd alone 19.3%)
    on this chip — XLA's conv backward efficiency on v5e at these batches
    is the ceiling, and the full bilevel meta-step (student fwd+bwd +
    teacher fwd + darts' two perturbed fwds + EMA, 11 fwd-units) runs at
    ~83% of that ceiling. Device-side augmentation costs ~4% (10.5% MFU
    without it at B64/224^2).
    """
    import statistics

    import importlib.util

    import jax

    spec = importlib.util.spec_from_file_location(
        "imagenet_bench",
        Path(__file__).resolve().parent / "examples" / "imagenet_pruning"
        / "main.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["imagenet_bench"] = mod
    spec.loader.exec_module(mod)

    args = type("A", (), dict(
        batch_size=batch, image_size=image, num_classes=1000, width=64,
        stages=[3, 4, 6, 3], lr=0.1, gas=1, ema_decay=0.999,
        train_size=max(4 * batch, 256), meta_size=max(2 * batch, 128),
        train_iters=0, valid_step=10 ** 9, strategy="default",
        precision="bf16", log_step=-1, data_dir=None, augment="device",
        crop_size=crop, device_data=True,
    ))()
    # r4's 0.28-steps/s row ran driver mode with HOST batches: each
    # meta-step shipped ~100 MB (train+meta, 64x256^2x3 f32) through a
    # tunnel this repo measured at ~MB/s bulk rate — it timed the
    # transfer, not ResNet-50 (VERDICT r4 weak #1). Now: on-device
    # synthetic data, device-gather batches, compiled blocks.
    mode = "compiled_blocks"
    try:
        engine = mod.build_engine(args)
        engine.train()
        from betty_tpu.compile import BlockRunner

        K = 8
        t0 = time.perf_counter()
        try:
            runner = BlockRunner(engine, scan_periods=K)
            runner.run_block()
            _sync(engine)
            compile_s = time.perf_counter() - t0
            rates = []
            for _ in range(timed):
                t0 = time.perf_counter()
                runner.run_block()
                _sync(engine)
                rates.append(K / (time.perf_counter() - t0))
        except Exception as block_err:
            # driver mode (device-resident data still avoids the per-step
            # bulk transfer); the block failure is recorded. Reset the
            # timer: compile_s must measure the DRIVER first step, not the
            # seconds the failed block attempt burned before raising.
            mode = f"driver (block path failed: {type(block_err).__name__})"
            t0 = time.perf_counter()
            engine.train_step()
            _sync(engine)
            compile_s = time.perf_counter() - t0
            rates = []
            for _ in range(timed):
                t0 = time.perf_counter()
                engine.train_step()
                _sync(engine)
                rates.append(1.0 / (time.perf_counter() - t0))
    except Exception as e:  # pragma: no cover — shared-chip OOM etc.
        return {"error": f"{type(e).__name__}: {str(e)[:200]}",
                "model": "resnet50-224"}
    med = statistics.median(rates)

    import numpy as np

    total = sum(int(np.prod(x.shape)) for x in
                jax.tree_util.tree_leaves(engine.states["classifier"]["params"]))
    # analytic: ResNet-50 fwd at 224^2 = 4.09 GFLOPs/image (the standard
    # 2*MACs number at this config). fwd-units per meta-step (darts,
    # unroll 1, gas 1): student fwd+bwd (3) + EMA-teacher fwd (1) on the
    # train batch; hypergradient = direct grad fwd+bwd (3) + two perturbed
    # loss evals (student+teacher fwd = 2 each -> 4) = 11 units.
    f_fwd_img = 4.09e9
    f_step = 11.0 * batch * f_fwd_img
    peak, _ = peak_flops()
    out = {
        "model": "resnet50-224 (device-side RandomResizedCrop, EMA teacher)",
        "params_total": total,
        "batch": batch, "image_size": image, "crop_size": crop,
        "precision": "bf16", "solver": "darts", "unroll_steps": 1,
        "meta_steps_per_sec_median": round(med, 3),
        "images_per_sec_inner": round(med * batch, 1),
        "first_step_incl_compile_s": round(compile_s, 1),
        "execution_mode": mode,
        "data": "device-resident (r4 row measured host->device transfer)",
        "analytic_gflops_per_meta_step": round(f_step / 1e9, 1),
        "mfu_analytic": round(f_step * med / peak, 4) if peak else None,
    }
    hbm = hbm_peak_bytes()
    if hbm:
        out["hbm_peak_bytes"] = hbm
        out["hbm_peak_gib"] = round(hbm / 2**30, 2)
    return out


def bench_reference():
    """Time the reference torch implementation on identical shapes (CPU).
    Cached across runs; returns None if unavailable."""
    if CACHE.exists():
        try:
            return json.loads(CACHE.read_text())["ref_steps_per_sec"]
        except Exception:
            pass
    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        return None
    try:
        steps_per_sec = _run_reference(ref_root)
    except Exception as e:  # pragma: no cover
        print(f"# reference bench failed: {e!r}", file=sys.stderr)
        return None
    CACHE.write_text(json.dumps({"ref_steps_per_sec": steps_per_sec}))
    return steps_per_sec


def _run_reference(ref_root):
    import subprocess

    script = Path(__file__).resolve().parent / "bench_reference_impl.py"
    out = subprocess.run(
        [sys.executable, str(script), ref_root, str(BATCH)],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-500:])
    return float(out.stdout.strip().splitlines()[-1])


def setup_compile_cache():
    """Persistent XLA compilation cache: the MWN block compiles in ~8 min
    cold on v5e (double-backward convs x 32-period scan); warm runs load it
    from disk in seconds. Uses the SAME directory as EngineConfig's "auto"
    default (~/.cache/betty_tpu/xla) — engines built by the bench would
    otherwise redirect the cache there mid-run. Returns whether the cache
    was already populated (recorded in the JSON so wall-clock-including-
    compile numbers are interpretable)."""
    import jax

    cache = Path(os.path.expanduser("~/.cache/betty_tpu/xla"))
    cache.mkdir(parents=True, exist_ok=True)
    warm = any(cache.iterdir())
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return warm


def chip_available(timeout_s=240):
    """Probe the accelerator in a SUBPROCESS with a hard timeout. When the
    tunneled TPU is unreachable, in-process backend initialization HANGS
    for many minutes (measured: >580s) rather than failing — so the probe
    must be killable. Respects an explicit JAX_PLATFORMS=cpu (CPU "chip"
    counts as available for CI runs of the bench)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert len(jax.devices()) > 0"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _section(fn, *a, **k):
    """Fail-soft benchmark section: the driver runs bench.py unattended at
    round end, and the tunneled TPU backend has been observed UNAVAILABLE
    for hours at a stretch — one dead section (or a dead chip) must still
    yield the single JSON line, with the failure recorded in place."""
    import gc
    import traceback

    # engines hold reference cycles (engine <-> problems); without an
    # explicit collect the PREVIOUS section's device state (5.3GB at the
    # north-star scale) survives into this one and OOMs the shared chip —
    # observed: flash@B8/S512 fits solo (13.6GiB peak) but RESOURCE_
    # EXHAUSTEDs whenever it runs after the plain engine in-process.
    gc.collect()
    try:
        return fn(*a, **k)
    except BaseException as e:  # noqa: BLE001 — record and continue
        traceback.print_exc()
        return {"error": f"{type(e).__name__}: {str(e)[:200]}"}


def main():
    if not chip_available():
        # Emit the one JSON line with the failure recorded instead of
        # hanging the driver: in-process jax init blocks indefinitely when
        # the tunneled backend is down.
        print(json.dumps({
            "metric": "mwn_meta_steps_per_sec",
            "value": None,
            "unit": "steps/s",
            "vs_baseline": None,
            "error": "accelerator backend unavailable (device probe "
                     "timed out); see bench.py chip_available()",
        }))
        return
    cache_warm = setup_compile_cache()
    try:
        peak_hw, kind = peak_flops()
    except Exception as e:
        peak_hw, kind = None, f"unavailable: {type(e).__name__}"
    # previous round's committed detail: per-row regression tracking (the
    # r4 CG row regressed 2x purely from shared-chip contention during the
    # end-of-round window and nothing caught it — see PARITY.md "r4 CG
    # regression post-mortem")
    prev = {}
    try:
        prev = json.loads(
            (Path(__file__).resolve().parent / "BENCH_DETAIL.json")
            .read_text())
    except Exception:
        pass
    prev_solvers = prev.get("solvers", {}) if isinstance(prev, dict) else {}
    solvers = {}
    flops_per_step = None
    for solver in ("darts", "cg", "neumann"):
        res = _section(bench_solver, solver)
        if isinstance(res, dict):  # error
            solvers[solver] = res
            continue
        med, peak, flops, hbm_static = res
        rerun_note = None
        prev_med = (prev_solvers.get(solver) or {}).get("median")
        if prev_med and med < 0.75 * prev_med:
            # >25% below last round's committed median: re-measure once —
            # distinguishes a real regression (reproduces) from transient
            # chip contention (recovers); both numbers are recorded
            res2 = _section(bench_solver, solver)
            if isinstance(res2, dict):
                # rerun itself errored: keep the first measurement, but
                # record that a rerun was attempted and how it failed
                rerun_note = {"first_median": round(med, 3),
                              "prev_round_median": prev_med,
                              "rerun_error": res2.get("error", "unknown")}
            elif res2[0] > med:
                med2, peak2, flops2, hbm2 = res2
                rerun_note = {"first_median": round(med, 3),
                              "prev_round_median": prev_med,
                              "verdict": "recovered (contention)"}
                med, peak = med2, max(peak, peak2)
                flops, hbm_static = flops2 or flops, hbm2 or hbm_static
            else:
                # the slowdown reproduced: a real regression — record the
                # confirming second number alongside the kept first
                rerun_note = {"rerun_median": round(res2[0], 3),
                              "prev_round_median": prev_med,
                              "verdict": "reproduced (real regression)"}
        row = {"median": round(med, 3), "peak": round(peak, 3)}
        if prev_med:
            row["delta_vs_prev_pct"] = round(100 * (med / prev_med - 1), 1)
        if rerun_note:
            row["contention_rerun"] = rerun_note
        if flops:
            row["gflops_per_meta_step"] = round(flops / 1e9, 3)
            if peak_hw:
                row["mfu"] = round(flops * med / peak_hw, 5)
        hbm = hbm_peak_bytes()
        if hbm:
            row["hbm_peak_bytes"] = hbm  # process high-water so far
        if hbm_static:
            row["hbm_static_analysis"] = hbm_static
        solvers[solver] = row
        if solver == "darts" and flops:
            flops_per_step = flops
    darts_ok = "median" in solvers.get("darts", {})
    # bf16 inner steps + fp32 hypergradients (the default solver_precision
    # policy). Early rounds measured ~15% over fp32 here; after the r2
    # fast-path recovery the fp32 row caught up and the two now measure
    # within noise of each other (r5: 278.1 vs 276.7 steps/s) — this tiny
    # ResNet-32/B128 block is dispatch/HBM-bound, not MXU-bound, so the
    # bf16 row is tracked as a regression canary rather than a speedup.
    res = _section(bench_solver, "darts", precision="bf16")
    if isinstance(res, dict):
        solvers["darts_bf16"] = res
    else:
        med, peak, flops, _ = res
        solvers["darts_bf16"] = {"median": round(med, 3),
                                 "peak": round(peak, 3)}
        if flops and peak_hw:
            solvers["darts_bf16"]["mfu"] = round(flops * med / peak_hw, 5)

    # two passes against shared-chip contention: a single pass can land
    # entirely in a noisy window and make the overhead figure meaningless
    handwritten, overhead_pct = None, None
    if darts_ok:
        hw1 = _section(bench_handwritten)
        hw2 = _section(bench_handwritten)
        cands = [h for h in (hw1, hw2) if isinstance(h, float)]
        if cands:
            handwritten = max(cands)
            overhead_pct = 100.0 * (
                1.0 - solvers["darts"]["peak"] / handwritten)

    mfu = None
    if darts_ok and flops_per_step and peak_hw:
        mfu = flops_per_step * solvers["darts"]["median"] / peak_hw

    wallclock = _section(bench_wallclock_to_acc)
    fused = _section(bench_fused_ops)
    flash = _section(bench_flash_attention)
    sama_tfm = _section(bench_sama_transformer)
    # MFU ladder for the small-model regime (VERDICT r3 weak #5): does MFU
    # climb with batch (matmul-size-bound) or flatten (HBM/dispatch-bound)?
    sama_tfm_ladder = {}
    if isinstance(sama_tfm, dict) and "error" not in sama_tfm:
        sama_tfm_ladder[32] = {
            "meta_periods_per_sec": sama_tfm.get(
                "meta_periods_per_sec_median"),
            "mfu_analytic": sama_tfm.get("mfu_analytic"),
        }
        for b in (128, 512):
            r = _section(bench_sama_transformer, batch=b)
            sama_tfm_ladder[b] = (
                {"meta_periods_per_sec": r.get("meta_periods_per_sec_median"),
                 "mfu_analytic": r.get("mfu_analytic")}
                if isinstance(r, dict) else {"error": str(r)[:120]}
            )
        # r5 diagnosis (VERDICT r4 weak #5): the B512 MFU drop reproduces
        # in a BARE jit(value_and_grad) of the same encoder (22.0% at B128
        # -> 18.9% at B512), dropout ruled out — an XLA/model-shape
        # property at dim 256, not framework overhead; see
        # bench_sama_transformer.__doc__
        sama_tfm_ladder["b512_mfu_drop_cause"] = (
            "reproduces in bare fwd+bwd (0.220->0.189 MFU); "
            "activation-HBM-bound at dim 256; not framework overhead")
    northstar = _section(bench_sama_roberta_large, remat_policy="dots")
    imagenet = _section(bench_imagenet_pruning)
    ref = _section(bench_reference)
    if not isinstance(ref, (int, float)):
        ref = None
    # None (not 1.0) when the reference could not run: a silent default of
    # parity would be indistinguishable from a measured 1.0x
    vs = (solvers["darts"]["median"] / ref) if (ref and darts_ok) else None

    detail = {
        "metric": "mwn_meta_steps_per_sec",
        "value": solvers["darts"].get("median"),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "solvers": solvers,
        "handwritten_jax_peak_steps_per_sec":
            round(handwritten, 3) if handwritten else None,
        # peak-vs-peak: both sides' best windows (shared-chip contention
        # makes window-matched medians incomparable across the two programs)
        "framework_overhead_pct":
            round(overhead_pct, 2) if overhead_pct is not None else None,
        "model_gflops_per_meta_step":
            round(flops_per_step / 1e9, 3) if flops_per_step else None,
        "mfu_vs_bf16_peak": round(mfu, 5) if mfu is not None else None,
        "device_kind": kind,
        "precision": "fp32",
        "wallclock_to_acc": wallclock,
        "compile_cache_warm_at_start": cache_warm,
        "fused_vector_ops": fused,
        "flash_attention": flash,
        "sama_transformer": sama_tfm,
        "sama_transformer_batch_ladder": sama_tfm_ladder,
        "sama_roberta_large": northstar,
        "imagenet_pruning": imagenet,
        "note": "vs_baseline is TPU-vs-reference-on-host-CPU (reference "
                "publishes no throughput numbers); not hardware-normalized. "
                "median = sustained, peak = best window on the shared chip.",
    }
    # Full record to a committed file; stdout's FINAL line stays compact —
    # the driver's tail capture is ~2000 chars, and r3's grown line was
    # truncated into an unparseable record (VERDICT r3 weak #2).
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    try:
        detail_path.write_text(json.dumps(detail, indent=1) + "\n")
        print(f"# full detail written to {detail_path}")
    except OSError as e:
        print(f"# could not write detail file: {e!r}", file=sys.stderr)

    def _num(x, nd=3):
        return round(x, nd) if isinstance(x, (int, float)) else None

    ns = northstar if isinstance(northstar, dict) else {}
    # static HBM bound for the summary line (VERDICT r4 weak #6: the
    # detail carried it, the summary printed null)
    if "hbm_peak_gib" not in ns and isinstance(
            ns.get("hbm_static_analysis"), dict):
        ns["hbm_peak_gib"] = ns["hbm_static_analysis"].get("upper_bound_gib")

    def _delta(cur, prev_val):
        if isinstance(cur, (int, float)) and prev_val:
            return round(100 * (cur / prev_val - 1), 1)
        return None

    prev_ns = prev.get("sama_roberta_large", {}) if isinstance(prev, dict) \
        else {}
    deltas_vs_prev = {
        s: solvers.get(s, {}).get("delta_vs_prev_pct")
        for s in ("darts", "cg", "neumann")
    }
    deltas_vs_prev["northstar_355m"] = _delta(
        ns.get("meta_periods_per_sec_median"),
        prev_ns.get("meta_periods_per_sec_median")
        if isinstance(prev_ns, dict) else None)
    compact = {
        "metric": "mwn_meta_steps_per_sec",
        "value": solvers["darts"].get("median"),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "solver_medians": {
            s: solvers.get(s, {}).get("median")
            for s in ("darts", "cg", "neumann", "darts_bf16")
        },
        "mwn_mfu": round(mfu, 4) if mfu is not None else None,
        "northstar_355m": {
            "meta_periods_per_sec": _num(
                ns.get("meta_periods_per_sec_median")),
            "mfu_analytic": _num(ns.get("mfu_analytic"), 4),
            "hbm_peak_gib": _num(ns.get("hbm_peak_gib"), 2),
        },
        "sama_transformer_meta_periods_per_sec": _num(
            sama_tfm.get("meta_periods_per_sec_median")
            if isinstance(sama_tfm, dict) else None),
        "imagenet_r50_224_meta_steps_per_sec": _num(
            imagenet.get("meta_steps_per_sec_median")
            if isinstance(imagenet, dict) else None),
        "deltas_vs_prev_pct": deltas_vs_prev,
        "device_kind": kind,
        "errors": sorted(
            k for k, v in detail.items()
            if isinstance(v, dict) and "error" in v
        ) + sorted(
            s for s, v in solvers.items()
            if isinstance(v, dict) and "error" in v
        ),
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # hard guard: never outgrow the capture window
        line = json.dumps({
            "metric": "mwn_meta_steps_per_sec",
            "value": solvers["darts"].get("median"),
            "unit": "steps/s",
            "vs_baseline": round(vs, 3) if vs is not None else None,
            "detail": "BENCH_DETAIL.json",
        })
    print(line)


if __name__ == "__main__":
    main()
