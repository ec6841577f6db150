"""Engine — dependency-graph compiler and training-loop driver.

Counterpart of reference ``betty/engine.py``. The graph mechanics
(``find_paths`` DFS, leaf detection, name-attribute injection, the
step recursion driven from leaves) keep the reference's exact semantics
(``engine.py:217-328``); the systems layer is TPU-native:

* ``configure_systems`` builds a ``jax.sharding.Mesh`` instead of a NCCL
  process group; strategies map to sharding layouts (see
  ``betty_tpu/parallel/mesh.py``) and one process drives all local devices.
* States live in ``engine.states`` (name -> pytree); problems' jitted update
  functions consume and produce this dict, so the whole multilevel program
  is a chain of compiled XLA programs (and can be fused into one; see
  ``compile_blocks``).
"""

import time
from typing import Dict, List, Optional

import jax

from betty_tpu.configs import EngineConfig
from betty_tpu.logging import logger
from betty_tpu.misc.early_stopping import EarlyStopping
from betty_tpu.parallel import (
    batch_sharding,
    make_mesh,
    maybe_init_distributed,
    shard_state,
)
from betty_tpu.utils import log_from_loss_dict


class Engine:
    def __init__(self, problems, config=None, dependencies=None, env=None):
        self.config = config if config is not None else EngineConfig()

        self.train_iters = 0
        self.valid_step = 0
        self.global_step = 0

        self.logger_type = None
        self.logger = None

        self.problems = problems
        self.leaves: List = []
        self.dependencies = dependencies
        self.env = env

        # distributed
        self._strategy = None
        self.mesh = None
        self._batch_sharding = None

        self.early_stopping: Optional[EarlyStopping] = None
        self._roll_back = False

        # state store: problem name -> state pytree
        self.states: Dict[str, dict] = {}

        self.initialize()

    # ------------------------------------------------------------------
    def parse_config(self):
        self.train_iters = self.config.train_iters
        self.valid_step = self.config.valid_step
        self.logger_type = self.config.logger_type
        self._roll_back = self.config.roll_back
        self._strategy = self.config.strategy
        if self.config.early_stopping:
            self.early_stopping = EarlyStopping(
                metric=self.config.early_stopping_metric,
                mode=self.config.early_stopping_mode,
                tolerance=self.config.early_stopping_tolerance,
            )

    def configure_systems(self):
        """Build the device mesh for the configured strategy
        (TPU-native replacement of reference ``engine.py:166-199``).
        Multi-process clusters (TPU pod slices, the 2-process CPU test) are
        joined first; the mesh then spans all processes' devices and one
        controller program drives them (SURVEY.md §5.8)."""
        maybe_init_distributed()
        if self.config.rng_impl != "threefry":
            # must precede every PRNGKey creation below (problem init_state,
            # trace rngs): jax.random.PRNGKey reads this process-global flag
            jax.config.update("jax_default_prng_impl", self.config.rng_impl)
        if self.config.compile_cache_dir:
            # persistent XLA compilation cache: recompiles after restart
            # (auto_resume elasticity, repeated runs) become disk reads
            import os

            cache_dir = self.config.compile_cache_dir
            if cache_dir == "auto":
                # XLA:CPU AOT cache entries are machine-feature-sensitive
                # (cross-process reuse can load executables compiled for a
                # different feature set and hang/SIGILL — observed on this
                # host); auto-caching engages only for accelerator backends,
                # where reuse is keyed safely. Explicit dirs always apply.
                if jax.default_backend() == "cpu":
                    cache_dir = None
                else:
                    cache_dir = os.path.expanduser("~/.cache/betty_tpu/xla")
            if cache_dir is not None:
                try:
                    os.makedirs(cache_dir, exist_ok=True)
                    jax.config.update("jax_compilation_cache_dir", cache_dir)
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", 1.0
                    )
                except OSError:
                    if self.config.compile_cache_dir != "auto":
                        raise  # explicit dir must work; auto degrades silently
        strategy = self._strategy
        if strategy in ("distributed", "dp", "zero", "fsdp", "tp", "pp",
                        "ep", "sp") or (
            self.config.mesh_shape is not None
        ):
            self.mesh = make_mesh(self.config.mesh_shape)
            # batch rides the dp axis; meshes without one (pure model-
            # parallel layouts) replicate the batch
            axis = "dp" if "dp" in self.mesh.shape else None
            self._batch_sharding = (
                batch_sharding(self.mesh) if axis else
                jax.sharding.NamedSharding(self.mesh,
                                           jax.sharding.PartitionSpec())
            )
        else:
            self.mesh = None
            self._batch_sharding = None

    # ------------------------------------------------------------------
    def initialize(self):
        self.parse_config()
        self.configure_systems()

        self.logger = logger(logger_type=self.logger_type)
        if self.is_rank_zero():
            self.logger.info("Initializing Multilevel Optimization...")
        start = time.time()

        self.parse_dependency()

        for problem in self.problems:
            self.set_problem_attr(problem)

        if self.env is not None:
            self.env.engine = self
            self.env.configure_device(self._batch_sharding)
            self.env.initialize()

        for i, problem in enumerate(self.problems):
            problem.add_logger(self.logger)
            problem.device_sharding = self._batch_sharding
            if len(problem.parents) > 0:
                problem._roll_back = self._roll_back
            if self.env is not None:
                problem.add_env(self.env)
            problem.initialize(self)
            state = problem.init_state(jax.random.PRNGKey(i))
            if self.mesh is not None:
                strategy = self._strategy
                if strategy in ("default",):
                    strategy = "dp"
                state = shard_state(state, self.mesh, strategy,
                                    rules=problem.config.shard_rules)
            self.states[problem.name] = state

        # pp/ep shard only problems whose module exposes the expected
        # stacked layout (others replicate); a program where NO problem
        # matched would silently train unsharded — fail loudly instead
        if self.mesh is not None and self._strategy in ("pp", "ep"):
            from betty_tpu.parallel.mesh import strategy_matches

            if not any(
                strategy_matches(self._strategy, s)
                for s in self.states.values()
            ):
                what = (
                    "stage-stacked parameters under params['blocks'] "
                    "(models.make_pipelined_transformer)"
                    if self._strategy == "pp"
                    else "expert-stacked parameters under a moe/ subtree "
                         "(models.moe.init_moe_params)"
                )
                raise ValueError(
                    f"strategy={self._strategy!r}: no problem's module has "
                    f"{what}; nothing to shard"
                )

        end = time.time()
        if self.is_rank_zero():
            self.logger.info(
                f"Time spent on initialization: {end - start:.3f} (s)"
            )

    # ------------------------------------------------------------------
    # graph parsing — semantics identical to reference engine.py:217-290
    # ------------------------------------------------------------------
    def check_leaf(self, problem) -> bool:
        for _, value_list in self.dependencies["l2u"].items():
            if problem in set(value_list):
                return False
        return True

    def find_paths(self, src, dst):
        results = []
        path = [src]
        self.dfs(src, dst, path, results)
        assert len(results) > 0, f"No path from {src.name} to {dst.name}!"
        for i, _ in enumerate(results):
            results[i].reverse()
            results[i].append(dst)
        return results

    def dfs(self, src, dst, path, results):
        if src is dst:
            assert len(path) > 1
            results.append(list(path))
        elif src not in self.dependencies["l2u"]:
            return
        else:
            for adj in self.dependencies["l2u"][src]:
                path.append(adj)
                self.dfs(adj, dst, path, results)
                path.pop()

    def parse_dependency(self):
        if self.dependencies is None:
            self.dependencies = {"u2l": {}, "l2u": {}}
        self.dependencies.setdefault("u2l", {})
        self.dependencies.setdefault("l2u", {})

        # upper-to-lower: backprop paths
        for key, value_list in self.dependencies["u2l"].items():
            for value in value_list:
                paths = self.find_paths(src=value, dst=key)
                key.add_paths(paths)

        # lower-to-upper: parent/child wiring
        for key, value_list in self.dependencies["l2u"].items():
            for value in value_list:
                key.add_parent(value)
                value.add_child(key)

        for problem in self.problems:
            if self.check_leaf(problem):
                problem.leaf = True
                self.leaves.append(problem)

    def set_dependency(self, dependencies):
        self.dependencies = dependencies
        self.leaves = []
        for problem in self.problems:
            problem.leaf = False
            problem.clear_dependencies()
        self.parse_dependency()
        # re-derive the graph-dependent problem state: child-readiness masks,
        # parents' first_order AND, roll-back eligibility
        for problem in self.problems:
            problem.ready = [False] * len(problem.children)
            fo = [p.config.first_order for p in problem.parents]
            problem._first_order = all(fo) if fo else False
            problem._roll_back = self._roll_back and len(problem.parents) > 0
            problem._inner_loop_start = True

    def set_problem_attr(self, problem) -> str:
        """Name-attribute injection (reference engine.py:303-328): every
        problem (and the engine / env) can address every other problem as
        ``self.<name>``."""
        name = problem.name
        assert not hasattr(self, name), f"Problem already named {name}!"
        setattr(self, name, problem)
        for prob in self.problems:
            if prob is not problem:
                assert not hasattr(prob, name)
                setattr(prob, name, problem)
        if self.env is not None:
            setattr(self.env, name, problem)
        return name

    # ------------------------------------------------------------------
    # training loop (reference engine.py:86-121)
    # ------------------------------------------------------------------
    def train_step(self):
        for leaf in self.leaves:
            leaf.step(global_step=self.global_step)

    def run(self):
        self.maybe_auto_resume()
        if self.config.compile_blocks:
            return self.run_compiled()
        return self._run_driver()

    def _run_driver(self):
        self.train()
        if self.config.profile_dir:
            jax.profiler.start_trace(self.config.profile_dir)
        try:
            for it in range(1, self.train_iters + 1):
                self.global_step += 1
                self.train_step()

                # cadence on the GLOBAL step so boundaries stay aligned
                # across checkpoint resumes (== it when starting fresh)
                if self.maybe_validate_checkpoint(window=1):
                    break
        finally:
            if self.config.profile_dir:
                jax.profiler.stop_trace()
        self.cleanup()

    def maybe_auto_resume(self):
        """Elastic restart: pick up the checkpoint in ``checkpoint_dir`` if
        one exists (``EngineConfig(auto_resume=True)``); training then
        continues bit-exactly from the interruption point. Replaces the
        reference's reliance on torchrun restarts (SURVEY.md §5.3)."""
        import os

        if (
            self.config.auto_resume
            and self.config.checkpoint_dir
            and os.path.exists(
                os.path.join(self.config.checkpoint_dir, "meta.json")
            )
            and self.global_step == 0
        ):
            self.load_checkpoint(self.config.checkpoint_dir)
            # train_iters is the TOTAL target of the (logical) run; the
            # restarted process only executes the remainder
            self.train_iters = max(0, self.train_iters - self.global_step)
            if self.is_rank_zero():
                self.logger.info(
                    f"[auto_resume] restored global step {self.global_step} "
                    f"from {self.config.checkpoint_dir}; "
                    f"{self.train_iters} iterations remain"
                )

    def maybe_validate_checkpoint(self, window: int = 1) -> bool:
        """Validation / checkpointing on the driver cadence; a window of W
        means global_step just advanced by W iterations and any multiple of
        valid_step inside it triggers (window=1 == the classic per-iteration
        check). Returns True when early stopping fires. ONE implementation
        serves both run() and run_compiled() so the eval->validate->log->
        train->early-stop->checkpoint sequence cannot drift between them."""
        stop = False
        if self.do_validation() and \
                (self.global_step % self.valid_step) < window:
            self.eval()
            validation_stats = self.validation() or {}
            if self.is_rank_zero():
                self.logger.info(
                    f"[Validation] [Global Step {self.global_step}] "
                    f"{log_from_loss_dict(validation_stats)}"
                )
                self.logger.log(
                    validation_stats, tag="validation",
                    step=self.global_step,
                )
            self.train()
            if self.early_stopping is not None:
                if self.early_stopping(validation_stats):
                    self.logger.info("Early stopping is executed!")
                    stop = True
        if (
            self.config.checkpoint_step > 0
            and self.config.checkpoint_dir is not None
            and (self.global_step % self.config.checkpoint_step) < window
        ):
            self.save_checkpoint(self.config.checkpoint_dir)
        return stop

    def run_compiled(self):
        """Compiled-block training loop: one XLA dispatch per schedule period
        (see betty_tpu/compile.py). Numerically equivalent to driver mode."""
        from betty_tpu.compile import BlockRunner

        try:
            probe = BlockRunner(self, schedule_only=True)  # no data staging
        except RuntimeError as e:
            # no periodic / causally-complete block boundary exists for
            # this schedule — run the whole thing in (equivalent-numerics)
            # driver mode rather than crashing
            if self.is_rank_zero():
                self.logger.info(
                    f"[compile_blocks] falling back to driver mode: {e}"
                )
            return self._run_driver()
        self.train()
        if self.config.profile_dir:
            jax.profiler.start_trace(self.config.profile_dir)
        try:
            it = 0
            stopped = False
            maybe_validate_checkpoint = self.maybe_validate_checkpoint

            # warmup phase: drive in (fully general) driver mode until every
            # problem is past its warmup and the schedule phase matches the
            # simulator's steady state, then switch to compiled blocks
            def steady():
                return probe.live_phase() == probe.initial_phase and all(
                    p.warmup_steps == 0 or p._count > p.warmup_steps
                    for p in self.problems
                )

            while it < self.train_iters and not steady():
                it += 1
                self.global_step += 1
                self.train_step()
                if maybe_validate_checkpoint(1):
                    stopped = True
                    break

            # a block may never span more than one validation (or
            # checkpoint) boundary, or boundaries inside it would be
            # silently skipped and early stopping would see fewer
            # evaluations than driver mode. Rank-uniform: every process
            # derives the same K (one SPMD program across hosts). K is
            # sized from the iterations REMAINING after the warmup prefix
            # (a transient-prefix schedule must still dispatch blocks).
            remaining = self.train_iters - it
            cadence = (
                self.valid_step if self.do_validation() else remaining
            )
            if self.config.checkpoint_step > 0 and self.config.checkpoint_dir:
                cadence = min(cadence, self.config.checkpoint_step)
            cadence = max(1, cadence)
            K = self.config.block_periods
            if K <= 0:  # auto: amortize dispatch w/o outrunning validation
                K = max(1, min(cadence, max(remaining, 1), 512)
                        // probe.period)
                K = min(K, 32)
            else:
                K = max(1, min(K, max(1, cadence // probe.period)))
            if probe.period > cadence and self.is_rank_zero():
                self.logger.info(
                    f"[compile_blocks] schedule period {probe.period} "
                    f"exceeds the validation/checkpoint cadence {cadence}: "
                    "boundary actions run once per period (coarsened "
                    "cadence)"
                )
            period = probe.period * K
            runner = None
            if not stopped and remaining >= period:
                runner = BlockRunner(self, scan_periods=K)
            elif self.is_rank_zero() and not stopped:
                self.logger.info(
                    f"[compile_blocks] no blocks dispatched: {remaining} "
                    f"iterations remain after the {it}-iteration warmup "
                    f"prefix, below the block size {period}"
                )

            while not stopped and it + period <= self.train_iters:
                last_loss = runner.run_block()
                it += period
                self.global_step += period

                for p in self.problems:
                    if (
                        p.log_step > 0
                        and p.name in last_loss
                        and self.is_rank_zero()
                    ):
                        p.log(last_loss[p.name], self.global_step)

                if maybe_validate_checkpoint(period):
                    stopped = True
                    break

            # remainder iterations fall back to the (equivalent-numerics)
            # driver; sync the in-block roll-back caches first
            if runner is not None:
                runner.finalize()
            if not stopped:
                for _ in range(self.train_iters - it):
                    self.global_step += 1
                    self.train_step()
                    if maybe_validate_checkpoint(1):
                        break
        finally:
            if self.config.profile_dir:
                jax.profiler.stop_trace()
        self.cleanup()

    def train(self):
        for problem in self.problems:
            problem.train()

    def eval(self):
        for problem in self.problems:
            problem.eval()

    def do_validation(self) -> bool:
        # Runs on EVERY process: validation touches globally-sharded arrays,
        # so its collectives must execute on all ranks (rank-gating it — the
        # reference's behavior, engine.py:330-336 — deadlocks a multi-host
        # mesh), and the early-stopping decision derives from the same
        # deterministic global values on every rank, keeping control flow
        # aligned. Logging stays rank-0. valid_step=0 disables (mirror of
        # checkpoint_step=0).
        return self.is_implemented("validation") and self.valid_step > 0

    def is_rank_zero(self) -> bool:
        return jax.process_index() == 0

    def cleanup(self):
        if self.is_rank_zero():
            self.logger.info("Multilevel optimization finished!")

    def is_implemented(self, fn_name: str) -> bool:
        return callable(getattr(self, fn_name, None))

    # ------------------------------------------------------------------
    # engine-level checkpoint / resume (reference has none; examples call
    # torch.save(problem.state_dict()) by hand — SURVEY.md §5.4)
    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str):
        from betty_tpu.checkpoint import save_engine_state

        save_engine_state(self, path)

    def load_checkpoint(self, path: str):
        from betty_tpu.checkpoint import restore_engine_state

        restore_engine_state(self, path)
