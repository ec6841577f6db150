"""Configuration dataclasses for problems and the engine.

Capability parity with the reference library's ``betty/configs/problem_dataclass.py``
and ``betty/configs/engine_dataclass.py`` (leopard-ai/betty), re-designed for a
TPU/JAX runtime:

* ``precision`` accepts ``"fp32"`` / ``"bf16"`` (TPU-native mixed precision).
  ``"fp16"`` is accepted and treated as ``"bf16"`` — TPUs have native bfloat16
  matrix units and need no dynamic loss scaling, so the reference's GradScaler
  knobs (``initial_dynamic_scale``, ``scale_factor``) are kept for API
  compatibility but are inert.
* ``EngineConfig.strategy`` selects a ``jax.sharding`` layout instead of a
  torch.distributed wrapper: ``"default"`` (single device), ``"dp"``
  (data-parallel batch sharding; the reference's ``"distributed"`` is accepted
  as an alias), ``"zero"`` (DP + optimizer-state sharding), ``"fsdp"``
  (DP + parameter/optimizer sharding).
* ``backend`` is unused on TPU (collectives ride ICI via XLA); kept for parity.
"""

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass
class Config:
    """Per-problem training configuration.

    Mirrors reference ``betty/configs/problem_dataclass.py:4-48`` field-for-field
    (minus torch-specific loss-scaling semantics).
    """

    type: str = "darts"
    unroll_steps: int = 1
    first_order: bool = True
    retain_graph: bool = False  # parity no-op: JAX has no retained tape
    allow_unused: bool = True  # parity no-op: JAX yields zeros for unused leaves

    # gradient accumulation
    gradient_accumulation: int = 1

    # gradient clipping
    gradient_clipping: float = 0.0

    # precision
    precision: str = "fp32"
    initial_dynamic_scale: float = 4096.0  # inert on TPU (no fp16 GradScaler)
    scale_factor: float = 2.0  # inert on TPU
    # Precision of the HYPERGRADIENT pipeline (direct cross-gradient + solver
    # perturbations/HVPs) when ``precision`` is reduced. bf16 central
    # differences with eps = R/||v|| are noise-dominated (bf16 has ~3 decimal
    # digits; the difference is amplified by 1/(2 eps)), so the default runs
    # solver math in fp32 — it executes once per unroll_steps inner steps, so
    # the end-to-end cost is small. Set to "bf16" to force reduced precision
    # everywhere (measured error: tests/test_bf16.py).
    solver_precision: str = "fp32"
    # There is deliberately NO grad_reduce_dtype knob: under
    # ``precision="bf16"`` the TPU backend already sinks the SPMD gradient
    # all-reduce below the narrowing convert, so multi-chip gradient
    # reductions ride the ICI wire in bf16 automatically (verified on the
    # v5e:2x4-topology-compiled north-star programs — a bf16-cast
    # differentiation point was prototyped and changed nothing;
    # scripts/ici_analysis.py --target tpu, BASELINE.md).

    # warm-up
    warmup_steps: int = 0

    # logging
    log_step: int = -1
    log_local_step: bool = False

    # darts
    darts_alpha: float = 0.01
    darts_multitask: bool = False

    # sama
    sama_adam_alpha: float = 1.0
    sama_multitask: bool = False

    # neumann
    neumann_iterations: int = 1
    neumann_alpha: float = 1.0

    # cg
    cg_iterations: int = 1
    cg_alpha: float = 1.0

    # reinforce (score-function / ES hypergradient; the reference registers
    # this solver but left it an unfinished stub — these knobs are
    # betty_tpu's). eps for the w-perturbation reuses the darts rule
    # (reinforce_alpha / ||v||); sigma is the Gaussian smoothing scale of
    # the zeroth-order gradient estimate in prev's params; samples is the
    # number of antithetic direction pairs (4 loss evals each).
    reinforce_alpha: float = 0.01
    reinforce_sigma: float = 0.01
    reinforce_samples: int = 4

    # --- TPU-native extension: run CG/Neumann vector algebra through fused
    # Pallas kernels over the flattened parameter vector (betty_tpu/ops).
    use_fused_vector_ops: bool = False

    # --- TPU-native extension: how CG/Neumann compute Hessian-vector
    # products. "jvp" = forward-over-reverse (jvp of grad — cheaper on TPU:
    # the tangent rides the existing forward+backward instead of
    # differentiating the backward graph again); "vjp" =
    # reverse-over-reverse, the literal counterpart of the reference's
    # torch.autograd.grad(in_grad, params, grad_outputs=v). Identical math
    # (the Hessian is symmetric); bitwise differences are at rounding level.
    hvp_mode: str = "jvp"

    # --- TPU-native extension: rematerialize the forward pass during the
    # backward (jax.checkpoint) — trades FLOPs for activation memory, the
    # standard recipe for fitting large models in HBM.
    remat: bool = False

    # --- TPU-native extension: per-problem tensor-parallel sharding
    # overrides under ``EngineConfig(strategy="tp")`` — a sequence of
    # ``(path_regex, partition_spec_tuple)`` pairs checked before the
    # built-in Megatron rules, e.g. ``((r"Dense_0/kernel$", (None, "mdl")),)``.
    shard_rules: Optional[Tuple] = None


@dataclass
class EngineConfig:
    """Global engine configuration.

    Mirrors reference ``betty/configs/engine_dataclass.py:4-27`` plus TPU-native
    extensions (mesh shape, compiled-block mode, profiling).
    """

    train_iters: int = 50000
    valid_step: int = 500

    # logger
    logger_type: str = "none"

    # roll back (a.k.a. warm start)
    roll_back: bool = False

    # distributed training
    backend: str = "xla"  # parity field; collectives are XLA-inserted on TPU
    # default | dp | distributed (=dp) | zero | fsdp | tp
    #   | pp (stage-stacked params["blocks"] over a 'pp' mesh axis)
    #   | ep (expert-stacked moe/* params over an 'ep' mesh axis)
    #   | sp (replicated params; modules built with seq_axis= shard
    #         activations over the 'sp' mesh axis)
    strategy: str = "default"

    # early stopping
    early_stopping: bool = False
    early_stopping_mode: str = "min"
    early_stopping_tolerance: int = 5
    early_stopping_metric: str = "loss"

    # --- TPU-native extensions (no reference counterpart) ---
    # Mesh axes for jax.sharding.Mesh, e.g. (("dp", 8),). None = all devices on "dp".
    mesh_shape: Optional[Tuple[Tuple[str, int], ...]] = None
    # Fully compile each unroll block into one XLA program (lax.scan inner loop).
    compile_blocks: bool = False
    # Schedule periods per dispatch in compiled-block mode; 0 = auto
    # (bounded by valid_step and a staging-memory cap).
    block_periods: int = 0
    # Donate state buffers to jitted updates (in-place on device; halves
    # transient HBM for large models). Default off: donation costs ~3x per
    # dispatch through proxied/tunneled TPU runtimes (e.g. axon); turn on
    # for direct-attached TPUs when HBM-bound.
    donate_state: bool = False
    # Multi-process: automatically shard ArrayLoaders per host (each process
    # loads examples i::N; the global batch is local x process_count). Set
    # False to manage per-host data yourself.
    autoshard_data: bool = True
    # jax.profiler trace directory; None disables.
    profile_dir: Optional[str] = None
    # Persistent XLA compilation cache directory: compiled programs survive
    # process restarts (elastic resume, iterative development), turning
    # multi-minute first-compiles of large blocks (the MWN darts block takes
    # ~8 min cold on v5e) into a disk read. "auto" = ~/.cache/betty_tpu/xla
    # on accelerator backends (skipped on CPU, where AOT cache entries are
    # machine-feature-sensitive); None disables; an explicit dir always
    # applies.
    compile_cache_dir: Optional[str] = "auto"
    # PRNG implementation for every key the engine derives (dropout, init,
    # perturbations): "threefry" = JAX's default counter-based generator
    # (stable, partitionable, reference-comparable streams); "rbg" = the
    # TPU-native hardware RngBitGenerator. Threefry mask generation is pure
    # VPU arithmetic and shows up hard in profiles of dropout-heavy models —
    # on the 355M north-star block it is ~17% of device time (masks are
    # regenerated in the backward pass under remat, so it is paid twice per
    # layer). "rbg" removes that at the cost of different (still
    # high-quality) random streams; trajectories are NOT bit-comparable
    # across the two settings. Applied process-globally at engine init and
    # NOT reset afterwards (the default "threefry" leaves the process flag
    # untouched, so a deliberate global choice survives later engines);
    # restore jax.config.jax_default_prng_impl yourself when mixing
    # implementations in one process.
    rng_impl: str = "threefry"
    # checkpointing
    checkpoint_dir: Optional[str] = None
    checkpoint_step: int = 0  # 0 disables periodic engine checkpoints
    # Elastic restart: when checkpoint_dir holds a checkpoint at startup,
    # restore it and continue (resume is bit-exact, incl. mid-epoch
    # iterator positions and roll-back caches — tests/test_checkpoint.py).
    # The reference delegates elasticity to torchrun (SURVEY.md §5.3).
    auto_resume: bool = False
