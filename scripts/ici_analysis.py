"""Compiled-program ICI evidence for the v5e-8 north-star projection
(VERDICT r4 weak #4 / next-round #5).

Compiles the REAL 355M north-star training programs (SAMA RoBERTa-large
scale data reweighting, bf16, ``examples/bert_data_reweighting``) over an
8-device mesh (CPU-simulated; XLA's SPMD partitioner emits the same
collective set it would for 8 real chips), then:

1. parses every collective instruction (all-gather / reduce-scatter /
   all-reduce / collective-permute / all-to-all) and its shape out of the
   optimized HLO,
2. converts them to ring bytes-on-wire per device per meta-period
   (5 inner classifier steps + 1 reweighter meta step, the bench config),
3. divides by the v5e ICI ring bandwidth to get the ICI time bound, and
4. combines with the measured one-chip compute anchor (BENCH r4:
   0.4902 s/meta-period at 52.5% MFU) into a derived 8-chip scaling
   efficiency, replacing BASELINE.md's assumed 0.93.

Ring cost model (standard; see e.g. the public TPU scaling-book treatment):
for n devices, all-gather moves (n-1)/n of the gathered bytes through each
device; reduce-scatter the same on the reduced bytes; all-reduce =
reduce-scatter + all-gather = 2x(n-1)/n. v5e ICI: 45 GB/s per link per
direction; one 8-chip torus axis uses 2 links/chip -> 90 GB/s effective
ring bandwidth per device (assumption named in the output).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/ici_analysis.py [--strategy fsdp] [--small]

Writes the JSON result to stdout; tests/test_ici_analysis.py asserts the
collective set on the same (toy-scale) programs.
"""

import argparse
import importlib.util
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

# measured one-chip anchor (BENCH_DETAIL.json, sama_roberta_large, r4)
MEASURED_SEC_PER_META_PERIOD = 0.4902
V5E_RING_BW = 90e9          # bytes/s per device on one torus axis (2 links)
N_DEV = 8
UNROLL = 5                  # inner steps per meta-period (bench config)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_OP_RE = re.compile(
    r"\b(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(-start|-done)?\(")
_TUPLE_ELT_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_bytes(hlo_text, n=N_DEV):
    """{op: {'count': k, 'wire_bytes': per-device ring bytes, 'by_dtype':
    {dtype: bytes}}} over every collective instruction in the optimized HLO
    (``-start`` async forms counted once; ``-done`` has no shape payload of
    its own)."""
    out = {}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m or m.group(2) == "-done":
            # `-done` carries no payload of its own; operand references
            # (%all-reduce.43) are not followed by "(" and never match
            continue
        op, suffix = m.group(1), m.group(2) or ""
        # the instruction's result type is the span between "= " and the op
        # token. NOTE: it cannot be parsed with [^)]*-style regexes — TPU
        # HLO layouts contain parentheses (bf16[128]{0:T(256)(128)(2,1)S(1)})
        # which silently truncated the TPU backend's COMBINED variadic
        # gradient all-reduces to their last element.
        parts = line.split("= ", 1)
        if len(parts) < 2:
            continue
        result = parts[1][: parts[1].rfind(op + suffix + "(")]
        if result.lstrip().startswith("("):
            elts = [(d, s) for d, s in _TUPLE_ELT_RE.findall(result)
                    if s]  # drop scalar context tokens (u32[] etc.)
            if suffix == "-start":
                # async `-start` form: the tuple is (operands..., results...)
                # — the aliased operands must NOT be counted as payload
                # (all-reduce-start would double, all-gather-start would
                # count input+output). Take the result half.
                elts = elts[len(elts) // 2:]
            # remaining tuple (variadic collective): sum the elements
            size = sum(_shape_bytes(d, s) for d, s in elts)
            dtype = elts[0][0] if elts else "?"
        else:
            one = _TUPLE_ELT_RE.search(result)
            if not one:
                continue  # token-only result (e.g. control dependency)
            dtype = one.group(1)
            size = _shape_bytes(one.group(1), one.group(2))
        if op == "all-gather":
            wire = size * (n - 1) / n          # size = gathered output
        elif op == "reduce-scatter":
            wire = size * (n - 1)              # size = scattered output
        elif op == "all-reduce":
            wire = 2 * size * (n - 1) / n
        elif op == "all-to-all":
            wire = size * (n - 1) / n
        else:                                  # collective-permute
            wire = size
        rec = out.setdefault(op, {"count": 0, "wire_bytes": 0.0,
                                  "by_dtype": {}})
        rec["count"] += 1
        rec["wire_bytes"] += wire
        rec["by_dtype"][dtype] = rec["by_dtype"].get(dtype, 0.0) + wire
    return out


def tpu_topology_available(topology_name="v5e:2x4"):
    try:
        from jax.experimental import topologies

        topologies.get_topology_desc(platform="tpu",
                                     topology_name=topology_name)
        return True
    except Exception:
        return False


def _retarget(engine, tree, topology_name):
    """Map every array leaf to a ShapeDtypeStruct whose NamedSharding lives
    on a REAL TPU topology mesh (compile-only PJRT client) with the same
    axis names/shape as the engine's CPU mesh. The update program can then
    be AOT-compiled by the actual TPU backend — whose optimization pipeline
    differs from the CPU partitioner in ways that change the wire numbers
    materially: reduce-scatter creation (halves all-reduce bytes under
    fsdp) and all-reduce sinking below narrowing converts (bf16-forward
    gradients are reduced in bf16, halving dp gradient wire)."""
    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology_name)
    cpu_mesh = engine.mesh
    devs = np.array(topo.devices).reshape(cpu_mesh.devices.shape)
    tmesh = Mesh(devs, cpu_mesh.axis_names)

    def to_sds(x):
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            return x
        sh = getattr(x, "sharding", None)
        spec = sh.spec if isinstance(sh, NamedSharding) else PartitionSpec()
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(tmesh, spec))

    return jax.tree_util.tree_map(to_sds, tree)


def compile_program(mod, args_list, problem, target="cpu",
                    topology_name="v5e:2x4"):
    """Optimized HLO text of one problem's per-step update program.

    ``target="cpu"``: partitioned + optimized by the ambient (CPU) backend —
    the 8-virtual-device environment the engine runs in.
    ``target="tpu"``: the engine still builds on CPU, but the update is
    AOT-compiled against a v5e 2x4 compile-only topology, yielding the
    exact collective set 8 real chips would execute.
    """
    import jax

    args = mod.parse_args(args_list)
    engine = mod.build_engine(args)
    prob = getattr(engine, problem)
    engine.train()
    prob._count = 1
    batch = prob.get_batch()
    # hypergradient paths re-evaluate intermediate problems' losses on
    # their own batches (update(states, batch, path_batches, itd, rng))
    path_batches = {}
    for path in prob.paths:
        for hop in path[1:-1]:
            hop._count = 1
            path_batches[hop.name] = hop.get_batch()
    upd = prob._get_update_fn(apply_update=True, advance_sched=True)
    args5 = (engine.states, batch, path_batches, {}, jax.random.PRNGKey(0))
    if target == "tpu":
        args5 = _retarget(engine, args5, topology_name)
    lowered = upd.lower(*args5)
    compiled = lowered.compile()
    hbm = None
    if target == "tpu":
        try:  # per-device HBM of the real 8-chip program (argument +
            # output + temp; generated-code footprint of one shard)
            ma = compiled.memory_analysis()
            hbm = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes)
        except Exception:
            pass
    return compiled.as_text(), hbm


def northstar_args(strategy, small, solver_precision="fp32"):
    a = ["--train_iters", "0", "--batch_size", "32", "--seq_len", "128",
         "--precision", "bf16", "--hypergradient", "sama",
         "--solver_precision", solver_precision,
         "--unroll_steps", str(UNROLL), "--strategy", strategy]
    if small:
        a += ["--dim", "128", "--depth", "2", "--heads", "4",
              "--train_size", "128", "--meta_size", "64"]
    else:
        a += ["--model", "large",
              "--train_size", "128", "--meta_size", "64"]
    return a


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--strategy", default="fsdp", choices=["dp", "fsdp"])
    p.add_argument("--small", action="store_true",
                   help="toy dims (CI); default is the real 355M shape")
    p.add_argument("--solver_precision", default="fp32",
                   choices=["fp32", "bf16"],
                   help="hypergradient-pipeline precision (measured NOT to "
                        "change reduction wire bytes — the collective "
                        "dtype is set by the backend's convert sinking, "
                        "see --target tpu)")
    p.add_argument("--target", default="tpu", choices=["tpu", "cpu"],
                   help="'tpu' (default): AOT-compile against a v5e:2x4 "
                        "compile-only topology — the exact collective "
                        "set/dtypes 8 real chips execute (reduce-scatter "
                        "creation, bf16 all-reduce sinking). 'cpu': the "
                        "ambient-backend partitioning (upper bound; what "
                        "rounds <=5 shipped). Falls back to cpu with a "
                        "note when no TPU compiler is available.")
    args = p.parse_args(argv)
    # betty_tpu honors JAX_PLATFORMS=cpu via the config API (the axon TPU
    # plugin overrides the env var); import it BEFORE touching a backend.
    import betty_tpu  # noqa: F401
    import jax

    n_topo = 8  # v5e:2x4
    if jax.device_count() != n_topo:
        sys.exit(
            f"ambient backend has {jax.device_count()} device(s); the "
            f"engine must build on an {n_topo}-device mesh to match the "
            "v5e:2x4 topology. Run with:\n  JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_topo} "
            "python scripts/ici_analysis.py ...")
    if args.target == "tpu" and not tpu_topology_available():
        print("# no TPU compile-only topology available; falling back to "
              "--target cpu", file=sys.stderr)
        args.target = "cpu"

    spec = importlib.util.spec_from_file_location(
        "bert_ici", ROOT / "examples" / "bert_data_reweighting" / "main.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bert_ici"] = mod
    spec.loader.exec_module(mod)

    a = northstar_args(args.strategy, args.small, args.solver_precision)
    print(f"# compiling classifier inner-step program ({args.strategy}, "
          f"target={args.target})...", file=sys.stderr)
    clf_hlo, clf_hbm = compile_program(mod, a, "classifier",
                                       target=args.target)
    clf = collective_bytes(clf_hlo)
    print("# compiling reweighter meta-step program (SAMA hypergrad)...",
          file=sys.stderr)
    rw_hlo, rw_hbm = compile_program(mod, a, "reweight", target=args.target)
    rw = collective_bytes(rw_hlo)

    per_period = {}
    total_wire = 0.0
    for src, mult, name in ((clf, UNROLL, "classifier_step"),
                            (rw, 1, "reweight_meta_step")):
        rec = {op: {"count": v["count"],
                    "wire_gib_per_device": round(v["wire_bytes"] / 2**30, 4),
                    "by_dtype_gib": {d: round(b / 2**30, 4)
                                     for d, b in sorted(v["by_dtype"].items())}}
               for op, v in sorted(src.items())}
        per_period[name] = {"collectives": rec, "executions": mult}
        total_wire += mult * sum(v["wire_bytes"] for v in src.values())
    for name, hbm in (("classifier_step", clf_hbm),
                      ("reweight_meta_step", rw_hbm)):
        if hbm is not None:
            per_period[name]["hbm_per_device_gib"] = round(hbm / 2**30, 3)

    t_ici = total_wire / V5E_RING_BW
    t_comp = MEASURED_SEC_PER_META_PERIOD
    scaling_no_overlap = t_comp / (t_comp + t_ici)
    scaling_overlap = t_comp / max(t_comp, t_ici)
    result = {
        "strategy": args.strategy,
        "target_backend": {"tpu": "v5e:2x4 compile-only topology (real TPU "
                                  "collective set)",
                           "cpu": "CPU partitioner (upper bound)"}[args.target],
        "solver_precision": args.solver_precision,
        "shape": "toy" if args.small else "355M (roberta-large scale)",
        "n_devices": N_DEV,
        "unroll_steps": UNROLL,
        "programs": per_period,
        "wire_gib_per_device_per_meta_period": round(total_wire / 2**30, 3),
        "ici_ring_bw_gbps_assumed": V5E_RING_BW / 1e9,
        "ici_seconds_per_meta_period": round(t_ici, 5),
        "measured_compute_seconds_per_meta_period": t_comp,
        "derived_scaling_efficiency_no_overlap": round(scaling_no_overlap, 4),
        "derived_scaling_efficiency_full_overlap": round(scaling_overlap, 4),
    }
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main()
