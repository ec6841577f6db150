"""Compiled-program collective evidence for the v5e-8 projection
(VERDICT r4 next #5): the north-star-shaped SAMA data-reweighting programs,
partitioned over the 8-device mesh, must contain the expected collective
set, and the ICI analysis (scripts/ici_analysis.py) must extract nonzero
bytes-on-wire from them. Toy dims (CI); scripts/ici_analysis.py runs the
same pass at the real 355M shape — its numbers are recorded in BASELINE.md.
"""

import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load_ici():
    spec = importlib.util.spec_from_file_location(
        "ici_analysis", ROOT / "scripts" / "ici_analysis.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ici_analysis"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_fsdp_northstar_collective_set_and_bytes():
    ici = _load_ici()
    spec = importlib.util.spec_from_file_location(
        "bert_ici_t", ROOT / "examples" / "bert_data_reweighting" / "main.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bert_ici_t"] = mod
    spec.loader.exec_module(mod)

    a = ici.northstar_args("fsdp", small=True)
    clf_hlo, _ = ici.compile_program(mod, a, "classifier")
    clf = ici.collective_bytes(clf_hlo)
    # FSDP inner step: parameter all-gathers + a gradient reduction
    assert "all-gather" in clf, f"no all-gather in fsdp step: {set(clf)}"
    assert ("all-reduce" in clf) or ("reduce-scatter" in clf), set(clf)
    assert clf["all-gather"]["wire_bytes"] > 0

    rw_hlo, _ = ici.compile_program(mod, a, "reweight")
    rw = ici.collective_bytes(rw_hlo)
    # SAMA hypergradient step re-evaluates the classifier loss at
    # perturbed parameters: all-gathers again, plus the cross-replica
    # gradient reductions the reference routes through DDP hooks
    assert "all-gather" in rw, f"no all-gather in meta step: {set(rw)}"
    assert ("all-reduce" in rw) or ("reduce-scatter" in rw), set(rw)


def test_ring_cost_model():
    """Byte accounting on a synthetic HLO line set (ring formulas)."""
    ici = _load_ici()
    hlo = "\n".join([
        "  %ag = bf16[8,128,256] all-gather(bf16[1,128,256] %p), dims={0}",
        "  %ar = f32[1024] all-reduce(f32[1024] %g), to_apply=%sum",
        "  %rs = f32[128] reduce-scatter(f32[1024] %g2), dimensions={0}",
    ])
    out = ici.collective_bytes(hlo, n=8)
    ag_out = 8 * 128 * 256 * 2
    assert out["all-gather"]["wire_bytes"] == ag_out * 7 / 8
    assert out["all-reduce"]["wire_bytes"] == 2 * 1024 * 4 * 7 / 8
    assert out["reduce-scatter"]["wire_bytes"] == 128 * 4 * 7


def test_ring_cost_model_tpu_layout_variadic():
    """TPU-backend HLO regression: layout annotations contain parentheses
    (bf16[128]{0:T(256)(128)(2,1)S(1)}) and the backend COMBINES gradient
    reductions into variadic tuple all-reduces. The old [^)]*-based parser
    truncated these to ~one element, silently dropping almost all gradient
    wire bytes from the --target tpu analysis."""
    ici = _load_ici()
    hlo = (
        "  %all-reduce.43 = (bf16[128]{0:T(256)(128)(2,1)S(1)}, "
        "bf16[128,128]{1,0:T(8,128)(2,1)S(1)}, "
        "bf16[2]{0:T(256)(128)(2,1)S(1)}) "
        "all-reduce(%a, %b, %c), channel_id=3, replica_groups=[1,8]<=[8], "
        "to_apply=%region"
    )
    out = ici.collective_bytes(hlo, n=8)
    payload = (128 + 128 * 128 + 2) * 2  # bf16
    assert out["all-reduce"]["count"] == 1
    assert out["all-reduce"]["wire_bytes"] == 2 * payload * 7 / 8
    assert set(out["all-reduce"]["by_dtype"]) == {"bf16"}
    # operand references and -done forms carry no payload
    out2 = ici.collective_bytes(
        "  %gte = bf16[128]{0:T(256)(2,1)} get-tuple-element(%all-reduce.43),"
        " index=0\n"
        "  %d = bf16[128]{0:T(256)(2,1)} all-reduce-done(%all-reduce-start.1)",
        n=8)
    assert out2 == {}


def test_tpu_topology_collectives_bf16():
    """--target tpu: the toy dp program AOT-compiled against the v5e:2x4
    compile-only topology must reduce gradients in bf16 (the TPU backend
    sinks the all-reduce below the narrowing convert — this HALVES the dp
    gradient wire vs the CPU partitioner's f32 and is why there is no
    grad_reduce_dtype knob; see betty_tpu/configs.py)."""
    import pytest

    ici = _load_ici()
    if not ici.tpu_topology_available():
        pytest.skip("no TPU compile-only topology in this environment")
    spec = importlib.util.spec_from_file_location(
        "bert_ici_t2", ROOT / "examples" / "bert_data_reweighting" / "main.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bert_ici_t2"] = mod
    spec.loader.exec_module(mod)

    a = ici.northstar_args("dp", small=True)
    clf_hlo, hbm = ici.compile_program(mod, a, "classifier", target="tpu")
    clf = ici.collective_bytes(clf_hlo)
    assert "all-reduce" in clf, set(clf)
    assert hbm is None or hbm > 0
    by = clf["all-reduce"]["by_dtype"]
    # the gradient payload must be bf16; anything f32 should be scalar-level
    assert by.get("bf16", 0) > 0.9 * clf["all-reduce"]["wire_bytes"], by


def test_ring_cost_model_async_start_forms():
    """Async `-start` collectives carry (operands..., results...) tuples;
    only the result payload rides the wire — the aliased operand half must
    not be double-counted (all-reduce-start) or added to the output
    (all-gather-start)."""
    ici = _load_ici()
    hlo = "\n".join([
        "  %ars = (f32[1024], f32[1024]) all-reduce-start(f32[1024] %g),"
        " to_apply=%sum",
        "  %ags = (bf16[1,128,256], bf16[8,128,256]) all-gather-start("
        "bf16[1,128,256] %p), dims={0}",
    ])
    out = ici.collective_bytes(hlo, n=8)
    assert out["all-reduce"]["wire_bytes"] == 2 * 1024 * 4 * 7 / 8
    ag_out = 8 * 128 * 256 * 2
    assert out["all-gather"]["wire_bytes"] == ag_out * 7 / 8
