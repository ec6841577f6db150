"""Reproducible in-context flash-attention probe (north star, seq 512).

The flash kernel (betty_tpu/ops/flash_attention.py) wins 1.3-2.0x ISOLATED
at the north-star attention shape but was measured to LOSE ~0.76x inside
the full 355M SAMA meta-program — a number previously recorded only from an
offline session. This script makes that measurement a one-command artifact:

    python scripts/probe_flash_context.py            # flash off vs on
    python scripts/probe_flash_context.py --profile  # + jax profiler traces

Profile traces land in /tmp/flash_probe_trace_{plain,flash}/ for perfetto.
Requires the real chip (same gating as bench.py).
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(use_flash, seq, batch, profile, remat_policy="dots"):
    import bench

    if profile:
        import jax

        tag = "flash" if use_flash else "plain"
        with jax.profiler.trace(f"/tmp/flash_probe_trace_{tag}"):
            out = bench.bench_sama_roberta_large(
                use_flash=use_flash, seq=seq, batch=batch, K=1,
                timed_blocks=2, remat_policy=remat_policy)
    else:
        out = bench.bench_sama_roberta_large(
            use_flash=use_flash, seq=seq, batch=batch, K=1, timed_blocks=3,
            remat_policy=remat_policy)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8,
                    help="8 fits 355M @ seq512 activations comfortably")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--flash_only", action="store_true")
    ap.add_argument("--plain_only", action="store_true")
    ap.add_argument("--remat_policy", default="dots",
                    help="remat policy for the plain arm (flash at "
                         "seq>=1024 always uses 'minimal': its saved-"
                         "residual policies exceed 16GB there — see "
                         "docs/memory.md)")
    ap.add_argument("--flash_remat_policy", default=None,
                    help="override the flash arm's policy (default: "
                         "same as --remat_policy at seq<1024, 'minimal' "
                         "at seq>=1024)")
    args = ap.parse_args()

    import bench

    if not bench.chip_available():
        print(json.dumps({"error": "chip unavailable"}))
        return

    flash_policy = args.flash_remat_policy or (
        "minimal" if args.seq >= 1024 else args.remat_policy)
    results = {}
    if not args.flash_only:
        results["plain"] = run(False, args.seq, args.batch, args.profile,
                               args.remat_policy)
    if not args.plain_only:
        results["flash"] = run(True, args.seq, args.batch, args.profile,
                               flash_policy)
    if "plain" in results and "flash" in results:
        p = results["plain"].get("meta_periods_per_sec_median")
        f = results["flash"].get("meta_periods_per_sec_median")
        if p and f:
            results["flash_in_context_speedup"] = round(f / p, 3)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
