"""In-context flash-attention study at seq >= 512 (VERDICT r3 weak #3 /
next-round #3).

Runs the north-star 355M SAMA meta-program at (batch, seq) with flash off
vs on and reports meta-periods/s for both, plus an HLO accounting of where
the flash path's overhead lives (transpose fusions materialized around the
Pallas custom-calls, kernel counts, byte traffic), so the verdict — flip
the default or document the binding cost — is profile-backed either way.

Usage: python scripts/flash_incontext_seq512.py [batch] [seq]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (repo-root bench.py)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    out = {}
    for use_flash in (False, True):
        # engines hold reference cycles; without this the previous side's
        # ~5GB device state survives into this run and OOMs the shared
        # chip (the r4 study lost several runs to exactly this)
        import gc

        gc.collect()
        # blanket remat for plain, "minimal" for flash: the policies that
        # actually fit at seq>=512 (docs/memory.md case study; "dots"
        # saves the per-layer score matrix and OOMs either path)
        r = bench.bench_sama_roberta_large(
            use_flash=use_flash, K=1, timed_blocks=3, remat=True,
            remat_policy="minimal" if use_flash else "full",
            batch=batch, seq=seq,
        )
        key = "flash" if use_flash else "plain"
        out[key] = r
        print(f"# {key}: {r.get('meta_periods_per_sec_median')} "
              f"meta-periods/s, hbm {r.get('hbm_peak_gib')} GiB, "
              f"err={r.get('error')}")

    p = out.get("plain", {}).get("meta_periods_per_sec_median")
    f = out.get("flash", {}).get("meta_periods_per_sec_median")
    if p and f:
        out["flash_speedup_in_context"] = round(f / p, 3)
        print(f"# in-context flash speedup at B{batch}/S{seq}: {f/p:.3f}x")
    path = Path(__file__).resolve().parents[1] / (
        f"/tmp/flash_incontext_b{batch}_s{seq}.json")
    Path(path).write_text(json.dumps(out, indent=1))
    print(f"# written {path}")


if __name__ == "__main__":
    main()
