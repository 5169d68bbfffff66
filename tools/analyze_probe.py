"""Summarize a tools/probe_fused_mlp.py log and recommend shipped defaults.

Implements the relay-return runbook's selection step in code: parse the
per-variant slope fits and first-step guard numbers, drop variants that
errored or diverged from the baseline beyond the guard tolerance
(suspected Mosaic miscompile — the Pallas routes only meet the real
compiler on chip), and print the min-slope winner with the module defaults
to flip (models/vit._SHIPPED_MLP_REMAT / _SHIPPED_LN_QKV /
ops/flash_attention._SHIPPED_SAVE_P) plus the implied MIM MFU for BENCH.md
(26.0% x 49.7 / slope, anchored to the r3 baseline measurement).

Usage: python tools/analyze_probe.py [/tmp/probe_mlp.log]
"""

import json
import sys

BASELINE_MS = 49.7   # r3 slope-fit MIM AMP step (BENCH.md)
BASELINE_MFU = 26.0  # % at 49.7 ms
# must match probe_fused_mlp.GUARD_RTOL_LOSS / GUARD_RTOL_GNORM (gnorm is
# wider: LN-reassociating routes move it ~5e-3 even under the exact
# interpret evaluator — measured by --smoke; real miscompiles move it 10x+)
GUARD_RTOL_LOSS = 5e-3
GUARD_RTOL_GNORM = 2e-2


def parse(path):
    first, slopes, errors, guard_fails = {}, {}, {}, set()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "first_loss" in rec:
                first[rec["variant"]] = (rec["first_loss"], rec["first_gnorm"])
            elif "slope_ms_per_iter" in rec:
                v = rec["workload"].removeprefix("mim_step_")
                slopes[v] = (rec["slope_ms_per_iter"], rec.get("intercept_ms"))
            elif "error" in rec and "workload" in rec:
                errors[rec["workload"].removeprefix("mim_step_")] = rec["error"]
            elif "PROBE_GUARD_FAIL" in rec:
                guard_fails.add(rec["PROBE_GUARD_FAIL"])
    return first, slopes, errors, guard_fails


def defaults_for(variant):
    """Map a probe variant name onto the three shipped-default values."""
    mode = variant
    save_p = False
    if mode == "savep" or mode.endswith("+savep"):
        save_p = True
        mode = mode[: -len("+savep")] if "+" in mode else "baseline"
    ln_qkv = None
    if mode.endswith("+lnqkv"):
        ln_qkv = "kernel"
        mode = mode[: -len("+lnqkv")] or "baseline"
    mlp = None if mode == "baseline" else mode
    return mlp, ln_qkv, save_p


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_mlp.log"
    first, slopes, errors, guard_fails = parse(path)
    if "baseline" not in slopes:
        print("no baseline slope in the log — probe incomplete", file=sys.stderr)
        return 1
    anchor = first.get("baseline")

    rows = []
    for v, (slope, intercept) in sorted(slopes.items(), key=lambda kv: kv[1][0]):
        ok = v not in guard_fails
        drift = None
        if anchor and v in first:
            drifts = [abs(a - b) / max(1.0, abs(a))
                      for a, b in zip(anchor, first[v])]
            drift = max(drifts)
            ok = (ok and drifts[0] <= GUARD_RTOL_LOSS
                  and drifts[1] <= GUARD_RTOL_GNORM)
        elif v != "baseline":
            # a truncated/interleaved log lost this variant's first-step
            # record: the miscompile screen never ran for it, so it must
            # not be shippable
            ok = False
        rows.append((v, slope, intercept, drift, ok))
        flag = "" if ok else "  <-- GUARD FAIL (do not ship)"
        print(f"{v:24s} {slope:7.2f} ms  (intercept {intercept} ms, "
              f"first-step drift {drift if drift is not None else 'n/a'}){flag}")
    for v, err in errors.items():
        print(f"{v:24s} ERROR: {err[:120]}")

    passing = [r for r in rows if r[4]]
    if not passing:
        print("\nno variant passed the guard — keep the shipped defaults")
        return 1
    best = passing[0]
    mlp, ln_qkv, save_p = defaults_for(best[0])
    mfu = BASELINE_MFU * BASELINE_MS / best[1]
    print()
    print(f"winner: {best[0]} at {best[1]:.2f} ms/iter "
          f"({BASELINE_MS / best[1]:.2f}x baseline, ~{mfu:.1f}% MFU)")
    print("ship:  models/vit._SHIPPED_MLP_REMAT =", repr(mlp))
    print("       models/vit._SHIPPED_LN_QKV   =", repr(ln_qkv))
    print("       ops/flash_attention._SHIPPED_SAVE_P =", save_p)
    if best[0] == "baseline":
        print("(baseline won — leave the shipped defaults as they are)")
    print("then: update BENCH.md's MIM row + fused-kernel paragraph and "
          "re-run python bench.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
