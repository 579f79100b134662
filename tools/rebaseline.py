#!/usr/bin/env python3
"""Recapture BENCH_BASELINE.json from a SINGLE-WINDOW bench_out.json.

The r16 verdict's root cause #1(b): the old baseline merged per-query
MINIMA across rounds of re-captures — a best-ever ratchet that any
honest fresh capture reads 1.2-1.6x above, turning every gate
discussion into weather forensics. The baseline is now every row from
ONE two-pass Bench run taken in ONE canary-valid window, plus that
window's canary_ref so tools/bench_gate.py can refuse hot-window
captures (exit 2, "window invalid, re-run") instead of reporting
phantom regressions.

Usage: python3 tools/rebaseline.py [bench_out.json] [BENCH_BASELINE.json]
Refuses a source capture with failed queries or no canary samples.
"""
import json
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--canary-ref")]
ref_override = None
for a in sys.argv[1:]:
    # --canary-ref=X: pin the window threshold instead of taking this
    # capture's min. Use when the capture window was ANOMALOUSLY quiet
    # (e.g. r18: canary min 0.232s vs the established quiet reference
    # 0.448s — a 2x host-speed regime): adopting the anomalous min
    # would classify every NORMAL quiet window as loaded and send the
    # next driver capture straight back to exit 2. The ref's job is
    # "reject load", not "norm host-speed regimes" — per-query rows
    # still come from this single capture either way.
    if a.startswith("--canary-ref="):
        ref_override = float(a.split("=", 1)[1])
src = args[0] if len(args) > 0 else "bench_out.json"
dst = args[1] if len(args) > 1 else "BENCH_BASELINE.json"
obj = json.load(open(src))
if "queries" not in obj:
    sys.exit(f"{src}: no queries map — not a Bench capture")
if not obj.get("canary"):
    sys.exit(f"{src}: no canary samples — rebaseline only from a "
             f"canary-enabled Bench build, so the window is on record")
bad = {k: v for k, v in obj["queries"].items() if v < 0}
if bad:
    sys.exit(f"{src}: failed queries, fix before rebaselining: {bad}")
out = {
    "metric": "total",
    "value": round(sum(obj["queries"].values()), 4),
    "unit": "sec",
    "sf": obj.get("sf"),
    "passes": obj.get("passes"),
    "agg": obj.get("agg"),
    "canary_ref": ref_override if ref_override is not None
                  else min(obj["canary"]),
    "canary_samples": obj["canary"],
    "canary_worst_part": obj.get("canary_worst_part"),
    "note": ("single-window recapture (r17 protocol): every row from ONE "
             "two-pass Bench run in a canary-valid window. Minima are NO "
             "LONGER merged across rounds - the best-ever ratchet made "
             "honest fresh captures read 1.2-1.6x high and every gate "
             "discussion became weather forensics (r15/r16 verdicts). "
             "canary_ref gates future captures via tools/bench_gate.py "
             "(exit 2 = window invalid, re-run; distinct from exit 1 = "
             "regression)."),
    "queries": obj["queries"],
}
json.dump(out, open(dst, "w"), indent=1)
print(f"wrote {dst}: {len(out['queries'])} rows, "
      f"total {out['value']:.1f}s, canary_ref {out['canary_ref']:.3f}s "
      f"(samples {obj['canary']})")
