"""Summarize jobs/hunt_r4.jsonl: best probe, best pair, distributions."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "jobs/hunt_r4.jsonl"
probes, pairs = [], []
for line in open(path):
    r = json.loads(line)
    if r["kind"] == "probe" and r.get("best") is not None:
        probes.append(r)
    elif r["kind"] == "scaling" and r.get("value") is not None:
        pairs.append(r)
if probes:
    best_p = min(probes, key=lambda r: r["best"])
    print(f"probes: n={len(probes)} best={best_p['best']}s @ {best_p['t']}")
    print("  all:", [r["best"] for r in probes])
if pairs:
    best_s = max(pairs, key=lambda r: r["value"])
    print(f"pairs:  n={len(pairs)} best_eff={best_s['value']} @ {best_s['t']}"
          f" (lo {best_s['sec_lo']}s hi {best_s['sec_hi']}s)")
    print("  all:", [r["value"] for r in pairs])
