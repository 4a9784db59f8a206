#!/usr/bin/env python3
"""Per-query bench-regression tripwire.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]
       [--no-gate]

Diffs two Bench outputs (bench_last.json format) query by query and
prints every query whose NEW median exceeds THRESHOLD x its OLD median,
with the per-query min ratio and both runs' calib_mt context so load
can be attributed (the q203-r12 lesson: medians move with box load;
minima and calibration tell you whether the plan changed). The q274-r13
class of defect — unchanged plan SHAPE, doubled expression work — is
invisible to PlanAudit and hides inside the total; only a per-query
round-over-round diff sees it.

Verdict per regressed query:
  PLAN  — min ratio ALSO above threshold (both runs' floor moved: the
          work itself grew; this is the gate-red case)
  LOAD? — median above but min overlaps the old run (consistent with a
          loaded box; check calib_mt before acting)

Exit 1 iff any PLAN regression (unless --no-gate). Improvements and
added/removed queries are listed informationally.
"""
import json
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = [a for a in sys.argv[1:] if a.startswith("--")]
if len(args) < 2:
    print(__doc__)
    sys.exit(2)
threshold = 1.5
for f in flags:
    if f.startswith("--threshold"):
        threshold = float(f.split("=", 1)[1]) if "=" in f else 1.5
gate = "--no-gate" not in flags

old = json.load(open(args[0]))
new = json.load(open(args[1]))
if "--threshold" in flags:
    i = sys.argv.index("--threshold")
    threshold = float(sys.argv[i + 1])

oq, nq = old.get("queries", {}), new.get("queries", {})
omin, nmin = old.get("queries_min", {}), new.get("queries_min", {})


def calib(d):
    e = d.get("env", {})
    return (f"calib_mt {e.get('calib_mt_ms_pre', '?')}->"
            f"{e.get('calib_mt_ms_post', '?')}ms "
            f"load1 {e.get('load1_pre', '?')}->{e.get('load1_post', '?')}")


print(f"old: {args[0]} total={old.get('value')}s  [{calib(old)}]")
print(f"new: {args[1]} total={new.get('value')}s  [{calib(new)}]")
print(f"threshold: {threshold}x on per-query medians\n")

common = sorted(set(oq) & set(nq))
added = sorted(set(nq) - set(oq))
removed = sorted(set(oq) - set(nq))

plan_regs, load_regs, improved = [], [], []
for q in common:
    if not oq[q] or oq[q] <= 0:
        continue
    r = nq[q] / oq[q]
    rmin = None
    if q in omin and q in nmin and omin[q] and omin[q] > 0:
        rmin = nmin[q] / omin[q]
    if r > threshold:
        # floor also moved => the work grew, not the box
        if rmin is not None and rmin > threshold:
            plan_regs.append((q, r, rmin))
        else:
            load_regs.append((q, r, rmin))
    elif r < 1.0 / threshold:
        improved.append((q, r, rmin))

for tag, rows in (("PLAN REGRESSION", plan_regs), ("LOAD?", load_regs),
                  ("IMPROVED", improved)):
    for q, r, rmin in sorted(rows, key=lambda t: -t[1]):
        m = f" min x{rmin:.2f}" if rmin is not None else " min n/a"
        print(f"{tag:16s} {q:32s} {oq[q]:7.3f}s -> {nq[q]:7.3f}s "
              f"(x{r:.2f}{m})")

if added:
    print(f"\nadded ({len(added)}): " + ", ".join(
        f"{q}={nq[q]:.2f}s" for q in added))
if removed:
    print(f"removed ({len(removed)}): " + ", ".join(removed))

print(f"\n{len(common)} common queries, {len(plan_regs)} plan regressions, "
      f"{len(load_regs)} load-suspect, {len(improved)} improved")
sys.exit(1 if (gate and plan_regs) else 0)
