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

Since r15 Bench records interleaved calibration ticks (`calib_ticks`)
and per-query start offsets (`queries_t`). When a record carries them,
each query's seconds are normalized by the calibration level at its own
wall-clock moment (interpolated between the bracketing ticks, relative
to the record's cleanest tick), and the verdict uses the NORMALIZED
ratio — a sustained mid-run load window (the r14 q147-q233 block) then
reads as LOAD mechanically instead of by adjudication.

Verdict per regressed query:
  PLAN  — min ratio ALSO above threshold AND (when ticks exist) the
          calib-normalized median ratio is above threshold too: the
          work itself grew; this is the gate-red case
  LOAD? — median above but the min or the calib-normalized ratio says
          the box, not the plan

Exit 1 iff any PLAN regression (unless --no-gate). Improvements and
added/removed queries are listed informationally.

FLOORS MODE (r16 verdict item — the "floats" class):
  python3 tools/bench_diff.py --floors BASE1.json [BASE2.json ...] NEW.json

Twice-demonstrated failure mode of single-record compares: a host
state inflates Spark wall time while BOTH fixed-work calibration loops
read flat, so an untouched query bounces 0.5-1.2 s across clean
records (r16: q61/q211/q212) and every round someone adjudicates the
flags by hand. The mechanized form of that adjudication: compare the
candidate's per-query FLOOR (min over the record's raw runs) against
the floors of the N most recent clean records, and flag only a query
  - elevated above threshold x EVERY baseline record's floor, AND
  - by more than --abs-delta seconds (default 0.5) over the best-case
    baseline — sub-second ratio churn stops consuming judge time.
A floats-class query is fast in at least one baseline record only when
the candidate also reaches a comparable floor; a real plan regression
is slow against ALL of history. Exit 1 iff any floor regression or
now-failing query (unless --no-gate).

The residual floats case — a whole-SESSION host state inflating even a
record's three raw runs at flat calibration (r16 q61: driver floor
1.04 s vs committed floors 0.52-0.68) — is indistinguishable from a
plan change inside the records alone. The adjudication the judge ran
by hand (re-run the flagged query fresh) is mechanized by --recheck:
  SPARK_GRAFT_BENCH_QUERIES=q61_analytic_ranks SPARK_GRAFT_BENCH_OUT=\
    /tmp/recheck.json sbt "runMain graft.Bench"   # on a quiet box
  python3 tools/bench_diff.py --floors BASE... NEW.json \
    --recheck /tmp/recheck.json
A flagged query whose FRESH floor is back inside the band (<= threshold
x best baseline floor + abs-delta) clears to FLOATS and stops gating;
one that stays slow on a fresh run is a confirmed regression.

FLOORS LEDGER (r17 verdict item #1 — make the record load-independent):
a committed per-query best-known-floor table, bench_floors.json:
  {"<query>": {"floor": 1.234, "record": "...", "calib_mt_ms_pre": 360,
               "load1_pre": 0.4, "sf": "..."}}
Floors only MOVE DOWN (ambient load can only inflate a run, never
deflate it), so folding any record in is safe — the min over all
history is the closest observable to the engine's true cost on this
box. Two commands:

  # fold one or more records into the ledger (creates it if absent)
  python3 tools/bench_diff.py --update-ledger bench_floors.json R1.json [R2.json ...]

  # adjudicate a candidate record against the ledger (exit 1 on
  # regressions unless --no-gate); prints the ledger-floors headline
  # SUM(ledger floor) and the candidate's per-query delta against it
  python3 tools/bench_diff.py --ledger bench_floors.json NEW.json

A candidate query flags iff its floor > threshold x ledger floor AND
> ledger floor + abs-delta (the floors-mode criteria against the
all-history best instead of N recent records); --recheck clears
floats-class flags exactly as in floors mode.
"""
import argparse
import json
import sys


def parse_args():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("records", nargs="+", metavar="RECORD",
                   help="bench records; two (OLD NEW) in default mode, "
                        "N baselines + 1 candidate with --floors")
    p.add_argument("--threshold", type=float, default=1.5,
                   help="regression ratio on per-query medians (default 1.5)")
    p.add_argument("--no-gate", action="store_true",
                   help="always exit 0, even on PLAN regressions")
    p.add_argument("--floors", action="store_true",
                   help="floors mode: candidate floor vs every baseline "
                        "record's floor (see module doc)")
    p.add_argument("--abs-delta", type=float, default=0.5,
                   help="floors mode: minimum absolute seconds over the "
                        "best baseline floor to flag (default 0.5)")
    p.add_argument("--recheck", metavar="RECORD",
                   help="floors mode: a fresh subset bench record of the "
                        "flagged queries; flags whose fresh floor is back "
                        "in band clear to FLOATS")
    p.add_argument("--update-ledger", metavar="LEDGER",
                   help="fold the records' per-query floors into LEDGER "
                        "(bench_floors.json), keeping the min + provenance")
    p.add_argument("--ledger", metavar="LEDGER",
                   help="adjudicate ONE candidate record against LEDGER "
                        "floors; prints the ledger headline and deltas")
    return p.parse_args()


def load_ledger(path):
    try:
        return json.load(open(path))
    except FileNotFoundError:
        return {}


def update_ledger(ledger_path, record_paths):
    led = load_ledger(ledger_path)
    changed = 0
    for rp in record_paths:
        rec = load_record(rp)
        env = rec.get("env") or {}
        if isinstance(env, str):
            env = {}
        prov = {
            "record": rp,
            "calib_mt_ms_pre": env.get("calib_mt_ms_pre"),
            "load1_pre": env.get("load1_pre"),
            "sf": rec.get("sf"),
        }
        for q, f in floors_of(rec).items():
            if not f:
                continue
            cur = led.get(q)
            if cur is None or f < cur.get("floor", float("inf")):
                led[q] = dict(floor=round(f, 3), **prov)
                changed += 1
    json.dump(dict(sorted(led.items())), open(ledger_path, "w"), indent=1)
    print(f"{ledger_path}: {len(led)} queries, {changed} floors "
          f"lowered/added from {len(record_paths)} record(s)")


def ledger_mode(ledger_path, new_path, threshold, abs_delta, gate,
                recheck_path=None):
    led = load_ledger(ledger_path)
    if not led:
        sys.exit(f"{ledger_path}: empty or missing ledger")
    new = floors_of(load_record(new_path))
    print(f"ledger mode: candidate {new_path} vs {ledger_path} "
          f"({len(led)} queries); flag iff floor > {threshold}x ledger "
          f"AND > ledger + {abs_delta}s")
    regs, failing, no_history = [], [], []
    common = 0
    led_sum = cand_sum = 0.0
    for q in sorted(set(led) | set(new)):
        lf = led.get(q, {}).get("floor")
        nf = new.get(q)
        if lf is None:
            if nf:
                no_history.append(q)
            continue
        if q not in new:
            continue  # subset candidate: absent queries aren't failures
        if nf is None:
            failing.append(q)
            continue
        common += 1
        led_sum += lf
        cand_sum += nf
        if nf > threshold * lf and nf - lf > abs_delta:
            regs.append((q, nf, lf))
    cleared = []
    if recheck_path and regs:
        fresh = floors_of(load_record(recheck_path))
        still = []
        for q, nf, lf in regs:
            ff = fresh.get(q)
            if ff and not (ff > threshold * lf and ff - lf > abs_delta):
                cleared.append((q, nf, ff, lf))
            else:
                still.append((q, ff if ff else nf, lf))
        regs = still
    for q in failing:
        print(f"{'NOW FAILING':16s} {q}")
    for q, nf, lf in sorted(regs, key=lambda t: -(t[1] / t[2])):
        prov = led[q]
        print(f"{'FLOOR REGRESSION':16s} {q:32s} floor {nf:.3f}s vs "
              f"ledger {lf:.3f}s (x{nf / lf:.2f}; ledger from "
              f"{prov.get('record')})")
    for q, nf, ff, lf in cleared:
        print(f"{'FLOATS (cleared)':16s} {q:32s} record floor {nf:.3f}s, "
              f"fresh recheck {ff:.3f}s vs ledger {lf:.3f}s")
    if regs and not recheck_path:
        qs = ",".join(q for q, *_ in regs)
        print(f"\nadjudicate on a quiet box:\n"
              f"  SPARK_GRAFT_BENCH_QUERIES={qs} "
              f"SPARK_GRAFT_BENCH_OUT=/tmp/recheck.json "
              f"sbt -batch 'runMain graft.Bench'\n"
              f"  then re-run with --recheck /tmp/recheck.json")
    if no_history:
        print(f"\nnot in ledger ({len(no_history)}): "
              + ", ".join(no_history))
    print(f"\nledger headline over the {common} common queries: "
          f"SUM(ledger floors) = {led_sum:.3f}s; candidate floors = "
          f"{cand_sum:.3f}s (x{cand_sum / led_sum:.3f} of ledger)"
          if common else "\nno common queries")
    print(f"{len(new)} candidate queries, {len(failing)} now failing, "
          f"{len(regs)} floor regressions, {len(cleared)} cleared by "
          f"recheck")
    sys.exit(1 if ((regs or failing) and gate) else 0)


def load_record(path):
    d = json.load(open(path))
    # driver BENCH_r{N}.json wraps the bench record under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def floors_of(rec):
    """Per-query floor: min over the record's raw runs (queries_raw),
    falling back to queries_min, then the median. None for failed or
    absent queries (non-positive values)."""
    out = {}
    raw = rec.get("queries_raw") or {}
    qmin = rec.get("queries_min") or {}
    qmed = rec.get("queries") or {}
    for q in set(raw) | set(qmin) | set(qmed):
        vals = [v for v in (raw.get(q) or []) if isinstance(v, (int, float))
                and v > 0]
        f = min(vals) if vals else None
        if f is None:
            for src in (qmin, qmed):
                v = src.get(q)
                if isinstance(v, (int, float)) and v > 0:
                    f = v
                    break
        out[q] = f
    return out


def floors_mode(paths, threshold, abs_delta, gate, recheck_path=None):
    *base_paths, new_path = paths
    bases = [(p, floors_of(load_record(p))) for p in base_paths]
    new = floors_of(load_record(new_path))
    print(f"floors mode: candidate {new_path} vs "
          f"{len(bases)} baseline record(s); flag iff floor > "
          f"{threshold}x EVERY baseline floor AND > best baseline "
          f"+ {abs_delta}s")
    for p, f in bases:
        n_ok = sum(1 for v in f.values() if v)
        print(f"  baseline {p}: {n_ok} queries with floors")

    regs, failing, no_history = [], [], []
    for q in sorted(new):
        nf = new[q]
        hist = [f[q] for _, f in bases if q in f]
        hist_ok = [h for h in hist if h]
        if not hist_ok:
            if nf:
                no_history.append(q)
            continue
        if nf is None:
            # present-and-passing in history, failed/absent now
            failing.append(q)
            continue
        best = min(hist_ok)
        if (all(nf > threshold * h for h in hist_ok)
                and nf - best > abs_delta):
            regs.append((q, nf, best, hist_ok))

    # --recheck: a fresh subset record adjudicates whole-session floats —
    # a flagged query whose FRESH floor is back inside the band (what the
    # r16 judge verified by hand-re-running every flag) clears
    cleared = []
    if recheck_path and regs:
        fresh = floors_of(load_record(recheck_path))
        still = []
        for q, nf, best, hist_ok in regs:
            ff = fresh.get(q)
            if ff and not (all(ff > threshold * h for h in hist_ok)
                           and ff - best > abs_delta):
                cleared.append((q, nf, ff, best))
            else:
                still.append((q, ff if ff else nf, best, hist_ok))
        regs = still

    for q in failing:
        print(f"{'NOW FAILING':16s} {q}")
    for q, nf, best, hist_ok in sorted(regs, key=lambda t: -(t[1] / t[2])):
        floors = ", ".join(f"{h:.3f}" for h in sorted(hist_ok))
        print(f"{'FLOOR REGRESSION':16s} {q:32s} floor {nf:.3f}s vs "
              f"[{floors}] (x{nf / best:.2f} over best)")
    for q, nf, ff, best in cleared:
        print(f"{'FLOATS (cleared)':16s} {q:32s} record floor {nf:.3f}s, "
              f"fresh recheck {ff:.3f}s vs best baseline {best:.3f}s")
    if regs and not recheck_path:
        qs = ",".join(q for q, *_ in regs)
        print(f"\nadjudicate on a quiet box:\n"
              f"  SPARK_GRAFT_BENCH_QUERIES={qs} "
              f"SPARK_GRAFT_BENCH_OUT=/tmp/recheck.json "
              f"sbt -batch 'runMain graft.Bench'\n"
              f"  then re-run this command with --recheck /tmp/recheck.json")
    if no_history:
        print(f"\nno baseline floors ({len(no_history)}): "
              + ", ".join(no_history))
    # queries in history but entirely absent from the candidate record:
    # not gated (headliner-list edits are deliberate) but never silent —
    # a dropped query must be visible in the output
    absent = sorted({q for _, f in bases for q in f} - set(new))
    if absent:
        print(f"absent from candidate ({len(absent)}): "
              + ", ".join(absent))
    print(f"\n{len(new)} candidate queries, {len(failing)} now failing, "
          f"{len(regs)} floor regressions, {len(cleared)} cleared by "
          f"recheck")
    sys.exit(1 if ((regs or failing) and gate) else 0)


def calib(d):
    e = d.get("env", {})
    return (f"calib_mt {e.get('calib_mt_ms_pre', '?')}->"
            f"{e.get('calib_mt_ms_post', '?')}ms "
            f"load1 {e.get('load1_pre', '?')}->{e.get('load1_post', '?')}")


def tick_points(rec, key="ms"):
    """(t, <key>) calibration samples from a record: the interleaved
    calib_ticks when present (r15+; key "ms" = single-thread, "mt_ms" =
    all-threads), else the pre/post env values (two pseudo-ticks — no
    per-query placement, but enough for a whole-run level)."""
    ticks = rec.get("calib_ticks") or []
    pts = sorted((t["t"], t[key]) for t in ticks
                 if isinstance(t, dict) and t.get(key, 0) > 0
                 and isinstance(t.get("t"), (int, float)))
    if pts:
        return pts
    e = rec.get("env", {})
    env_key = "calib_mt_ms" if key == "mt_ms" else "calib_ms"
    pre, post = e.get(f"{env_key}_pre"), e.get(f"{env_key}_post")
    out = []
    if isinstance(pre, (int, float)) and pre > 0:
        out.append((0.0, float(pre)))
    if isinstance(post, (int, float)) and post > 0:
        out.append((1e18, float(post)))
    return out


def pick_tick_key(*recs):
    """Normalize by the ALL-THREADS loop when every record carries
    INTERLEAVED mt ticks (r15 finding: a host granting fewer parallel
    cores inflates every Spark query while the single-thread loop stays
    flat — st ticks mislabel that as PLAN), else fall back to
    single-thread. Interleaved-only, not env pseudo-ticks: an old
    env-only record paired with a new fine-ticked one used to force
    mt-on-2-whole-run-points for BOTH sides and mislabel the fine side
    as whole-run (r15 ADVICE item) — with ms, tick_points still gives
    the fine side its per-moment placement."""
    return ("mt_ms" if all(has_real_ticks(r, "mt_ms") for r in recs)
            else "ms")


def has_real_ticks(rec, key):
    """True only for records with INTERLEAVED per-query-placed ticks
    (r15+) — the env pre/post pseudo-ticks give a whole-run level, not
    per-moment placement, and the output labels must not claim more
    than the record carries."""
    return any(isinstance(t, dict) and t.get(key, 0) > 0
               for t in (rec.get("calib_ticks") or []))


def tick_dist_fn(rec, key):
    """Seconds from a query's start offset to the nearest INTERLEAVED
    tick in `rec` — the reader's attribution confidence: a flagged
    query whose window sits 100 s from the nearest sample (the r15
    driver record's failure mode at tick-every-10) can't be trusted to
    normalize; one bracketed within a few seconds can. None when the
    record lacks interleaved ticks or the query has no start offset."""
    pts = [(t["t"]) for t in (rec.get("calib_ticks") or [])
           if isinstance(t, dict) and t.get(key, 0) > 0
           and isinstance(t.get("t"), (int, float))]
    qt = rec.get("queries_t") or {}

    def dist(q):
        ts = qt.get(q)
        if ts is None or not pts:
            return None
        return min(abs(ts - p) for p in pts)

    return dist


def norm_factor_fn(rec, base, key="ms"):
    """Per-query load factor: calibration ms at the query's own start
    offset (linear interpolation between bracketing ticks) over `base`
    — the cleanest tick across BOTH records. The tick loop is fixed
    work, so on the one driver box its idle time is a machine constant
    and a cross-record base is valid; a uniform whole-run load window
    (invisible within one record) then still reads as load. Factor is
    >= 1 by construction of base; 1.0 when the record has no samples."""
    pts = tick_points(rec, key)
    qt = rec.get("queries_t") or {}
    if not pts or not base or base <= 0:
        return lambda q: 1.0
    mean_ms = sum(ms for _, ms in pts) / len(pts)

    def at(ts):
        if ts is None:
            ms = mean_ms  # legacy record: no per-query placement
        elif ts <= pts[0][0]:
            ms = pts[0][1]
        elif ts >= pts[-1][0]:
            ms = pts[-1][1]
        else:
            ms = pts[-1][1]
            for (t0, m0), (t1, m1) in zip(pts, pts[1:]):
                if t0 <= ts <= t1:
                    f = (ts - t0) / (t1 - t0) if t1 > t0 else 0.0
                    ms = m0 + f * (m1 - m0)
                    break
        return max(1.0, ms / base)

    return lambda q: at(qt.get(q))


def main():
    a = parse_args()
    threshold = a.threshold
    if a.update_ledger:
        update_ledger(a.update_ledger, a.records)
        return
    if a.ledger:
        if len(a.records) != 1:
            sys.exit("--ledger takes exactly one candidate record")
        ledger_mode(a.ledger, a.records[0], threshold, a.abs_delta,
                    not a.no_gate, a.recheck)
        return
    if a.floors:
        if len(a.records) < 2:
            sys.exit("--floors needs at least one baseline + a candidate")
        floors_mode(a.records, threshold, a.abs_delta, not a.no_gate,
                    a.recheck)
        return
    if len(a.records) != 2:
        sys.exit("default mode takes exactly OLD.json NEW.json "
                 "(use --floors for N baselines)")

    old = load_record(a.records[0])
    new = load_record(a.records[1])

    oq, nq = old.get("queries", {}), new.get("queries", {})
    omin, nmin = old.get("queries_min", {}), new.get("queries_min", {})
    tkey = pick_tick_key(old, new)
    all_ms = [ms for rec in (old, new) for _, ms in tick_points(rec, tkey)]
    base = min(all_ms) if all_ms else None
    ofac = norm_factor_fn(old, base, tkey)
    nfac = norm_factor_fn(new, base, tkey)
    have_ticks = base is not None and (
        tick_points(old, tkey) and tick_points(new, tkey))

    def fidelity(rec):
        return ("interleaved" if has_real_ticks(rec, tkey)
                else "whole-run env level")

    print(f"old: {a.records[0]} total={old.get('value')}s  [{calib(old)}] "
          f"ticks: {fidelity(old)}")
    print(f"new: {a.records[1]} total={new.get('value')}s  [{calib(new)}] "
          f"ticks: {fidelity(new)}")
    if have_ticks:
        print(f"threshold: {threshold}x on per-query medians "
              f"(calib-normalized verdicts, {tkey} ticks; per-record "
              f"fidelity above)\n")
    else:
        print(f"threshold: {threshold}x on per-query medians\n")
    odist = tick_dist_fn(old, tkey)
    ndist = tick_dist_fn(new, tkey)

    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    plan_regs, load_regs, improved, failed_new = [], [], [], []
    for q in common:
        old_ok = bool(oq[q]) and oq[q] > 0
        new_ok = bool(nq[q]) and nq[q] > 0
        if old_ok and not new_ok:
            # the worst regression class: passed before, FAILS now
            # (Bench records -1.0 medians for failed queries) — must
            # gate, not silently drop from the comparison
            failed_new.append(q)
            continue
        if not old_ok or not new_ok:
            continue
        r = nq[q] / oq[q]
        rnorm = (nq[q] / nfac(q)) / (oq[q] / ofac(q))
        rmin = None
        if q in omin and q in nmin and omin[q] and omin[q] > 0:
            rmin = nmin[q] / omin[q]
        if r > threshold:
            # PLAN only when every load-rejecting signal agrees the
            # work itself grew: the floor moved AND (if measurable)
            # the calibration-normalized ratio is still regressed
            if (rmin is not None and rmin > threshold
                    and rnorm > threshold):
                plan_regs.append((q, r, rmin, rnorm))
            else:
                load_regs.append((q, r, rmin, rnorm))
        elif r < 1.0 / threshold:
            improved.append((q, r, rmin, rnorm))

    for q in sorted(failed_new):
        print(f"{'NOW FAILING':16s} {q:32s} {oq[q]:7.3f}s -> FAILED")
    for tag, rows in (("PLAN REGRESSION", plan_regs), ("LOAD?", load_regs),
                      ("IMPROVED", improved)):
        flagged = tag != "IMPROVED"
        for q, r, rmin, rnorm in sorted(rows, key=lambda t: -t[1]):
            m = f" min x{rmin:.2f}" if rmin is not None else " min n/a"
            nrm = f" norm x{rnorm:.2f}" if have_ticks else ""
            td = ""
            if flagged:
                # attribution confidence: how far each record's nearest
                # interleaved tick sits from this query's own window
                parts = []
                for lbl, d in (("old", odist(q)), ("new", ndist(q))):
                    parts.append(f"{lbl} {d:.0f}s" if d is not None
                                 else f"{lbl} n/a")
                td = " tickdist[" + ", ".join(parts) + "]"
            print(f"{tag:16s} {q:32s} {oq[q]:7.3f}s -> {nq[q]:7.3f}s "
                  f"(x{r:.2f}{m}{nrm}){td}")

    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(
            f"{q}={nq[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    print(f"\n{len(common)} common queries, {len(failed_new)} now "
          f"failing, {len(plan_regs)} plan regressions, "
          f"{len(load_regs)} load-suspect, {len(improved)} improved")
    sys.exit(1 if ((plan_regs or failed_new) and not a.no_gate) else 0)


if __name__ == "__main__":
    main()
