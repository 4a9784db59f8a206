#!/usr/bin/env python3
"""Self-test for bench_diff.py — pins the classification semantics the
round-over-round gate rides on, against synthesized records:

  1. a genuine plan regression (median AND min AND normalized ratio
     all above threshold, clean ticks) must read PLAN and gate (exit 1)
  2. the same median inflation during a tick-visible load window
     (mt ticks elevated exactly around the query) must read LOAD?
     and NOT gate
  3. a query that passed before and fails now must gate
  4. mixed fidelity (old env-only, new interleaved) must fall back to
     the single-thread key and label each record's fidelity separately
  5. flagged queries print tickdist for both records

Run: python3 tools/test_bench_diff.py   (exits 0 iff all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
DIFF = os.path.join(HERE, "bench_diff.py")


def rec(queries, qmin, qt, ticks, env=None):
    return {
        "metric": "total", "value": sum(queries.values()), "unit": "sec",
        "queries": queries, "queries_min": qmin, "queries_t": qt,
        "calib_ticks": ticks,
        "env": env or {"calib_mt_ms_pre": 400, "calib_mt_ms_post": 400,
                       "calib_ms_pre": 340, "calib_ms_post": 340},
    }


def run(old, new):
    with tempfile.TemporaryDirectory() as d:
        po, pn = os.path.join(d, "o.json"), os.path.join(d, "n.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        p = subprocess.run([sys.executable, DIFF, po, pn],
                           capture_output=True, text=True)
        return p.returncode, p.stdout


def flat_ticks(ms, mt, ts=(0, 10, 20, 30)):
    return [{"done": i, "t": t, "ms": ms, "mt_ms": mt}
            for i, t in enumerate(ts)]


def main():
    failures = []

    def check(name, cond, detail=""):
        if not cond:
            failures.append(f"{name}: {detail}")

    # 1. true plan regression: clean ticks both sides, min moved too
    old = rec({"q1": 1.0, "q2": 0.5}, {"q1": 0.9, "q2": 0.45},
              {"q1": 5.0, "q2": 15.0}, flat_ticks(340, 400))
    new = rec({"q1": 3.0, "q2": 0.5}, {"q1": 2.8, "q2": 0.45},
              {"q1": 5.0, "q2": 15.0}, flat_ticks(340, 400))
    rc, out = run(old, new)
    check("plan-regression gates", rc == 1, f"rc={rc}")
    check("plan-regression labeled", "PLAN REGRESSION" in out and "q1" in out, out)

    # 2. same inflation but the new record's ticks are elevated around
    #    the query's window -> normalized ratio ~1 -> LOAD?, no gate
    loaded = [{"done": 0, "t": 0, "ms": 340, "mt_ms": 400},
              {"done": 1, "t": 4, "ms": 340, "mt_ms": 1200},
              {"done": 2, "t": 12, "ms": 340, "mt_ms": 1200},
              {"done": 3, "t": 30, "ms": 340, "mt_ms": 400}]
    new2 = rec({"q1": 3.0, "q2": 0.5}, {"q1": 2.8, "q2": 0.45},
               {"q1": 5.0, "q2": 15.0}, loaded)
    rc, out = run(old, new2)
    check("load window not gated", rc == 0, f"rc={rc}\n{out}")
    check("load window labeled", "LOAD?" in out and "PLAN" not in out, out)

    # 3. now-failing query gates
    new3 = rec({"q1": 1.0, "q2": -1.0}, {"q1": 0.9, "q2": -1.0},
               {"q1": 5.0, "q2": 15.0}, flat_ticks(340, 400))
    rc, out = run(old, new3)
    check("now-failing gates", rc == 1 and "NOW FAILING" in out, out)

    # 4. mixed fidelity: old has env only -> ms key, per-record labels
    old_env = rec({"q1": 1.0}, {"q1": 0.9}, {"q1": 5.0}, [])
    new_fine = rec({"q1": 1.0}, {"q1": 0.9}, {"q1": 5.0},
                   flat_ticks(340, 400))
    rc, out = run(old_env, new_fine)
    check("mixed fidelity labels", "whole-run env level" in out
          and "interleaved" in out, out)
    check("mixed fidelity key is ms", "ms ticks" in out and
          "mt_ms ticks" not in out, out)

    # 5. tickdist printed for flagged rows
    rc, out = run(old, new)
    check("tickdist printed", "tickdist[" in out, out)

    # ---- floors mode (r16 verdict item: the "floats" class) ----
    def rec_raw(raw, fail=()):
        qs = {q: sorted(v)[len(v) // 2] for q, v in raw.items()}
        qs.update({q: -1.0 for q in fail})
        return {
            "metric": "total", "value": sum(v for v in qs.values() if v > 0),
            "unit": "sec", "queries": qs,
            "queries_min": {q: (min(v) if q not in fail else -1.0)
                            for q, v in raw.items()},
            "queries_raw": {q: ([] if q in fail else list(v))
                            for q, v in raw.items()},
            "queries_t": {}, "calib_ticks": [],
            "env": {"calib_mt_ms_pre": 400, "calib_mt_ms_post": 400,
                    "calib_ms_pre": 340, "calib_ms_post": 340},
        }

    def run_floors(recs):
        with tempfile.TemporaryDirectory() as d:
            paths = []
            for i, r in enumerate(recs):
                p = os.path.join(d, f"r{i}.json")
                json.dump(r, open(p, "w"))
                paths.append(p)
            pr = subprocess.run(
                [sys.executable, DIFF, "--floors"] + paths,
                capture_output=True, text=True)
            return pr.returncode, pr.stdout

    # 6. one real regression among floats-class noise: exactly one flag.
    #    qfloat bounces 0.54<->1.15 across clean records (the r16 q61
    #    class) — candidate 1.1 is NOT elevated vs ALL history.
    #    qreg's floor is slow against every record AND >0.5s over best.
    b1 = rec_raw({"qreg": [1.0, 1.05, 1.1], "qfloat": [0.54, 0.6, 0.58],
                  "qsmall": [0.10, 0.11, 0.10]})
    b2 = rec_raw({"qreg": [1.02, 1.0, 1.08], "qfloat": [1.15, 1.1, 1.2],
                  "qsmall": [0.10, 0.12, 0.11]})
    cand = rec_raw({"qreg": [2.4, 2.5, 2.6], "qfloat": [1.1, 1.15, 1.12],
                    "qsmall": [0.30, 0.31, 0.30]})
    rc, out = run_floors([b1, b2, cand])
    check("floors: real regression gates", rc == 1, f"rc={rc}\n{out}")
    check("floors: exactly one flag",
          out.count("FLOOR REGRESSION") == 1 and "qreg" in out, out)
    check("floors: floats-class query not flagged", "qfloat" not in
          "".join(l for l in out.splitlines() if "FLOOR" in l), out)
    # 7. abs-delta guard: qsmall is 3x but only +0.2s — the r16 q212
    #    sub-second churn class must not flag
    check("floors: abs-delta kills sub-second churn", "qsmall" not in
          "".join(l for l in out.splitlines() if "FLOOR" in l), out)

    # 8. clean candidate: zero flags, exit 0
    clean = rec_raw({"qreg": [1.0, 1.1, 1.05], "qfloat": [0.6, 0.62, 0.61],
                     "qsmall": [0.10, 0.10, 0.11]})
    rc, out = run_floors([b1, b2, clean])
    check("floors: clean candidate passes", rc == 0
          and "0 floor regressions" in out, f"rc={rc}\n{out}")

    # 9. passed-in-history, failing-now gates in floors mode too
    failing = rec_raw({"qreg": [1.0, 1.1, 1.05], "qfloat": [0.6, 0.6, 0.6],
                       "qsmall": [0.1, 0.1, 0.1]}, fail={"qreg"})
    rc, out = run_floors([b1, b2, failing])
    check("floors: now-failing gates", rc == 1 and "NOW FAILING" in out
          and "qreg" in out, f"rc={rc}\n{out}")

    # 10./11. --recheck adjudication: a fresh in-band floor clears the
    #    flag (whole-session floats, exit 0); a fresh still-slow floor
    #    confirms the regression (exit 1)
    def run_floors_recheck(recs, recheck):
        with tempfile.TemporaryDirectory() as d:
            paths = []
            for i, r in enumerate(recs):
                p = os.path.join(d, f"r{i}.json")
                json.dump(r, open(p, "w"))
                paths.append(p)
            rp = os.path.join(d, "recheck.json")
            json.dump(recheck, open(rp, "w"))
            pr = subprocess.run(
                [sys.executable, DIFF, "--floors"] + paths
                + ["--recheck", rp],
                capture_output=True, text=True)
            return pr.returncode, pr.stdout

    fresh_ok = rec_raw({"qreg": [1.05, 1.1, 1.02]})
    rc, out = run_floors_recheck([b1, b2, cand], fresh_ok)
    check("recheck: in-band fresh floor clears", rc == 0
          and "FLOATS (cleared)" in out and "FLOOR REGRESSION" not in out,
          f"rc={rc}\n{out}")
    fresh_bad = rec_raw({"qreg": [2.5, 2.4, 2.6]})
    rc, out = run_floors_recheck([b1, b2, cand], fresh_bad)
    check("recheck: still-slow fresh floor confirms", rc == 1
          and "FLOOR REGRESSION" in out, f"rc={rc}\n{out}")

    # 12. a query dropped from the candidate is listed, not silent
    dropped = rec_raw({"qreg": [1.0, 1.1, 1.05],
                       "qsmall": [0.1, 0.1, 0.1]})
    rc, out = run_floors([b1, b2, dropped])
    check("floors: dropped query listed", rc == 0
          and "absent from candidate (1): qfloat" in out,
          f"rc={rc}\n{out}")

    # 13. ledger: floors only move down; provenance kept; candidate
    # adjudication flags against the all-history best
    with tempfile.TemporaryDirectory() as d:
        led = os.path.join(d, "bench_floors.json")
        r1 = os.path.join(d, "r1.json")
        r2 = os.path.join(d, "r2.json")
        json.dump(rec_raw({"qa": [1.0, 1.2, 1.1], "qb": [2.0, 2.2, 2.1]}),
                  open(r1, "w"))
        json.dump(rec_raw({"qa": [0.6, 3.0, 3.0], "qb": [9.0, 9.0, 9.0]}),
                  open(r2, "w"))
        subprocess.run([sys.executable, DIFF, "--update-ledger", led, r1],
                       capture_output=True, text=True)
        subprocess.run([sys.executable, DIFF, "--update-ledger", led, r2],
                       capture_output=True, text=True)
        got = json.load(open(led))
        check("ledger: min floor wins, inflated record can't raise",
              got["qa"]["floor"] == 0.6 and got["qb"]["floor"] == 2.0
              and got["qa"]["record"].endswith("r2.json")
              and got["qb"]["record"].endswith("r1.json"), str(got))
        # candidate: qa regressed (3.0 > 1.5x0.6 and > 0.6+0.5), qb in band
        cand_p = os.path.join(d, "cand.json")
        json.dump(rec_raw({"qa": [3.0, 3.1, 3.2], "qb": [2.1, 2.2, 2.3]}),
                  open(cand_p, "w"))
        pr = subprocess.run([sys.executable, DIFF, "--ledger", led, cand_p],
                            capture_output=True, text=True)
        check("ledger: regression gates, in-band passes",
              pr.returncode == 1 and "FLOOR REGRESSION" in pr.stdout
              and "qa" in pr.stdout and "qb" not in
              [l.split()[2] for l in pr.stdout.splitlines()
               if l.startswith("FLOOR")],
              f"rc={pr.returncode}\n{pr.stdout}")
        check("ledger: headline sums printed",
              "SUM(ledger floors)" in pr.stdout, pr.stdout)

    if failures:
        print("FAIL\n" + "\n".join(failures))
        sys.exit(1)
    print("bench_diff self-test: 15 checks OK")


if __name__ == "__main__":
    main()
