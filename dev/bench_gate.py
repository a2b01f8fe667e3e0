#!/usr/bin/env python3
"""Cross-artifact bench regression gate.

Usage: dev/bench_gate.py BASELINE.json CURRENT.json [CURRENT2.json ...]

Round-over-round bench artifacts disagree across sessions (r12: the
driver-env run carried four phantom steady-state regressions that both
the builder closing run and the judge-idle run contradicted), so one
artifact's min cannot gate regressions by itself. The rule here: a
query is flagged ONLY if its timing exceeds 2x the baseline AND +0.5 s
in EVERY current artifact supplied — one noisy session can neither
fake nor mask a plan regression. Each flag prints the per-query raw
samples (Bench's `samples` field) so a consumer can see whether a
flagged min rests on one noisy sample.

Exit 0 = no cross-artifact regressions; exit 1 = at least one flag.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                if "queries" in d:
                    return d
    raise SystemExit(f"no bench JSON with a 'queries' map in {path}")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    base = load(sys.argv[1])
    curs = [(p, load(p)) for p in sys.argv[2:]]
    flags = {}
    for name, bt in base.get("queries", {}).items():
        if bt is None or bt < 0:
            continue
        # a query that FAILED (-1) or vanished in every current artifact
        # is the worst regression of all — flag it as such, never treat
        # it as "no timing, no problem"
        broken = [{"artifact": p, "sec": c.get("queries", {}).get(name)}
                  for p, c in curs
                  if c.get("queries", {}).get(name) is None
                  or c.get("queries", {}).get(name) < 0]
        if len(broken) == len(curs):
            flags[name] = {"baseline_sec": bt, "kind": "pass_to_fail",
                           "current": broken}
            continue
        # a baseline-passing query failing in SOME (not all) current
        # artifacts previously slipped through silently: pass_to_fail
        # requires every artifact broken and the slowdown loop clears on
        # any failed timing (ADVICE r13). An intermittent failure is a
        # real signal (flaky plan, OOM-adjacent, nondeterminism) — flag
        # it as its own non-silent kind.
        if broken:
            flags[name] = {"baseline_sec": bt, "kind": "intermittent_fail",
                           "current": broken,
                           "ok_in": [{"artifact": p,
                                      "sec": c.get("queries", {}).get(name)}
                                     for p, c in curs
                                     if c.get("queries", {}).get(name) is not None
                                     and c.get("queries", {}).get(name) >= 0]}
            continue
        hits = []
        for p, c in curs:
            ct = c.get("queries", {}).get(name)
            if ct is None or ct < 0 or not (ct > 2 * bt and ct > bt + 0.5):
                hits = []
                break
            hits.append({"artifact": p, "sec": ct,
                         "samples": c.get("samples", {}).get(name)})
        if hits:
            flags[name] = {"baseline_sec": bt, "kind": "slowdown",
                           "current": hits}
    verdict = {"metric": "bench_gate", "baseline": sys.argv[1],
               "artifacts": sys.argv[2:], "n_flagged": len(flags),
               "flags": flags}
    print(json.dumps(verdict, indent=2))
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
