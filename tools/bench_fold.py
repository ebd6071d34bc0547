"""Fold bench runs into BENCH_idle_reference.json (per-query bests).

The reference is per-query BEST-OBSERVED because host load varies
1.5-3x run-to-run (NOTES.md): totals are meaningless, per-query minima
are the stable signal. Usage:

    python tools/bench_fold.py run1.json [run2.json ...] [--reset q1,q2]

- existing queries only ever get FASTER in the reference (min fold)
- queries present in runs but absent from the reference are added
- --reset NAMES re-baselines those queries to the minimum across the
  given runs even if slower (use after an intentional algorithm change,
  e.g. round 3's banded bitext_margin_mining)

Rewrites BENCH_idle_reference.json in place and prints the changes.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = REPO / "BENCH_idle_reference.json"


def load_queries(path: str) -> dict[str, float]:
    text = pathlib.Path(path).read_text()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if "queries" in doc:
                return doc["queries"]
            if isinstance(doc.get("parsed"), dict):
                return doc["parsed"]["queries"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    args = sys.argv[1:]
    reset: set[str] = set()
    if "--reset" in args:
        i = args.index("--reset")
        reset = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    if not args:
        print(__doc__)
        return 2
    runs = [load_queries(a) for a in args]
    ref = json.loads(REF.read_text())
    q = ref["queries"]
    changes = []
    names = set(q) | {n for r in runs for n in r}
    for name in sorted(names):
        observed = [r[name] for r in runs if name in r]
        if not observed:
            continue
        best = min(observed)
        if name in reset or name not in q:
            verb = "reset" if name in q else "added"
            if q.get(name) != best:
                changes.append(f"{verb:6s} {name}: {q.get(name)} -> {best}")
                q[name] = best
        elif best < q[name]:
            changes.append(f"lower  {name}: {q[name]} -> {best}")
            q[name] = best
    ref["value"] = round(sum(q.values()), 3)
    REF.write_text(json.dumps(ref) + "\n")
    print("\n".join(changes) if changes else "no changes")
    print(f"total (sum of bests): {ref['value']}s over {len(q)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
