"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python tools/bench_compare.py BENCH_r1.json BENCH_r2.json [--threshold 0.2]

Prints one line per query with the delta, sorted worst-first, and exits
non-zero if any query regressed more than the threshold (default +20%)
AND by more than 0.3s absolute (ignores jitter on sub-second queries).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept bench.py's one-JSON-line output OR the driver's BENCH_r{N}
    wrapper ({"n", "rc", ..., "parsed": {bench json}})."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if "queries" in doc:
                return doc
            if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
                return doc["parsed"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 0.2
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((0.0, name, a, b, "added" if a is None else "removed"))
            continue
        delta = (b - a) / a if a > 0 else 0.0
        flag = "REGRESSED" if (delta > threshold and b - a > 0.3) else ""
        rows.append((delta, name, a, b, flag))
    rows.sort(reverse=True)
    for delta, name, a, b, flag in rows:
        fa = "-" if a is None else f"{a:.3f}"
        fb = "-" if b is None else f"{b:.3f}"
        print(f"{name:35s} {fa:>8} -> {fb:>8}  {delta:+7.1%} {flag}")
    print(
        f"{'TOTAL':35s} {old['value']:8.3f} -> {new['value']:8.3f}  "
        f"{(new['value'] - old['value']) / old['value']:+7.1%}"
    )
    return 1 if any(r[4] == "REGRESSED" for r in rows) else 0


if __name__ == "__main__":
    sys.exit(main())
