"""Noise-aware comparison of two bench.py JSON outputs.

Usage: python tools/bench_compare.py BENCH_r05.json BENCH_r06.json

Applies the measured noise model from PERF.md "Bench noise floor":
same-HEAD subtotals reproduce within ~±5% typically and ~±15% under
run-level co-tenant drift, single queries can swing 2-3x. So:

- subtotal drift <= 15%  -> "within noise"
- subtotal drift  > 15%  -> "INVESTIGATE" (re-run before believing it)
- per-query changes are only listed past 2.0x AND 0.5s absolute, the
  band real regressions clear but scheduler jitter rarely does
- a streaming row with events_total far below the configured feed is
  flagged untrustworthy (starved rate source, PERF.md)
- host normalization (round 10): when BOTH runs carry the fixed
  data-independent ``host_canary_sec`` row, every subtotal ratio is
  divided by the canary ratio first — a uniformly slower box (rounds
  8->9 measured ~30%) then reads as ~0% drift instead of a fleet of
  false INVESTIGATE flags. Raw ratios are still printed alongside.

The driver's BENCH_r{N}.json wraps the bench line under "tail"; this
tool accepts both the raw bench JSON line and the driver wrapper.
"""

from __future__ import annotations

import json
import sys


def _extract_obj(text: str, key: str):
    """Brace-matched extraction of '"key": {...}' from possibly
    front-truncated JSON text (driver tails cut the line's first bytes,
    so the document as a whole never parses)."""
    anchor = text.find(f'"{key}":')
    if anchor < 0:
        return None
    start = text.find("{", anchor)
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(text[start : i + 1])
                except json.JSONDecodeError:
                    return None
    return None


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    # driver wrapper: the bench line is the (possibly front-truncated)
    # tail of captured stdout — recover the sections we compare
    tail = doc.get("tail", "")
    start = tail.find('{"metric"')
    if start >= 0:
        try:
            return json.loads(tail[start:].splitlines()[0])
        except json.JSONDecodeError:
            pass
    out = {}
    for key in ("queries", "subtotals", "streaming"):
        obj = _extract_obj(tail, key)
        if obj is not None:
            out[key] = obj
    c = tail.find('"host_canary_sec":')
    if c >= 0:
        try:
            out["host_canary_sec"] = float(
                tail[c + 18 :].split(",")[0].split("}")[0].strip()
            )
        except ValueError:
            pass
    m = tail.find('"value":')
    if m >= 0:
        try:
            out["value"] = float(
                tail[m + 8 :].split(",")[0].strip()
            )
        except ValueError:
            pass
    if "queries" not in out:
        raise SystemExit(f"{path}: no bench JSON line found")
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    print(f"total: {a.get('value')} -> {b.get('value')} s "
          "(NOT comparable if the headline set grew — use subtotals)")
    ca, cb = a.get("host_canary_sec"), b.get("host_canary_sec")
    host = None
    if ca and cb:
        host = cb / ca
        print(f"host canary: {ca:.2f} -> {cb:.2f} s "
              f"(box B is {host:.2f}x box A's time on fixed work; "
              "subtotal ratios below are host-normalized)")
    subs_a, subs_b = a.get("subtotals", {}), b.get("subtotals", {})
    for k in sorted(set(subs_a) & set(subs_b)):
        raw = subs_b[k] / subs_a[k] if subs_a[k] else float("nan")
        ra = raw / host if host else raw
        verdict = (
            "within noise" if 1 / 1.15 <= ra <= 1.15 else "INVESTIGATE"
        )
        norm = f" (raw {(raw - 1) * 100:+.0f}%)" if host else ""
        print(f"  {k}: {subs_a[k]:.2f} -> {subs_b[k]:.2f} s "
              f"({(ra - 1) * 100:+.0f}%){norm}  {verdict}")
    qa, qb = a.get("queries", {}), b.get("queries", {})
    flagged = [
        (qb[q] / qa[q], q)
        for q in set(qa) & set(qb)
        if qa[q] > 0 and qb[q] / qa[q] >= 2.0 and qb[q] - qa[q] >= 0.5
    ]
    for r, q in sorted(flagged, reverse=True):
        print(f"  query {q}: {qa[q]:.2f} -> {qb[q]:.2f} s ({r:.1f}x) "
              "— beyond the 2x/0.5s jitter band")
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        print(f"  new queries in run B: {', '.join(only_b)}")
    for name, doc in (("A", a), ("B", b)):
        st = doc.get("streaming", {})
        tot = st.get("events_total")
        if tot is not None and tot < 100_000:
            print(f"  streaming row {name}: events_total={tot} — feed "
                  "was starved (PERF.md); do not compare this row")
    return 0


if __name__ == "__main__":
    sys.exit(main())
