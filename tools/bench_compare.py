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
- canary-noise gating (round 11, ADVICE r10): the canary itself is a
  sub-second min-of-N and carries jitter (shipped r10 artifacts:
  noise up to 1.095; same-day spread 1.36x). When EITHER run's
  ``host_canary_noise_max_over_min`` exceeds NOISY_CANARY the tool
  refuses to normalize (raw ratios only, with a note). When it does
  normalize, the verdict is the CONSERVATIVE one: a subtotal is
  "within noise" only if BOTH the raw and the normalized ratio sit
  inside the ±15% band — a noisy canary can manufacture drift in
  either direction, so agreement is required before dismissing it.

Artifact formats accepted, newest first:
1. the full JSON document bench.py writes to .benchmarks/ (has
   "queries");
2. the compact summary line bench.py prints LAST since round 11
   ("compact": true — the only line guaranteed to survive the
   driver's 2,000-byte stdout tail intact);
3. a driver BENCH_r{N}.json wrapper: the LAST parseable JSON line in
   its "tail" is used (that is the compact line when present), else
   brace-matched section recovery from the truncated big line.
"""

from __future__ import annotations

import json
import sys

#: refuse host normalization past this canary self-noise (max/min of
#: the canary's own samples within one run)
NOISY_CANARY = 1.25


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


def _extract_num(text: str, key: str):
    anchor = text.find(f'"{key}":')
    if anchor < 0:
        return None
    frag = text[anchor + len(key) + 3 :]
    try:
        return float(frag.split(",")[0].split("}")[0].strip())
    except ValueError:
        return None


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc or doc.get("compact"):
        return doc
    # driver wrapper: the bench stdout is the (possibly front-truncated)
    # tail — prefer the LAST parseable JSON line (the round-11 compact
    # summary), then the full line if it survived, then section recovery
    tail = doc.get("tail", "")
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "subtotals" in parsed or "queries" in parsed:
            return parsed
    out = {}
    for key in ("queries", "subtotals", "streaming"):
        obj = _extract_obj(tail, key)
        if obj is not None:
            out[key] = obj
    for key in ("host_canary_sec", "host_canary_noise_max_over_min",
                "value"):
        v = _extract_num(tail, key)
        if v is not None:
            out[key] = v
    if "queries" not in out and "subtotals" not in out:
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
    na = a.get("host_canary_noise_max_over_min")
    nb = b.get("host_canary_noise_max_over_min")
    host = None
    noisy = max(na or 1.0, nb or 1.0)
    if ca and cb:
        if noisy > NOISY_CANARY:
            print(f"host canary: {ca:.2f} -> {cb:.2f} s, but canary "
                  f"self-noise {noisy:.2f} > {NOISY_CANARY} — NOT "
                  "normalizing (raw subtotal ratios below; re-run on a "
                  "quieter box before believing either direction)")
        else:
            host = cb / ca
            print(f"host canary: {ca:.2f} -> {cb:.2f} s "
                  f"(box B is {host:.2f}x box A's time on fixed work)")
    # Verdict rule (round-11 advice): requiring raw AND normalized to
    # agree defeats normalization exactly when it matters — on a
    # uniformly ~30% slower box every raw ratio is out of band. So:
    # - canary quiet (self-noise <= QUIET_CANARY) and host drift large
    #   (beyond the band): the canary is trustworthy and raw is known to
    #   be polluted by the host — trust the NORMALIZED ratio alone (raw
    #   still printed).
    # - canary mildly noisy, or host ~1 (raw and normalized should tell
    #   the same story): conservative raw-AND-normalized agreement.
    QUIET_CANARY = 1.1
    in_band = lambda r: 1 / 1.15 <= r <= 1.15  # noqa: E731
    trust_norm_only = (
        host is not None and noisy <= QUIET_CANARY and not in_band(host)
    )
    if host is not None:
        rule = ("normalized governs (quiet canary, large host drift)"
                if trust_norm_only else
                "verdicts require raw AND normalized to agree")
        print(f"  verdict rule: {rule}")
    subs_a, subs_b = a.get("subtotals", {}), b.get("subtotals", {})
    for k in sorted(set(subs_a) & set(subs_b)):
        raw = subs_b[k] / subs_a[k] if subs_a[k] else float("nan")
        norm = raw / host if host else None
        if trust_norm_only:
            ok = in_band(norm)
        else:
            # conservative: flag unless every available view is in band
            ok = in_band(raw) and (norm is None or in_band(norm))
        verdict = "within noise" if ok else "INVESTIGATE"
        extra = f" (norm {(norm - 1) * 100:+.0f}%)" if norm else ""
        print(f"  {k}: {subs_a[k]:.2f} -> {subs_b[k]:.2f} s "
              f"(raw {(raw - 1) * 100:+.0f}%){extra}  {verdict}")
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
