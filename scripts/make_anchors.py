#!/usr/bin/env python3
"""Generate the machine-readable anchors.json from a graft.Bench JSON
line (replaces BASELINE.md's prose-addendum sprawl as the round-gate
instrument — one CURRENT min+median per query, no stale rows).

Usage:
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' > /tmp/bench.json
  python3 scripts/make_anchors.py /tmp/bench.json anchors.json

Re-anchoring policy (mirrors BASELINE.md): only regenerate from a
multi-sample (>= 10 preferred) sweep on a quiesced box; a single noisy
pass must never become the anchor a future round is graded against.
"""
import json, sys, datetime


def main(bench_path: str, out_path: str) -> int:
    line = next(l for l in open(bench_path) if '"metric"' in l)
    b = json.loads(line)
    qmin = b["queries_min"]
    qmed = b["queries"]
    anchors = {
        q: {"min": round(qmin[q], 3), "median": round(qmed[q], 3)}
        for q in sorted(qmin)
        if qmin[q] >= 0
    }
    doc = {
        "generated": datetime.date.today().isoformat(),
        "sf": b.get("sf"),
        "samples": b.get("samples"),
        # timed action: "fold" = xxhash64 over every output value (since
        # 2026-08-14); earlier anchors used count(), which Catalyst can
        # collapse to a scan for projection-shaped queries — the two
        # metrics are not comparable per-query
        "action": b.get("action", "count"),
        "total_min": round(b.get("total_min", -1), 1),
        # host-health stamp of the sweep the anchors came from (present
        # since round 15): a future reader comparing against these
        # anchors can check the BASELINE they derive from was taken on
        # a healthy box (pre ctx_switch_us <= ~6, steal ~0)
        "box": b.get("box"),
        "anchors": anchors,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}: {len(anchors)} anchors, "
          f"samples={doc['samples']}, total_min={doc['total_min']}s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "anchors.json"))
