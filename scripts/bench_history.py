#!/usr/bin/env python3
"""Decode a round's BENCH_r{N}.json into bench_history/bench_r{N}.json.

The driver's BENCH artifact keeps only the last ~2000 stdout chars
("tail"). Since round 5 the compact bench line carries the FULL per-query
median map as gzip+base64 (`queries_gz_b64`); this script extracts and
decodes it so round-over-round regressions are diffable over the whole
registry, not just the tail-visible queries.

Usage: python3 scripts/bench_history.py BENCH_r05.json [BENCH_r06.json ...]
Writes bench_history/bench_r{N}.json: {"total": sec|null, "queries":
{name: median_sec}} sorted by name. For a local run, point it at a file
containing the compact line (e.g. target/bench.json works too — it has a
plain "queries" map).
"""
import base64
import gzip
import json
import re
import sys


def decode(path):
    raw = open(path).read()
    try:
        tail = json.loads(raw).get("tail", raw)
    except json.JSONDecodeError:
        tail = raw
    m = re.search(r'"queries_gz_b64":"([A-Za-z0-9+/=]+)"', tail)
    omitted = None
    if m:
        queries = json.loads(gzip.decompress(base64.b64decode(m.group(1))))
        # r8+ integer-tick encoding: "_scale" ticks/second, entries below
        # "_thr_cs" centiseconds dropped with their count in
        # "_omitted_below" (pre-r8 blobs carried plain float seconds)
        scale = queries.pop("_scale", None)
        omitted = {"n": queries.pop("_omitted_below", 0),
                   "below_sec": queries.pop("_thr_cs", 0) / 100.0}
        if omitted["n"] == 0:
            omitted = None
        if scale:
            queries = {k: v / scale for k, v in queries.items()}
    else:
        # full-fidelity record (target/bench.json) or a compact line
        # without the gz payload: fall back to the plain queries map
        try:
            queries = json.loads(raw)["queries"]
        except (json.JSONDecodeError, KeyError):
            raise SystemExit(f"{path}: no queries_gz_b64 payload or queries map")
        queries = {k: round(float(v), 2) for k, v in queries.items()}
    # Record the map's decimal resolution: the gz payload degrades 2 -> 1
    # -> 0 dp as the registry grows (Bench.scala gzOf), while the
    # fallback path above is fixed 2 dp — a cross-round diff must
    # normalize BOTH sides to the coarser precision_dp before reading
    # sub-resolution deltas as real.
    def dp(v):
        s = repr(float(v))
        return len(s.split(".")[1].rstrip("0")) if "." in s else 0
    precision = max((dp(v) for v in queries.values()), default=2)
    t = re.search(r'"metric":"total","value":([0-9.]+)', tail)
    out = {"total": float(t.group(1)) if t else None,
           "precision_dp": precision,
           "queries": dict(sorted(queries.items()))}
    if omitted:
        out["omitted"] = omitted
    b = re.search(r'"build_sec":([0-9.]+)', tail)
    if b:
        out["build_sec"] = float(b.group(1))
    return out


def main():
    import os
    os.makedirs("bench_history", exist_ok=True)
    for path in sys.argv[1:]:
        n = re.search(r"r(\d+)", os.path.basename(path))
        out = f"bench_history/bench_r{n.group(1)}.json" if n \
            else "bench_history/bench_local.json"
        rec = decode(path)
        with open(out, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"{out}: {len(rec['queries'])} queries, total={rec['total']}")


if __name__ == "__main__":
    main()
