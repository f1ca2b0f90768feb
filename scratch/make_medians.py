#!/usr/bin/env python3
"""Regenerate BENCH_MEDIANS.json: per-query median over the committed
quiet-machine bench records (the trailing quiet record Bench.scala's
self-adjudicating re-run pass thresholds against). Run from repo root
after committing a new BENCH_QUIET_r*.json."""
import json, glob, statistics, sys

records = sorted(glob.glob('BENCH_QUIET_r*.json'))
per = {}
for f in records:
    d = json.load(open(f))
    for q, v in d.get('queries', {}).items():
        per.setdefault(q, []).append(v)
med = {q: round(statistics.median(vs), 4) for q, vs in sorted(per.items())}
out = {'source_records': records, 'medians': med}
json.dump(out, open('BENCH_MEDIANS.json', 'w'), indent=1)
print(f"{len(med)} query medians from {len(records)} records")
