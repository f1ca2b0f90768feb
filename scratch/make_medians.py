#!/usr/bin/env python3
"""Regenerate BENCH_MEDIANS.json: per-query median over the committed
quiet-machine bench records (the trailing quiet record Bench.scala's
self-adjudicating re-run pass thresholds against). Run from repo root
after committing a new BENCH_QUIET_r*.json.

Envelope normalization (round-17, verdict #6): sandbox hosts differ
~1.5-2x in single-core speed across rounds, and the single-core-bound
query family (the attributed q151/q219 class) scales its wall with
that envelope. Records stamped with a machine envelope
(machine.cpu1_msteps_ms, emitted since round 16) are normalized to the
BASIS envelope (the median of the available stamps): a record from a
host with cpu1 = 2*basis ran everything twice as fast single-core, so
its rows count as 2x their reading in basis-host seconds. Unstamped
pre-r16 records pass through unscaled (their envelopes are unknown;
they age out of the trailing set as stamped records accumulate). The
basis rides the output as cpu1_basis — Bench scales its outlier
threshold by basis/cpu1_now at runtime so a slow-envelope host doesn't
spuriously re-run the single-core family."""
import json, glob, re, statistics, sys

# The queries whose wall is single-core/driver-envelope bound (the
# round-16 forensics' attributed class: 1-task stages, driver-side
# scheduling) — the ONLY rows the envelope law applies to. Parallel
# map-bound queries scale with aggregate throughput, which the
# ambient anchors already track; scaling them by the single-core
# ratio would distort their medians and mask real regressions. Grow
# this list only with probe-pair attribution, never by guess.
CPU1_BOUND = ['q151_authority_sample', 'q219_exact_collapse']

# Post-memo records only (round 20, verdict #1): the round-19
# fixture-relation memo (queries/Catalog.scala tMemo) made the whole
# small-query population 1.5-2.9x faster, so every pre-r20 quiet
# record systematically over-predicts current code. A median mixing
# eras would neither catch contamination (threshold too loose) nor
# track the shipped code. Records re-accumulate from r20 on.
MIN_ROUND = 20
def rnd(f):
    m = re.search(r'BENCH_QUIET_r(\d+)', f)
    return int(m.group(1)) if m else 0
records = sorted(f for f in glob.glob('BENCH_QUIET_r*.json')
                 if rnd(f) >= MIN_ROUND)
stamps = {}
for f in records:
    d = json.load(open(f))
    c = d.get('machine', {}).get('cpu1_msteps_ms')
    if c:
        stamps[f] = c
basis = round(statistics.median(stamps.values()), 4) if stamps else None

per = {}
for f in records:
    d = json.load(open(f))
    scale = (stamps[f] / basis) if (basis and f in stamps) else 1.0
    for q, v in d.get('queries', {}).items():
        per.setdefault(q, []).append(v * (scale if q in CPU1_BOUND else 1.0))
med = {q: round(statistics.median(vs), 4) for q, vs in sorted(per.items())}
out = {'source_records': records, 'cpu1_stamps': stamps,
       'cpu1_basis': basis, 'cpu1_bound': CPU1_BOUND, 'medians': med}
json.dump(out, open('BENCH_MEDIANS.json', 'w'), indent=1)
print(f"{len(med)} query medians from {len(records)} records "
      f"({len(stamps)} stamped, basis cpu1={basis}, "
      f"{len(CPU1_BOUND)} envelope-scoped queries)")
