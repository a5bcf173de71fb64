#!/usr/bin/env python3
"""Regenerate tools/bench_budgets.json from round bench artifacts.

Budget per query = the MINIMUM time observed across the given BENCH_r*.json
artifacts (each of which already records the per-query min over 3-5 timed
runs) — i.e. the best demonstrated idle-ish time. Bench flags any query
running > 1.5x its budget in the `over_budget` field so a per-query
regression surfaces in the round artifact instead of hiding inside the
suite total.

Budgets are keyed by NUMERIC query id ("131") because the round artifacts
are 2000-char stdout tails whose only complete per-query record is the
compact `t_by_id` id-indexed array; Bench maps a query name to its budget
via the first integer in the name.

Usage: python3 tools/gen_budgets.py BENCH_r13.json BENCH_r14.json ...
"""
import json
import re
import sys

budgets = {}


def feed(qid, v):
    if v is not None and v >= 0:
        budgets[str(qid)] = min(budgets.get(str(qid), float("inf")), float(v))


for path in sys.argv[1:]:
    with open(path) as f:
        raw = f.read()
    # round artifacts wrap the bench stdout tail as an escaped JSON string —
    # unwrap so the timing fragments match
    try:
        art = json.loads(raw)
        if isinstance(art, dict) and isinstance(art.get("tail"), str):
            raw = art["tail"]
        elif isinstance(art, dict) and isinstance(art.get("queries"), dict):
            # a full bench JSON: use ONLY the per-query seconds map — the
            # regex fallback below would also swallow look-alike name-keyed
            # maps (load_avg_per_query fed bogus sub-second "budgets" once)
            n = 0
            for name, v in art["queries"].items():
                m = re.match(r"q(\d+)", name)
                if m and isinstance(v, (int, float)):
                    feed(int(m.group(1)), float(v))
                    n += 1
            if n:
                continue
    except ValueError:
        pass
    got = 0
    # compact line: "t_by_id":[0.718,0.358,...] — index i is query id i+1
    for m in re.finditer(r'"t_by_id":\[([^\]]*)\]', raw):
        vals = [None if x.strip() == "null" else float(x)
                for x in m.group(1).split(",") if x.strip()]
        for i, v in enumerate(vals):
            feed(i + 1, v)
        got += len(vals)
    # full-name fragments ("q131_ann_recall":7.267) from any partial map
    for m in re.finditer(r'"q(\d+)[a-z0-9_]*":([0-9.]+)', raw):
        feed(int(m.group(1)), float(m.group(2)))
        got += 1
    if not got:
        print(f"warn: no per-query timings found in {path}", file=sys.stderr)

# merge with the CHECKED-IN minima (r18): budgets are all-time bests, and
# a regeneration from whatever artifacts happen to be on hand must never
# INFLATE one — r17's file was built from a clean local run that no round
# artifact records, and a naive regen from r16+r17 artifacts alone raised
# q72's budget 1.27 -> 1.47, silently loosening its tripwire.
try:
    with open("tools/bench_budgets.json") as f:
        for k, v in json.load(f).items():
            feed(k, v)
except (OSError, ValueError):
    pass

out = {k: round(v, 3) for k, v in
       sorted(budgets.items(), key=lambda kv: int(kv[0]))}
with open("tools/bench_budgets.json", "w") as f:
    json.dump(out, f, indent=0)
    f.write("\n")
print(f"wrote tools/bench_budgets.json with {len(out)} budgets")
