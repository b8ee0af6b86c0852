#!/usr/bin/env python
"""Aggregate the captured device trace (/tmp/jax_trace) by source location
using the dumped HLO (/tmp/chain_hlo.txt). Conditionals (the banded-conv
exactness fallbacks) are attributed via the conditional instruction's
metadata; their nested branch events are skipped to avoid double counting."""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict

ITERS = 10

hlo = open("/tmp/chain_hlo.txt").read()
src_of = {}
for line in hlo.splitlines():
    m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
    if not m:
        continue
    name = m.group(1)
    meta = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
    op = re.search(r'op_name="([^"]+)"', line)
    if meta:
        src_of[name] = (meta.group(1).split("/")[-1], int(meta.group(2)),
                        (op.group(1) if op else "")[:80])

files = glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as f:
    data = json.load(f)
pids = {}
for e in data.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
device_pids = {p for p, n in pids.items() if "TPU" in n}

tot = defaultdict(float)
unattr = defaultdict(float)
for e in data.get("traceEvents", []):
    if e.get("ph") != "X" or e.get("pid") not in device_pids:
        continue
    name = e.get("name", "")
    if name.startswith(("while", "jit_", "branch_", "body.", "condition")):
        continue
    # cond.N.clone.2 etc -> look up cond.N / the base name
    base = name
    for cand in (name, name.split(".clone")[0]):
        if cand in src_of:
            base = cand
            break
    info = src_of.get(base)
    if info is None:
        unattr[name.split(".")[0]] += e.get("dur", 0)
        continue
    tot[info] += e.get("dur", 0)

print("=== by source location (ms/iter) ===")
rows = sorted(tot.items(), key=lambda kv: -kv[1])
acc = 0.0
for (f, l, op), us in rows[:45]:
    acc += us
    print(f"{us/ITERS/1e3:8.3f}  {f}:{l:<5} {op}")
print(f"attributed total: {sum(tot.values())/ITERS/1e3:.2f} ms/iter")
print("=== unattributed (ms/iter) ===")
for k, us in sorted(unattr.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{us/ITERS/1e3:8.3f}  {k}")
print(f"unattributed total: {sum(unattr.values())/ITERS/1e3:.2f} ms/iter")

# group by file:line prefix region
print("=== by file (ms/iter) ===")
byfile = defaultdict(float)
for (f, l, op), us in tot.items():
    byfile[f] += us
for f, us in sorted(byfile.items(), key=lambda kv: -kv[1]):
    print(f"{us/ITERS/1e3:8.3f}  {f}")
