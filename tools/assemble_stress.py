#!/usr/bin/env python3
"""Assemble STRESS_r{N}.json from raw StressBench output lines.

Usage: assemble_stress.py <round> <raw_file> <harness_note> > STRESS_rN.json
The raw file holds one StressBench JSON line per corpus (any prefix up
to the first '{' is stripped, e.g. sbt's "[info] ").
"""
import json
import sys

round_n = int(sys.argv[1])
raw = sys.argv[2]
note = sys.argv[3]
runs = []
for line in open(raw):
    # anchor on the literal JSON prefix: a log line that merely mentions
    # "metric" without an object (e.g. a Spark log echo) must be skipped,
    # not crash the assembly
    i = line.find('{"metric"')
    if i < 0:
        continue
    runs.append(json.loads(line[i:]))
json.dump({"round": round_n, "harness": note, "runs": runs},
          sys.stdout, indent=1)
print()
