#!/usr/bin/env python3
"""Assemble STRESS_r{N}.json from StressBench log files.

Usage: assemble_stress.py <round> <harness-note> <log> [<log> ...]
Each log is a StressBench run's stdout; the LAST line starting with
'{"metric"' is that run's JSON record. Output goes to stdout.
"""
import json
import sys


def main() -> None:
    rnd = int(sys.argv[1])
    note = sys.argv[2]
    runs = []
    for path in sys.argv[3:]:
        rec = None
        with open(path) as f:
            for line in f:
                i = line.find('{"metric"')
                if i >= 0:
                    rec = json.loads(line[i:])
        if rec is None:
            raise SystemExit(f"no StressBench JSON found in {path}")
        runs.append(rec)
    json.dump({"round": rnd, "harness": note, "runs": runs},
              sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
