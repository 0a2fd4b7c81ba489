#!/usr/bin/env python3
"""Deterministic stress-corpus generator (driver-side tooling, like
oracle_check.py): a documents-like parquet at ~10x the driver's sf0.1
scale, with the duplicate structure that stresses the dedup/index
family superlinearly if anything is shape-wrong:

  - zipf-ish vocabulary (hot tokens -> hot shingles crossing the df cap)
  - a boilerplate sentence shared by ~30% of docs (the degenerate
    shingle class the cap exists for)
  - ~2% exact duplicates, ~3% near duplicates (few-token mutations)

Usage: gen_stress_corpus.py OUT_DIR [N_DOCS] (default 50000)
Writes OUT_DIR/documents.parquet with (doc_id BIGINT, text VARCHAR).
"""
import random
import sys

import duckdb


def main() -> None:
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    rnd = random.Random(20260813)
    vocab = [f"w{i:05d}" for i in range(20000)]
    # zipf-ish sampling: rank r with weight ~ 1/(r+10)
    weights = [1.0 / (r + 10) for r in range(len(vocab))]
    boiler = "this document is provided as is without warranty of any kind"

    docs = []
    for i in range(n):
        length = 40 + int(rnd.expovariate(1 / 120.0))
        words = rnd.choices(vocab, weights=weights, k=min(length, 400))
        if rnd.random() < 0.30:
            pos = rnd.randrange(len(words) + 1)
            words[pos:pos] = boiler.split()
        docs.append(" ".join(words))

    rows = []
    i = 0
    doc_id = 0
    while doc_id < n:
        src = docs[i % len(docs)]
        r = rnd.random()
        if r < 0.02 and doc_id > 0:          # exact duplicate
            rows.append((doc_id, rows[rnd.randrange(len(rows))][1]))
        elif r < 0.05 and doc_id > 0:        # near duplicate
            base = rows[rnd.randrange(len(rows))][1].split()
            for _ in range(max(1, len(base) // 50)):
                base[rnd.randrange(len(base))] = rnd.choice(vocab)
            rows.append((doc_id, " ".join(base)))
        else:
            rows.append((doc_id, src))
            i += 1
        doc_id += 1

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"wrote {n} docs to {out}/documents.parquet")


if __name__ == "__main__":
    main()
