"""Generate a seeded sf1.0 clone of the sf0.1 fixtures by 10x
union-with-key-offset (r9 verdict #6) — written to a SCRATCH dir, never
/root/testdata.

Semantics preserved per table family so the scaling measurement is
honest:
- relational tables: 10 copies with consistent foreign-key offsets
  (copy i shifts every entity key by i * OFFSET), so join fan-outs and
  group cardinalities scale linearly and dims stay referenced.
- documents: copy i additionally maps every token through a per-copy
  VOCABULARY ROTATION (token -> vocab[(idx + 7*i) % V]). Lengths, tf
  structure and within-copy near-dup pairs are preserved isomorphically
  while cross-copy similarity is destroyed — so dedup/LSH outputs scale
  LINEARLY (29 candidate pairs -> ~290) instead of quadratically
  exploding on 10 identical copies.
- embeddings: copy i rolls the vector dimensions by i (norm-preserving
  permutation): within-copy neighborhoods are isomorphic, cross-copy
  cosine similarity is scrambled.
- region/nation: dimensions, kept as-is.

Usage: python scripts/make_scale_clone.py [out_dir]   (default
/tmp/mdls_scale/sf1.0; deterministic, no RNG beyond the fixed rotation).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
OFF = 10_000_000  # > every key in the sf0.1 fixtures


def main(out: str) -> None:
    assert not out.startswith("/root/testdata"), "never write to the fixtures"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    plain = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
    }
    for t, keys in plain.items():
        selects = []
        desc = con.sql(f"describe select * from '{SRC}/{t}.parquet'").fetchall()
        for i in range(COPIES):
            cols = []
            for name, typ, *_ in desc:
                if name in keys:
                    cols.append(f"({name} + {i * OFF})::BIGINT AS {name}")
                elif t == "embeddings" and name == "embedding":
                    # norm-preserving per-copy dimension roll
                    cols.append(
                        f"list_concat(embedding[{i + 1}:], embedding[1:{i}]) AS embedding"
                        if i else "embedding"
                    )
                else:
                    cols.append(name)
            selects.append(
                f"SELECT {', '.join(cols)} FROM '{SRC}/{t}.parquet'"
            )
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, con.sql(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0])

    # documents: key offset + per-copy vocabulary rotation (the fixture
    # vocabulary is ~31 terms, so the rotation map inlines as a literal)
    vocab = [r[0] for r in con.sql(f"""
        SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM '{SRC}/documents.parquet' ORDER BY 1
    """).fetchall() if r[0]]
    v = len(vocab)
    selects = []
    for i in range(COPIES):
        if i == 0:
            selects.append(f"SELECT * FROM '{SRC}/documents.parquet'")
            continue
        # quote-escape tokens (r10 ADVICE): a token containing a single
        # quote would otherwise break (or corrupt) the generated SQL
        esc = lambda s: s.replace("'", "''")  # noqa: E731
        pairs = ", ".join(
            f"'{esc(t)}': '{esc(vocab[(j + 7 * i) % v])}'"
            for j, t in enumerate(vocab)
        )
        # n_chars is recomputed from the REWRITTEN text (rotated tokens
        # change lengths; string_agg single-spaces runs) so the fixture
        # invariant n_chars == length(text) holds in every copy
        selects.append(f"""
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM (
              SELECT (doc_id + {i * OFF})::BIGINT AS doc_id,
                     list_aggregate(list_transform(
                         string_split_regex(trim(text), '\\s+'),
                         t -> coalesce(map_extract(MAP {{{pairs}}}, t)[1], t)
                     ), 'string_agg', ' ') AS text,
                     lang, source
              FROM '{SRC}/documents.parquet'
            )
        """)
    con.sql(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    print("documents",
          con.sql(f"select count(*) from '{out}/documents.parquet'").fetchone()[0])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0")
