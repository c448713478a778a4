#!/usr/bin/env python3
"""Validates the g1_recursive_chunks DuckDB oracle (a recursive CTE
replaying graft.text.RecursiveChunker's greedy merge) against a direct
Python port of the chunker, over the real corpus at both oracle SFs.

Also asserts the corpus preconditions the oracle relies on:
  - no '\n' / '. ' separators (ladder lands on ' ')
  - no doc starts/ends with whitespace, no double spaces
  - every word piece <= size (no nested recursive split / flush)
"""
import duckdb

SIZE, OVERLAP = 200, 40
con = duckdb.connect()


def merge(pieces, size, overlap):
    out, cur, total = [], [], 0
    for p in pieces:
        if total + len(p) > size and cur:
            out.append("".join(cur))
            while total > overlap or (total + len(p) > size and total > 0):
                total -= len(cur.pop(0))
        cur.append(p)
        total += len(p)
    if cur:
        out.append("".join(cur))
    return out


def chunk(text, size=SIZE, overlap=OVERLAP):
    if not text or not text.strip():
        return []
    if len(text) <= size:
        out = [text]
    else:
        assert "\n" not in text and ". " not in text  # ladder lands on ' '
        raw = text.split(" ")
        pieces = [raw[0]] + [" " + r for r in raw[1:]]
        assert all(len(p) <= size for p in pieces)  # single merge pass
        out = merge([p for p in pieces if p], size, overlap)
    return [c.strip() for c in out if c.strip()]


SQL = """
WITH RECURSIVE base AS (
  SELECT doc_id, text FROM documents WHERE trim(text) <> ''
),
pieces AS (
  SELECT doc_id, text,
    [CASE WHEN i = 1 THEN length(parts[i]) ELSE length(parts[i]) + 1 END
     for i in range(1, len(parts) + 1)] AS L
  FROM (SELECT doc_id, text, string_split(text, ' ') AS parts FROM base WHERE length(text) > 200)
),
ps AS (
  SELECT doc_id, text, L, [CAST(list_sum(L[1:i]) AS BIGINT) for i in range(1, len(L) + 1)] AS S, len(L) AS n
  FROM pieces
),
rec AS (
  SELECT doc_id, text, L, S, n, 0 AS idx, 1 AS strt FROM ps
  UNION ALL
  SELECT doc_id, text, L, S, n, idx + 1,
    CAST(list_min([x for x in range(strt + 1, j + 2)
      if S[j] - S[x-1] <= 40 AND (S[j] - S[x-1] + L[j+1] <= 200 OR S[j] - S[x-1] = 0)]) AS INT)
  FROM (SELECT *, len(list_filter(S, v -> v <= (CASE WHEN strt = 1 THEN 0 ELSE S[strt-1] END) + 200)) AS j
        FROM rec) WHERE j < n
),
long_chunks AS (
  SELECT doc_id, idx AS chunk_index,
    trim(substr(text, CAST(sprev + 1 AS BIGINT), CAST(S[j] - sprev AS BIGINT))) AS chunk_text
  FROM (SELECT *, CASE WHEN strt = 1 THEN 0 ELSE S[strt-1] END AS sprev,
          len(list_filter(S, v -> v <= (CASE WHEN strt = 1 THEN 0 ELSE S[strt-1] END) + 200)) AS j
        FROM rec)
),
allc AS (
  SELECT doc_id, 0 AS chunk_index, trim(text) AS chunk_text FROM base WHERE length(text) <= 200
  UNION ALL SELECT * FROM long_chunks
)
SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index, chunk_text,
  CAST(length(chunk_text) AS BIGINT) AS character_count
FROM allc WHERE chunk_text <> '' ORDER BY doc_id, chunk_index
"""

for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    con.sql(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('/root/testdata/{sf}/documents.parquet')"
    )
    got = con.sql(SQL).fetchall()
    docs = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    want = []
    for did, t in docs:
        assert "  " not in t and t == t.strip(), did
        for i, c in enumerate(chunk(t)):
            want.append((did, i, c, len(c)))
    ok = got == sorted(want)
    print(sf, "oracle rows:", len(got), "python rows:", len(want), "match:", ok)
    assert ok
