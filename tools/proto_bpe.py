#!/usr/bin/env python3
"""Prototype: the BPE training/application DuckDB replay (bpe_merges /
bpe_token_count oracles) vs a direct Python port of
graft.text.BpeTokenizer. Run: python3 tools/proto_bpe.py [sf_dir]"""
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
V, R = 64, 8
TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"

con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")

# ---- Python port (mirrors BpeTokenizer.scala) ----
rows = con.sql(
    f"SELECT tok, CAST(count(*) AS BIGINT) FROM (SELECT unnest({TOKS}) AS tok "
    "FROM documents) GROUP BY tok ORDER BY 2 DESC, 1 LIMIT " + str(V)).fetchall()

def apply_merge(syms, p1, p2):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == p1 and syms[i + 1] == p2:
            out.append(p1 + p2); i += 2
        else:
            out.append(syms[i]); i += 1
    return out

words = [([c for c in w], c) for w, c in rows]
merges = []
for _ in range(R):
    pc = {}
    for syms, c in words:
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
    if not pc: break
    best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
    merges.append(best)
    words = [(apply_merge(s, *best), c) for s, c in words]

def encode(word):
    syms = [c for c in word]
    for p1, p2 in merges:
        syms = apply_merge(syms, p1, p2)
    return syms

py_counts = {}
for doc_id, toks in con.sql(
        f"SELECT doc_id, {TOKS} FROM documents WHERE text IS NOT NULL").fetchall():
    if toks:
        py_counts[doc_id] = (len(toks), sum(len(encode(w)) for w in toks))

# ---- DuckDB replay ----
head = [
    f"w AS MATERIALIZED (SELECT tok AS word, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT unnest({TOKS}) AS tok FROM documents) GROUP BY tok)",
    f"topv AS MATERIALIZED (SELECT word, cnt FROM w ORDER BY cnt DESC, word LIMIT {V})",
    "s0 AS MATERIALIZED (SELECT word, regexp_extract_all(word, '.') AS s FROM w)"]
rounds = []
for r in range(1, R + 1):
    p = f"s{r-1}"
    rounds += [
        f"pc{r} AS MATERIALIZED (SELECT pr[1] AS p1, pr[2] AS p2, CAST(sum(cnt) AS BIGINT) AS n FROM ("
        f"SELECT t.cnt, unnest([[x.s[i+1], x.s[i+2]] for i in range(len(x.s)-1)]) AS pr "
        f"FROM {p} x JOIN topv t ON x.word = t.word) GROUP BY 1, 2)",
        f"m{r} AS MATERIALIZED (SELECT p1, p2, p1 || p2 AS mg FROM pc{r} ORDER BY n DESC, p1, p2 LIMIT 1)",
        f"a{r} AS (SELECT word, s, 1 AS pos, CAST([] AS VARCHAR[]) AS out FROM {p} "
        "UNION ALL "
        f"SELECT a.word, a.s, "
        f"CASE WHEN a.pos < len(a.s) AND a.s[a.pos] = m.p1 AND a.s[a.pos+1] = m.p2 THEN a.pos+2 ELSE a.pos+1 END, "
        f"CASE WHEN a.pos < len(a.s) AND a.s[a.pos] = m.p1 AND a.s[a.pos+1] = m.p2 THEN list_append(a.out, m.mg) ELSE list_append(a.out, a.s[a.pos]) END "
        f"FROM a{r} a, m{r} m WHERE a.pos <= len(a.s))",
        f"s{r} AS MATERIALIZED (SELECT word, out AS s FROM a{r} WHERE pos = len(s)+1)"]
ctes = "WITH RECURSIVE " + ", ".join(head + rounds)

sql_merges = con.sql(
    ctes + " " + " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, p1 AS lhs, p2 AS rhs FROM m{r}" for r in range(1, R + 1))
    + " ORDER BY merge_rank").fetchall()
print("py merges :", merges)
print("sql merges:", [(l, h) for _, l, h in sql_merges])
assert [(l, h) for _, l, h in sql_merges] == merges, "MERGE MISMATCH"

sql_counts = dict(
    (d, (nw, nb)) for d, nw, nb in con.sql(
        ctes + f", tok AS (SELECT doc_id, unnest({TOKS}) AS word FROM documents), "
        f"wl AS (SELECT word, CAST(len(s) AS BIGINT) AS bpe_len FROM s{R}) "
        "SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(w.bpe_len) AS BIGINT) AS n_bpe_tokens "
        "FROM tok t JOIN wl w ON t.word = w.word GROUP BY t.doc_id ORDER BY t.doc_id").fetchall())
assert sql_counts == py_counts, \
    f"COUNT MISMATCH: {len(sql_counts)} vs {len(py_counts)} docs; " + str(
        [(k, sql_counts.get(k), py_counts.get(k)) for k in list(py_counts)[:5]])
print(f"token counts match on {len(py_counts)} docs — OK")
