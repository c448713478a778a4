# Round-7 prototype (VERDICT #7): BPE-ish token budget for the G3
# hybrid chunker. A word costs ceil(len/4) tokens (the published
# ~4-chars-per-token heuristic). Oversize split = quantized cumulative
# windows (word -> window floor(cum_before/B)); merge_peers = greedy
# pack by summed weight. On this corpus (single-paragraph docs, words
# <= 8 chars so weight <= 2) every non-final window weighs >= B-1, so
# the ONLY merge the greedy pass can perform is the final pair when
# w[n-2]+w[n-1] <= B — which the DuckDB oracle replays exactly.
#
# Validates: python port of the new Scala semantics == the candidate
# DuckDB SQL, row-for-row, on all three scales.
import duckdb, sys

B = 32

def weight(w):
    return (len(w) + 3) // 4

def chunk(text, max_tokens=B):
    if text is None or not text.strip():
        return []
    paras = [p.strip() for p in text.split("\n\n") if p.strip()] or [text.strip()]
    pieces = []
    for p in paras:
        ws = p.split()
        if sum(weight(w) for w in ws) <= max_tokens:
            pieces.append(p)
        else:
            cur, cum, cur_win = [], 0, 0
            for t in ws:
                win = cum // max_tokens
                if win != cur_win and cur:
                    pieces.append(" ".join(cur)); cur = []; cur_win = win
                cur.append(t); cum += weight(t)
            if cur:
                pieces.append(" ".join(cur))
    merged, cur, cur_toks = [], [], 0
    for p in pieces:
        t = sum(weight(w) for w in p.split())
        if cur and cur_toks + t > max_tokens:
            merged.append("\n\n".join(cur)); cur = [p]; cur_toks = t
        else:
            cur.append(p); cur_toks += t
    if cur:
        merged.append("\n\n".join(cur))
    return list(enumerate(merged))

TOKENS = "regexp_split_to_array(trim(text), '\\s+')"

def g3_sql(sf):
    return f"""
WITH p AS (SELECT doc_id, {TOKENS} AS toks
           FROM read_parquet('/root/testdata/{sf}/documents.parquet')
           WHERE trim(text) <> ''),
tk AS (SELECT doc_id, CAST(g.i AS BIGINT) AS i, toks[g.i+1] AS tok,
              CAST((length(toks[g.i+1]) + 3) // 4 AS BIGINT) AS w
       FROM p, unnest(range(len(p.toks))) AS g(i)),
cb AS (SELECT doc_id, i, tok, w,
              coalesce(sum(w) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       FROM tk),
win AS (SELECT doc_id, cum // {B} AS wno,
               string_agg(tok, ' ' ORDER BY i) AS wtext,
               CAST(sum(w) AS BIGINT) AS ww
        FROM cb GROUP BY doc_id, cum // {B}),
idx AS (SELECT doc_id, wno, wtext, ww,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wno) AS BIGINT) - 1 AS ci,
               count(*) OVER (PARTITION BY doc_id) AS n,
               lag(ww) OVER (PARTITION BY doc_id ORDER BY wno) AS prev_w
        FROM win),
fin AS (SELECT doc_id, ci,
               CASE WHEN ci = n - 1 AND n >= 2 AND ww + prev_w <= {B}
                    THEN ci - 1 ELSE ci END AS nci,
               wtext
        FROM idx)
SELECT doc_id, CAST(nci AS BIGINT) AS chunk_index,
       string_agg(wtext, chr(10) || chr(10) ORDER BY ci) AS chunk_text
FROM fin GROUP BY doc_id, nci ORDER BY doc_id, chunk_index
"""

for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('/root/testdata/{sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    py = [(d, i, t) for d, text in docs for i, t in chunk(text)]
    sql = con.execute(g3_sql(sf)).fetchall()
    sql = [(r[0], r[1], r[2]) for r in sql]
    ok = py == sql
    n_merged = sum(1 for (_, _, t) in py if "\n\n" in t)
    print(f"{sf}: python={len(py)} sql={len(sql)} match={ok} final-pair-merges={n_merged}")
    if not ok:
        for a, b in list(zip(py, sql))[:2000]:
            if a != b:
                print(" py :", a)
                print(" sql:", b)
                break
        sys.exit(1)
print("proto_g3: ALL MATCH")
