#!/usr/bin/env python3
"""Prototype: all-integer logistic-regression quality classifier.
Calibrates lr/iters/B and validates the micro-unit fixed-point GD
produces a learning classifier with exact cross-engine arithmetic."""
import duckdb, sys
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
LR = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
B = 64
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")

bucket = ("CAST(list_reduce([strpos('0123456789abcdef', x) - 1 for x in "
          "regexp_extract_all(substr(md5(tok), 1, 4), '.')], (a,b) -> a*16 + b) % 64 AS INT)")
dbucket = ("CAST(list_reduce([strpos('0123456789abcdef', x) - 1 for x in "
           "regexp_extract_all(substr(md5(doc_id::VARCHAR), 1, 4), '.')], (a,b) -> a*16 + b) % 100 AS INT)")

ctes = [
 f"tk AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents)",
 f"ft0 AS (SELECT doc_id, {bucket} AS b, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2)",
 f"ft AS (SELECT * FROM ft0 UNION ALL SELECT doc_id, -1 AS b, CAST(1 AS BIGINT) AS c FROM documents)",
 f"lb AS (SELECT d.doc_id, CAST(coalesce(s.sw, 0) >= 4 AS INT) AS y, ({dbucket.replace('doc_id','d.doc_id')}) < 80 AS tr "
 f"FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS sw FROM tk WHERE tok IN ('a','the') GROUP BY 1) s ON d.doc_id = s.doc_id)",
 "ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lb WHERE tr)",
 "w0 AS (SELECT CAST(unnest(range(-1, 64)) AS INT) AS b, CAST(0 AS BIGINT) AS wi)",
]
for t in range(1, ITERS+1):
    p = t-1
    ctes += [
      f"z{t} AS (SELECT ft.doc_id, CAST(sum(w{p}.wi * ft.c) AS BIGINT) AS zi FROM ft JOIN w{p} ON ft.b = w{p}.b GROUP BY 1)",
      f"e{t} AS (SELECT z{t}.doc_id, CAST(round((1.0/(1.0+exp(-(CAST(zi AS DOUBLE)/1000000.0))) - lb.y) * 1000000.0) AS BIGINT) AS ei "
      f"FROM z{t} JOIN lb ON z{t}.doc_id = lb.doc_id WHERE lb.tr)",
      f"g{t} AS (SELECT ft.b, CAST(sum(e{t}.ei * ft.c) AS BIGINT) AS gi FROM ft JOIN e{t} ON ft.doc_id = e{t}.doc_id GROUP BY 1)",
      f"w{t} AS (SELECT w{p}.b, w{p}.wi - CAST(round({LR} * CAST(coalesce(g{t}.gi, 0) AS DOUBLE) / ntr.n) AS BIGINT) AS wi "
      f"FROM w{p} LEFT JOIN g{t} ON w{p}.b = g{t}.b CROSS JOIN ntr)",
    ]
T = ITERS
final = (f"zf AS (SELECT ft.doc_id, CAST(sum(w{T}.wi * ft.c) AS BIGINT) AS zi FROM ft JOIN w{T} ON ft.b = w{T}.b GROUP BY 1) "
         f"SELECT lb.doc_id, lb.tr AS is_train, lb.y AS label, "
         f"round(1.0/(1.0+exp(-(CAST(zi AS DOUBLE)/1000000.0))), 6) AS score, (zi >= 0) AS pred "
         f"FROM zf JOIN lb ON zf.doc_id = lb.doc_id ORDER BY lb.doc_id")
q = "WITH " + ", ".join(ctes) + ", " + final
r = con.sql(q).df()
acc = (r.label == r.pred.astype(int)).mean()
test = r[~r.is_train]
tacc = (test.label == test.pred.astype(int)).mean()
base = max(r.label.mean(), 1 - r.label.mean())
print(f"iters={ITERS} lr={LR}: acc={acc:.3f} test_acc={tacc:.3f} majority={base:.3f} pos={r.label.mean():.3f}")
wq = "WITH " + ", ".join(ctes) + f" SELECT b, wi FROM w{T} ORDER BY wi DESC LIMIT 6"
print(con.sql(wq).df().to_string())
