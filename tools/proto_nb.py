#!/usr/bin/env python3
"""Prototype: quality_classifier oracle SQL (multinomial NB log-odds,
closed form). Validates the exact SQL the oracle will ship."""
import duckdb, sys
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
tb = ("CAST(list_reduce([strpos('0123456789abcdef', x) - 1 for x in "
      "regexp_extract_all(substr(md5(tok), 1, 4), '.')], (a,b) -> a*16 + b) % 64 AS INT)")
db = ("CAST(list_reduce([strpos('0123456789abcdef', x) - 1 for x in "
      "regexp_extract_all(substr(md5(doc_id::VARCHAR), 1, 4), '.')], (a,b) -> a*16 + b) % 100 AS INT)")
sw = "('the', 'a', 'of', 'and', 'or', 'to', 'in')"
q = f"""
WITH tk AS (SELECT doc_id, unnest({toks}) AS tok FROM documents),
lb AS (SELECT doc_id, CAST(100 * count(*) FILTER (tok IN {sw}) >= 7 * count(*) AS INT) AS y,
       ({db}) < 80 AS tr FROM tk GROUP BY doc_id),
bt AS (SELECT tk.doc_id, {tb} AS b, lb.y, lb.tr FROM tk JOIN lb USING (doc_id)),
cc AS (SELECT b, CAST(count(*) FILTER (y = 1) AS BIGINT) AS c1,
       CAST(count(*) FILTER (y = 0) AS BIGINT) AS c0 FROM bt WHERE tr GROUP BY b),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS nt1, CAST(sum(c0) AS BIGINT) AS nt0 FROM cc),
pr AS (SELECT CAST(count(*) FILTER (y = 1) AS BIGINT) AS n1,
       CAST(count(*) FILTER (y = 0) AS BIGINT) AS n0 FROM lb WHERE tr),
mdl AS (SELECT cc.b, cc.c1, cc.c0,
        ln(CAST(cc.c1 + 1 AS DOUBLE) / (tot.nt1 + 64)) - ln(CAST(cc.c0 + 1 AS DOUBLE) / (tot.nt0 + 64)) AS lo
        FROM cc CROSS JOIN tot),
sc AS (SELECT bt.doc_id, round(ln(CAST(pr.n1 AS DOUBLE) / pr.n0) + sum(coalesce(mdl.lo, 0)), 6) AS score
       FROM bt LEFT JOIN mdl USING (b) CROSS JOIN pr GROUP BY bt.doc_id, pr.n1, pr.n0)
SELECT lb.doc_id, lb.tr AS is_train, lb.y AS label, sc.score, sc.score >= 0.0 AS pred
FROM lb JOIN sc USING (doc_id) ORDER BY lb.doc_id
"""
r = con.sql(q).df()
acc = (r.label == r.pred.astype(int)).mean()
te = r[~r.is_train]
print(f"n={len(r)} acc={acc:.3f} test_acc={(te.label == te.pred.astype(int)).mean():.3f} "
      f"majority={max(r.label.mean(), 1-r.label.mean()):.3f}")
