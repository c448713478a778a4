import duckdb
con = duckdb.connect()
for sf in ['sf0.001','sf0.01','sf0.1']:
    d=f'/root/testdata/{sf}'
    r=[con.sql(f"select count(*) from '{d}/{t}.parquet'").fetchone()[0] for t in ['documents','embeddings','events','customer','orders','lineitem','part']]
    print(sf, dict(zip(['documents','embeddings','events','customer','orders','lineitem','part'],r)))
d='/root/testdata/sf0.01'
print('cust w/o orders:', con.sql(f"select count(*) from '{d}/customer.parquet' c where not exists (select 1 from '{d}/orders.parquet' o where o.o_custkey=c.c_custkey)").fetchone()[0])
print('minhash bands test:')
print(con.sql(rf"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest(shs) AS sh FROM (
    SELECT doc_id, list_distinct([toks[i+1]||' '||toks[i+2]||' '||toks[i+3] for i in range(len(toks)-2)]) AS shs
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM '{d}/documents.parquet'))),
hx AS (SELECT doc_id, r.i AS perm, md5(r.i::VARCHAR || ':' || sh) AS h FROM sh, unnest(range(16)) AS r(i)),
mh AS (SELECT doc_id, perm, min(h) AS m FROM hx GROUP BY 1,2),
bd AS (SELECT doc_id, perm//4 AS band, string_agg(m, '_' ORDER BY perm) AS sig FROM mh GROUP BY doc_id, perm//4)
SELECT count(*) FROM (SELECT DISTINCT a.doc_id da, b.doc_id db FROM bd a JOIN bd b ON a.band=b.band AND a.sig=b.sig AND a.doc_id<b.doc_id)"""))
