import duckdb
con = duckdb.connect()
sf='/root/testdata/sf0.01'
con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
con.sql(f"create view embeddings as select * from '{sf}/embeddings.parquet'")
con.sql(f"create view part as select * from '{sf}/part.parquet'")
con.sql(f"create view lineitem as select * from '{sf}/lineitem.parquet'")
# exact dups?
print(con.sql("select count(*) as docs, count(distinct text) as uniq from documents"))
# near-dup: jaccard distribution on word-3gram shingles (sample pairs)
print(con.sql(r"""
WITH sh AS (
  SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM (
    SELECT doc_id, list_distinct([toks[i+1]||' '||toks[i+2]||' '||toks[i+3] for i in range(len(toks)-2)]) AS shs
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents))
), p AS (
  SELECT a.doc_id da, b.doc_id db, count(*) shared, any_value(a.n_sh) na, any_value(b.n_sh) nb
  FROM sh a JOIN sh b ON a.sh=b.sh AND a.doc_id<b.doc_id GROUP BY 1,2
)
SELECT max(shared/(na+nb-shared)) mx, quantile_cont(shared/(na+nb-shared), 0.999) q999, count(*) npairs,
 count(*) FILTER (shared/(na+nb-shared) >= 0.2) n02, count(*) FILTER (shared/(na+nb-shared) >= 0.5) n05 FROM p"""))
# cosine distribution within vs across label
print(con.sql(r"""
WITH c AS (SELECT a.label la, b.label lb,
  list_reduce([CAST(a.embedding[i+1] AS DOUBLE)*CAST(b.embedding[i+1] AS DOUBLE) for i in range(64)],(x,y)->x+y) /
  (sqrt(list_reduce([CAST(a.embedding[i+1] AS DOUBLE)*CAST(a.embedding[i+1] AS DOUBLE) for i in range(64)],(x,y)->x+y)) *
   sqrt(list_reduce([CAST(b.embedding[i+1] AS DOUBLE)*CAST(b.embedding[i+1] AS DOUBLE) for i in range(64)],(x,y)->x+y))) AS cos
 FROM (select * from embeddings where vec_id < 300) a JOIN (select * from embeddings where vec_id < 300) b ON a.vec_id < b.vec_id)
SELECT la = lb AS same_label, count(*) n, round(avg(cos),3) mean, round(quantile_cont(cos, 0.99),3) p99, round(max(cos),3) mx FROM c GROUP BY 1"""))
print(con.sql("select p_type, count(*) from part group by 1 limit 10"))
print(con.sql("select count(*) from part where not exists (select 1 from lineitem where l_partkey = p_partkey)"))
