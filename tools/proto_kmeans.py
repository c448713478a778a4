#!/usr/bin/env python3
"""Prototype the ann_recall_trained DuckDB oracle: full Lloyd's k-means
(md5-hash-seeded, norm-filtered, embedding-deduped seeds, fixed iters,
empty-cell carry-forward, float-cast centroids) replayed in SQL, then
IVF recall@3 vs exact truth. Used to pick `iters` and sanity-check the
trained-vs-stand-in recall before wiring the Scala side."""
import duckdb, sys

DIM = 64

def dot(a, b):
    return (f"list_reduce([CAST({a}[i+1] AS DOUBLE)*CAST({b}[i+1] AS DOUBLE) "
            f"for i in range({DIM})], (x,y)->x+y)")

def cos(a, b):
    return f"round(({dot(a,b)} / (sqrt({dot(a,a)}) * sqrt({dot(b,b)}))), 6)"

def kmeans_ctes(k, iters):
    """CTE chain producing cents{iters} AS (c_id, cv)."""
    norm2 = dot("embedding", "embedding")
    ctes = [
        f"cand AS (SELECT min(vec_id) AS vec_id, embedding FROM embeddings "
        f"WHERE {norm2} > 0 GROUP BY embedding)",
        "seed AS (SELECT CAST(row_number() OVER (ORDER BY md5('seed:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS c_id, "
        "embedding AS cv FROM cand)",
        f"cents0 AS (SELECT c_id, cv FROM seed WHERE c_id < {k})",
    ]
    for r in range(1, iters + 1):
        p = f"cents{r-1}"
        ctes += [
            f"asg{r} AS (SELECT vec_id, embedding, c_id AS cell FROM ("
            f"SELECT e.vec_id, e.embedding, c.c_id, CAST(row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {cos('e.embedding', 'c.cv')} DESC, c.c_id) AS INT) AS rn "
            f"FROM embeddings e CROSS JOIN {p} c) WHERE rn = 1)",
            f"pm{r} AS (SELECT cell, i, avg(CAST(embedding[i+1] AS DOUBLE)) AS m "
            f"FROM asg{r} CROSS JOIN range({DIM}) t(i) GROUP BY cell, i)",
            f"mv{r} AS (SELECT cell AS c_id, list(m ORDER BY i) AS mv FROM pm{r} GROUP BY cell)",
            f"nm{r} AS (SELECT c_id, mv, sqrt({dot('mv','mv')}) AS n FROM mv{r})",
            f"up{r} AS (SELECT c_id, CASE WHEN n > 0 THEN [CAST(mv[i+1]/n AS FLOAT) for i in range({DIM})] "
            f"ELSE [CAST(mv[i+1] AS FLOAT) for i in range({DIM})] END AS cv_new FROM nm{r})",
            f"cents{r} AS (SELECT c.c_id, coalesce(u.cv_new, c.cv) AS cv "
            f"FROM cents{r-1} c LEFT JOIN up{r} u USING (c_id))",
        ]
    return ctes, f"cents{iters}"

def recall_sql(k, iters, nprobe=2, topk=3):
    ctes, cents = kmeans_ctes(k, iters)
    ctes += [
        "qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10)",
        f"asgf AS (SELECT vec_id, embedding, c_id AS cell FROM ("
        f"SELECT e.vec_id, e.embedding, c.c_id, CAST(row_number() OVER (PARTITION BY e.vec_id "
        f"ORDER BY {cos('e.embedding', 'c.cv')} DESC, c.c_id) AS INT) AS rn "
        f"FROM embeddings e CROSS JOIN {cents} c) WHERE rn = 1)",
        f"probes AS (SELECT q_id, qv, c_id AS cell FROM ("
        f"SELECT q.q_id, q.qv, c.c_id, CAST(row_number() OVER (PARTITION BY q.q_id "
        f"ORDER BY {cos('q.qv', 'c.cv')} DESC, c.c_id) AS INT) AS rn "
        f"FROM qs q CROSS JOIN {cents} c) WHERE rn <= {nprobe})",
        f"ivf AS (SELECT q_id, vec_id FROM (SELECT p.q_id, a.vec_id, CAST(row_number() OVER "
        f"(PARTITION BY p.q_id ORDER BY {cos('a.embedding', 'p.qv')} DESC, a.vec_id) AS INT) AS rnk "
        f"FROM asgf a JOIN probes p ON a.cell = p.cell WHERE a.vec_id <> p.q_id) WHERE rnk <= {topk})",
        f"truth AS (SELECT q_id, vec_id FROM (SELECT q.q_id, e2.vec_id, CAST(row_number() OVER "
        f"(PARTITION BY q.q_id ORDER BY {cos('e2.embedding', 'q.qv')} DESC, e2.vec_id) AS INT) AS rnk "
        f"FROM embeddings e2 CROSS JOIN qs q WHERE e2.vec_id <> q.q_id) WHERE rnk <= {topk})",
        "h AS (SELECT a.q_id, count(*) AS hits FROM ivf a JOIN truth t "
        "ON a.q_id = t.q_id AND a.vec_id = t.vec_id GROUP BY 1)",
    ]
    return ("WITH " + ", ".join(ctes) +
            " SELECT 'ivf_trained' AS method, q.q_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits, "
            "round(coalesce(h.hits, 0) / 3.0, 6) AS recall3 "
            "FROM qs q LEFT JOIN h ON q.q_id = h.q_id ORDER BY method, q.q_id")

if __name__ == "__main__":
    for sf in ["0.001", "0.01", "0.1"]:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('/root/testdata/sf{sf}/embeddings.parquet')")
        # stand-in recall for comparison (ids 100-115 as centroids)
        standin = con.sql(
            "WITH cents AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id BETWEEN 100 AND 115), "
            "qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10), "
            f"asg AS (SELECT vec_id, embedding, c_id AS cell FROM (SELECT e.vec_id, e.embedding, c.c_id, "
            f"CAST(row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos('e.embedding','c.cv')} DESC, c.c_id) AS INT) AS rn "
            "FROM embeddings e CROSS JOIN cents c) WHERE rn = 1), "
            f"probes AS (SELECT q_id, qv, c_id AS cell FROM (SELECT q.q_id, q.qv, c.c_id, "
            f"CAST(row_number() OVER (PARTITION BY q.q_id ORDER BY {cos('q.qv','c.cv')} DESC, c.c_id) AS INT) AS rn "
            "FROM qs q CROSS JOIN cents c) WHERE rn <= 2), "
            f"ivf AS (SELECT q_id, vec_id FROM (SELECT p.q_id, a.vec_id, CAST(row_number() OVER "
            f"(PARTITION BY p.q_id ORDER BY {cos('a.embedding','p.qv')} DESC, a.vec_id) AS INT) AS rnk "
            "FROM asg a JOIN probes p ON a.cell = p.cell WHERE a.vec_id <> p.q_id) WHERE rnk <= 3), "
            f"truth AS (SELECT q_id, vec_id FROM (SELECT q.q_id, e2.vec_id, CAST(row_number() OVER "
            f"(PARTITION BY q.q_id ORDER BY {cos('e2.embedding','q.qv')} DESC, e2.vec_id) AS INT) AS rnk "
            "FROM embeddings e2 CROSS JOIN qs q WHERE e2.vec_id <> q.q_id) WHERE rnk <= 3) "
            "SELECT avg(CASE WHEN h.hits IS NULL THEN 0 ELSE h.hits END / 3.0) FROM qs q LEFT JOIN "
            "(SELECT a.q_id, count(*) AS hits FROM ivf a JOIN truth t ON a.q_id = t.q_id AND a.vec_id = t.vec_id GROUP BY 1) h "
            "ON q.q_id = h.q_id").fetchone()[0]
        line = f"sf{sf}: standin={standin:.3f}"
        for iters in [1, 2, 3]:
            df = con.sql(recall_sql(16, iters)).df()
            line += f" trained(iters={iters})={df['recall3'].mean():.3f}"
        print(line)
