#!/usr/bin/env python3
"""Prototype for the g2_structured_chunks oracle: a Python port of
graft.text.SemanticChunker run over the deterministically-structured
corpus (markdown/numbered/ALL-CAPS headers interleaved with word slices
of each doc), compared row-exact against the DuckDB recursive-CTE
replay that will become the oracle SQL.

Construction (both engines, from documents.text word list, 1-based):
  A=[1..6] B=[7..16] C=[17..28] D=[29..40] E=[41..]
  text2 = "# Title {id}\nA\n## Section One\nB\n\nC\n1.2. Numbered\nD\nAPPENDIX NOTES\nE"
Target size 60 so merge and packing branches are both live.
"""
import re, sys, duckdb

TARGET = 60

# ---- Python port of SemanticChunker (chunking_service.py:166-481 fidelity) ----

def match_header(raw):
    line = raw.strip()
    if not line:
        return None
    m = re.match(r'^(#{1,6})\s+(.+)$', line)
    if m:
        return (len(m.group(1)), m.group(2).strip())
    m = re.match(r'^(\d+(?:\.\d+)*\.?)\s+(.+)$', line)
    if m:
        num = m.group(1)
        return (len(num.split('.')), f"{num} {m.group(2).strip()}")
    if line.isupper() and 5 <= len(line) <= 60:
        return (1, line.title())
    return None

def detect_sections(text):
    sections, headers, cur, n = [], [], [], 0
    start = pos = 0
    def path():
        return " > ".join(headers) if headers else "Document"
    for line in text.split("\n"):
        line_start = pos
        pos += len(line) + 1
        h = match_header(line)
        if h:
            level, title = h
            if cur:
                st = "\n".join(cur)
                if st.strip():
                    sections.append((path(), st.strip(), start, line_start)); n += 1
            del headers[max(0, level - 1):]
            headers.append(title)
            cur = []
            start = pos
        else:
            cur.append(line)
    if cur:
        st = "\n".join(cur)
        if st.strip():
            sections.append((path(), st.strip(), start, pos)); n += 1
    if n == 0:
        return [("Document", text.strip(), 0, len(text))]
    return sections

def merge_small(sections, target):
    if len(sections) <= 1:
        return sections
    out, acc = [], None
    for s in sections:
        if acc is None:
            acc = s
        elif len(acc[1]) < target:
            acc = (s[0], acc[1] + "\n\n" + s[1], acc[2], s[3])
        else:
            out.append(acc); acc = s
    if acc is not None:
        out.append(acc)
    return out

def chunk_section(sec, start_index, target):
    path, text, s, e = sec
    if len(text) <= target:
        return [(text, path, start_index, s, e)]
    chunks = []
    paras = [p.strip() for p in re.split(r'\n\s*\n', text) if p.strip()]
    cur, cur_start, idx = "", s, start_index
    for para in paras:
        if len(cur) >= target and cur:
            chunks.append((cur.strip(), path, idx, cur_start, cur_start + len(cur)))
            idx += 1
            cur_start += len(cur)
            cur = para
        else:
            cur = para if not cur else cur + "\n\n" + para
    if cur.strip():
        chunks.append((cur.strip(), path, idx, cur_start, e))
    return chunks

def chunk(text, target=TARGET):
    if not text or not text.strip():
        return []
    out, idx = [], 0
    for s in merge_small(detect_sections(text), target):
        cs = chunk_section(s, idx, target)
        out += cs
        idx += len(cs)
    return out

def structured(doc_id, text):
    w = text.split(" ")
    A = " ".join(w[0:6]); B = " ".join(w[6:16]); C = " ".join(w[16:28])
    D = " ".join(w[28:40]); E = " ".join(w[40:])
    return (f"# Title {doc_id}\n{A}\n## Section One\n{B}\n\n{C}"
            f"\n1.2. Numbered\n{D}\nAPPENDIX NOTES\n{E}")

# ---- DuckDB replay (the oracle-to-be) ----

NL = "chr(10)"
ORACLE = f"""
WITH RECURSIVE
w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
parts AS (
  SELECT doc_id,
    coalesce(array_to_string(list_slice(ws, 1, 6), ' '), '')  AS a,
    coalesce(array_to_string(list_slice(ws, 7, 16), ' '), '') AS b,
    coalesce(array_to_string(list_slice(ws, 17, 28), ' '), '') AS c,
    coalesce(array_to_string(list_slice(ws, 29, 40), ' '), '') AS d,
    coalesce(array_to_string(list_slice(ws, 41, 100000), ' '), '') AS e
  FROM w
),
-- section rows: offsets from the fixed line layout (header lens:
-- '# Title <id>' = 8+len(id), '## Section One' = 14, '1.2. Numbered' = 13,
-- 'APPENDIX NOTES' = 14); each line contributes len+1, final end = pos
secs0 AS (
  SELECT doc_id,
    'Title ' || doc_id AS p1,
    8 + length(doc_id::VARCHAR) + 1 AS sa, a, b, c, d, e
  FROM parts
),
secs1 AS (
  SELECT doc_id,
    [
      struct_pack(path := p1, t := a,
                  s := sa::BIGINT, e := (sa + length(a) + 1)::BIGINT),
      struct_pack(path := p1 || ' > Section One',
                  t := CASE WHEN c = '' THEN b ELSE b || {NL} || {NL} || c END,
                  s := (sa + length(a) + 1 + 15)::BIGINT,
                  e := (sa + length(a) + 16 + length(b) + length(c) + 3)::BIGINT),
      struct_pack(path := p1 || ' > Section One > 1.2. Numbered', t := d,
                  s := (sa + length(a) + 16 + length(b) + length(c) + 3 + 14)::BIGINT,
                  e := (sa + length(a) + 16 + length(b) + length(c) + 17 + length(d) + 1)::BIGINT),
      struct_pack(path := 'Appendix Notes', t := e,
                  s := (sa + length(a) + 16 + length(b) + length(c) + 17 + length(d) + 16)::BIGINT,
                  e := (sa + length(a) + 16 + length(b) + length(c) + 17 + length(d) + 16 + length(e) + 1)::BIGINT)
    ] AS raw
  FROM secs0
),
secs AS (
  SELECT doc_id, s.path AS path, s.t AS t, s.s AS s, s.e AS e,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) AS si,
    COUNT(*) OVER (PARTITION BY doc_id) AS k
  FROM (
    SELECT doc_id, unnest(raw) AS s, generate_subscripts(raw, 1) AS ord
    FROM secs1
  ) WHERE s.t <> ''
),
-- greedy small-section merge: fold left, emit when acc >= target
m AS (
  SELECT doc_id, 1::BIGINT AS i, k, path AS apath, t AS atext,
         s AS astart, e AS aend,
         []::STRUCT(path VARCHAR, t VARCHAR, s BIGINT, e BIGINT)[] AS done
  FROM secs WHERE si = 1
  UNION ALL
  SELECT m.doc_id, m.i + 1, m.k,
    s.path,
    CASE WHEN length(m.atext) < {TARGET}
         THEN m.atext || {NL} || {NL} || s.t ELSE s.t END,
    CASE WHEN length(m.atext) < {TARGET} THEN m.astart ELSE s.s END,
    s.e,
    CASE WHEN length(m.atext) < {TARGET} THEN m.done
         ELSE list_append(m.done,
                struct_pack(path := m.apath, t := m.atext,
                            s := m.astart, e := m.aend)) END
  FROM m JOIN secs s ON s.doc_id = m.doc_id AND s.si = m.i + 1
),
merged AS (
  SELECT doc_id, ord AS mi, s.path AS path, s.t AS mtext,
         s.s AS mstart, s.e AS mend
  FROM (
    SELECT doc_id, unnest(fin) AS s, generate_subscripts(fin, 1) AS ord
    FROM (
      SELECT doc_id,
        list_append(done, struct_pack(path := apath, t := atext,
                                      s := astart, e := aend)) AS fin
      FROM m WHERE i = k
    )
  )
),
-- packing: sections at/below target pass through; larger ones pack
-- paragraphs greedily with the size-check-BEFORE-add quirk
small AS (
  SELECT doc_id, mi, 1::BIGINT AS ci, mtext AS ctext, path,
         mstart AS cs, mend AS ce
  FROM merged WHERE length(mtext) <= {TARGET}
),
paras AS (
  SELECT doc_id, mi, path, mstart, mend, para, ord AS pi,
         COUNT(*) OVER (PARTITION BY doc_id, mi) AS np
  FROM (
    SELECT doc_id, mi, path, mstart, mend,
      unnest(string_split(mtext, {NL} || {NL})) AS para,
      generate_subscripts(string_split(mtext, {NL} || {NL}), 1) AS ord
    FROM merged WHERE length(mtext) > {TARGET}
  )
),
p AS (
  SELECT doc_id, mi, path, mend, 1::BIGINT AS pi, np,
         para AS cur, mstart AS curstart,
         []::STRUCT(t VARCHAR, s BIGINT, e BIGINT)[] AS done
  FROM paras WHERE pi = 1
  UNION ALL
  SELECT p.doc_id, p.mi, p.path, p.mend, p.pi + 1, p.np,
    CASE WHEN length(p.cur) >= {TARGET} THEN q.para
         ELSE p.cur || {NL} || {NL} || q.para END,
    CASE WHEN length(p.cur) >= {TARGET}
         THEN p.curstart + length(p.cur) ELSE p.curstart END,
    CASE WHEN length(p.cur) >= {TARGET}
         THEN list_append(p.done, struct_pack(t := p.cur, s := p.curstart,
                e := p.curstart + length(p.cur)))
         ELSE p.done END
  FROM p JOIN paras q
    ON q.doc_id = p.doc_id AND q.mi = p.mi AND q.pi = p.pi + 1
),
packed AS (
  SELECT doc_id, mi, ord AS ci, s.t AS ctext, path, s.s AS cs, s.e AS ce
  FROM (
    SELECT doc_id, mi, path, unnest(fin) AS s, generate_subscripts(fin, 1) AS ord
    FROM (
      SELECT doc_id, mi, path,
        list_append(done, struct_pack(t := cur, s := curstart, e := mend)) AS fin
      FROM p WHERE pi = np
    )
  )
),
allc AS (
  SELECT * FROM small UNION ALL SELECT * FROM packed
)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY mi, ci) - 1 AS BIGINT)
    AS chunk_index,
  ctext AS chunk_text, path AS section_path,
  CAST(cs AS BIGINT) AS start_char, CAST(ce AS BIGINT) AS end_char
FROM allc
ORDER BY doc_id, chunk_index
"""

def main():
    for sf in ["0.001", "0.01", "0.1"]:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf{sf}/documents.parquet'")
        sql_rows = con.execute(ORACLE).fetchall()
        docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
        py_rows = []
        for doc_id, text in docs:
            for (ctext, path, idx, s, e) in chunk(structured(doc_id, text)):
                py_rows.append((doc_id, idx, ctext, path, s, e))
        ok = sql_rows == py_rows
        multi = sum(1 for d in {r[0] for r in py_rows}
                    if sum(1 for r in py_rows if r[0] == d) > 1)
        print(f"sf{sf}: python={len(py_rows)} sql={len(sql_rows)} match={ok} "
              f"multi-chunk docs={multi}/{len(docs)}")
        if not ok:
            for a, b in zip(py_rows, sql_rows):
                if a != b:
                    print("PY :", a)
                    print("SQL:", b)
                    break
            sys.exit(1)

if __name__ == "__main__":
    main()
