#!/usr/bin/env python3
"""Prototype: DuckDB recursive-CTE port of the reference Jaro-Winkler
(match-window / transposition loop), validated bit-exact against a Python
reimplementation of graft.sim.JaroWinkler (same IEEE op order).
Dev tooling only."""
import duckdb, random, string


def jaro(s1, s2):
    l1, l2 = len(s1), len(s2)
    mw = max(0, max(l1, l2) // 2 - 1)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        start = max(0, i - mw)
        end = min(i + mw + 1, l2)
        for j in range(start, end):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    trans = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                trans += 1
            k += 1
    m = float(matches)
    t = trans / 2.0
    return ((m / l1) + (m / l2) + ((m - t) / m)) / 3.0


def jw(s1, s2):
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    j = jaro(s1, s2)
    prefix = 0
    maxp = min(4, min(len(s1), len(s2)))
    while prefix < maxp and s1[prefix] == s2[prefix]:
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


pairs = [
    ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
    ("dwayne", "duane"), ("abc corp", "abc corporation"), ("a", "b"),
    ("acme global services", "acme global service"), ("ab", "ba"),
    ("xy", "xyzzy plugh"), ("one two three", "three two one"),
]
rng = random.Random(42)
alpha = string.ascii_lowercase[:6] + " "
for _ in range(300):
    a = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 40))).strip() or "x"
    b = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 40))).strip() or "y"
    pairs.append((a, b))

vals = ",".join(
    f"({i},{i},'{a}','{b}')" for i, (a, b) in enumerate(pairs))

sql = f"""
WITH RECURSIVE
pn AS (SELECT * FROM (VALUES {vals}) t(doc_id_a, doc_id_b, name_a, name_b)),
jprep AS (SELECT doc_id_a, doc_id_b,
  string_split(name_a, '') AS c1, string_split(name_b, '') AS c2,
  length(name_a) AS l1, length(name_b) AS l2,
  greatest(0, greatest(length(name_a), length(name_b)) // 2 - 1) AS mw
  FROM pn WHERE name_a <> name_b),
jwrec(doc_id_a, doc_id_b, i, matches, m1, m2) AS (
  SELECT doc_id_a, doc_id_b, 1, 0,
    list_transform(c1, x -> false), list_transform(c2, x -> false)
  FROM jprep
  UNION ALL
  SELECT doc_id_a, doc_id_b, i + 1,
    CASE WHEN jf IS NULL THEN matches ELSE matches + 1 END,
    CASE WHEN jf IS NULL THEN m1
         ELSE list_transform(generate_series(1, l1),
                p -> CASE WHEN p = i THEN true ELSE m1[p] END) END,
    CASE WHEN jf IS NULL THEN m2
         ELSE list_transform(generate_series(1, l2),
                p -> CASE WHEN p = jf THEN true ELSE m2[p] END) END
  FROM (
    SELECT r.doc_id_a, r.doc_id_b, r.i, r.matches, r.m1, r.m2, p.l1, p.l2,
      list_min(list_filter(
        generate_series(greatest(1, r.i - p.mw), least(r.i + p.mw, p.l2)),
        jj -> NOT r.m2[jj] AND p.c1[r.i] = p.c2[jj])) AS jf
    FROM jwrec r JOIN jprep p USING (doc_id_a, doc_id_b)
    WHERE r.i <= p.l1)
),
jfin AS (
  SELECT f.doc_id_a, f.doc_id_b, f.matches, f.m1, f.m2, p.c1, p.c2, p.l1, p.l2
  FROM jwrec f JOIN jprep p USING (doc_id_a, doc_id_b)
  WHERE f.i = p.l1 + 1),
jtr AS (
  SELECT doc_id_a, doc_id_b, matches, l1, l2, c1, c2,
    list_transform(list_filter(generate_series(1, l1), i -> m1[i]), i -> c1[i]) AS ms1,
    list_transform(list_filter(generate_series(1, l2), i -> m2[i]), i -> c2[i]) AS ms2
  FROM jfin),
jjaro AS (
  SELECT doc_id_a, doc_id_b, l1, l2, c1, c2, matches,
    CASE WHEN matches = 0 THEN CAST(0.0 AS DOUBLE)
    ELSE ((CAST(matches AS DOUBLE) / l1) + (CAST(matches AS DOUBLE) / l2)
          + ((CAST(matches AS DOUBLE)
              - len(list_filter(generate_series(1, len(ms1)), i -> ms1[i] <> ms2[i]))
                / CAST(2.0 AS DOUBLE))
             / CAST(matches AS DOUBLE))) / CAST(3.0 AS DOUBLE) END AS jaro
  FROM jtr),
jsc AS (
  SELECT doc_id_a, doc_id_b,
    CASE WHEN matches = 0 THEN CAST(0.0 AS DOUBLE)
    ELSE jaro
      + coalesce(list_min(list_filter(
            generate_series(1, least(4, least(l1, l2))), i -> c1[i] <> c2[i])) - 1,
          least(4, least(l1, l2)))
        * CAST(0.1 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - jaro) END AS jw_score
  FROM jjaro)
SELECT doc_id_a, doc_id_b, CAST(1.0 AS DOUBLE) AS jw_score FROM pn WHERE name_a = name_b
UNION ALL
SELECT doc_id_a, doc_id_b, jw_score FROM jsc
ORDER BY doc_id_a
"""

rows = duckdb.connect().execute(sql).fetchall()
got = {r[0]: r[2] for r in rows}
bad = 0
for i, (a, b) in enumerate(pairs):
    exp = jw(a, b)
    if got.get(i) != exp:
        bad += 1
        if bad <= 10:
            print(f"MISMATCH {a!r} vs {b!r}: sql={got.get(i)!r} py={exp!r}")
print(f"{len(pairs) - bad}/{len(pairs)} bit-exact")
