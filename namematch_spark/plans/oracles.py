"""DuckDB oracle SQL builders for the driver's correctness gate.

Every query in ``__spark_entry__.queries()`` has an independent ANSI-SQL
formulation here, runnable by DuckDB over the same parquet views.  The
SQL is DuckDB-dialect (it only ever runs there); determinism across
engines comes from:

* the portable hash ``('0x' || substring(md5(s),1,15))::BIGINT``
  == Spark ``conv(substring(md5(s),1,15),16,10)::bigint``;
* the same LCG-derived universal-hash constants (imported from
  ``blocking._lcg_pairs`` — single source of truth);
* rounding every float to 6 decimals on both sides.
"""

from __future__ import annotations

from namematch_spark.operators.blocking import MERSENNE_P, _lcg_pairs
from namematch_spark.sources.records import (person_records_oracle_cte,
                                             person_records_uid2_oracle_cte)

P = MERSENNE_P

# ---------------------------------------------------------------------------
# shared CTE fragments (ER pipeline over the person-record derivation)
# ---------------------------------------------------------------------------

PERSON = person_records_oracle_cte("orders")

# preprocessing: our synthetic names are [A-Z-]+ so the full cleaning
# chain reduces to hyphen→space; dob/gender/age are valid-or-'' already.
AN = f"""
an AS (
  SELECT record_id,
         first_name,
         replace(last_name, '-', ' ') AS last_name,
         dob, gender, age, uid,
         first_name || '::' || replace(last_name, '-', ' ')
            || '::' || dob AS blockstring,
         CASE WHEN (first_name = 'JOHN'
                    AND replace(last_name, '-', ' ') = 'DOE')
                   OR (first_name = 'JANE'
                       AND replace(last_name, '-', ' ') = 'DOE')
                   OR first_name = 'UNKNOWN'
                   OR replace(last_name, '-', ' ') = 'UNKNOWN'
              THEN 1 ELSE 0 END AS drop_from_nm,
         first_name || ' ' || replace(last_name, '-', ' ') AS nn_string
  FROM person
)
"""

ML = """
ml AS (
  SELECT DISTINCT
         a.record_id  AS record_id_1,
         b.record_id  AS record_id_2,
         a.blockstring AS blockstring_1,
         b.blockstring AS blockstring_2,
         a.drop_from_nm AS drop_from_nm_1,
         b.drop_from_nm AS drop_from_nm_2
  FROM an a JOIN an b ON a.uid = b.uid
  WHERE a.uid <> '' AND b.uid <> ''
    AND (a.blockstring < b.blockstring
         OR (a.blockstring = b.blockstring
             AND a.record_id < b.record_id))
)
"""

NN = """
nn AS (
  SELECT nn_string, count(*) AS n_total
  FROM an WHERE drop_from_nm = 0
  GROUP BY nn_string
)
"""

PEN = """
pen AS (
  SELECT last_name,
         round((ntile(1000) OVER (ORDER BY ln_count, last_name) - 1)
               / 999.0 * 0.1, 6) AS commonness_penalty
  FROM (SELECT last_name, count(*) AS ln_count
        FROM an WHERE drop_from_nm = 0 AND last_name <> ''
        GROUP BY last_name)
)
"""

# split-last-name variants (mirrors blocking.name_variants): names
# whose last name contains a space also block under each piece of the
# last-space split; pairs map back to FULL names
VARIANTS = """
variants AS MATERIALIZED (
  SELECT nn_string, nn_string AS full_nn FROM nn
  UNION
  SELECT fn || ' ' || unnest([p1, p2]) AS nn_string, full_nn
  FROM (
    SELECT nn_string AS full_nn,
           string_split(nn_string, ' ')[1] AS fn,
           substr(ln, 1,
                  length(ln)
                  - length(regexp_extract(ln, '([^ ]+)$', 1)) - 1) AS p1,
           regexp_extract(ln, '([^ ]+)$', 1) AS p2
    FROM (SELECT nn_string,
                 substr(nn_string, instr(nn_string, ' ') + 1) AS ln
          FROM nn WHERE instr(nn_string, ' ') > 0)
    WHERE instr(ln, ' ') > 0
  )
),
vnames AS (SELECT DISTINCT nn_string FROM variants)
"""


def detkey_cte(source: str = "nn") -> str:
    """Deterministic phonetic block key (consonant skeleton of
    last-name first token + first initial) — mirrors
    blocking.det_block_key."""
    return f"""
detkey AS (
  SELECT nn_string,
         substr(nn_string, 1, 1) || '|' ||
         regexp_replace(
            coalesce(string_split(nn_string, ' ')[2],
                     string_split(nn_string, ' ')[1]),
            '[AEIOUY]', '', 'g') AS bk
  FROM {source}
)
"""


DETKEY = detkey_cte("nn")

DET_PAIRS = """
detsz AS (SELECT bk, count(*) AS n FROM detkey GROUP BY bk),
det_pairs AS (
  SELECT l.nn_string AS nn_string_1, r.nn_string AS nn_string_2
  FROM detkey l
  JOIN detsz z ON z.bk = l.bk AND z.n > 1 AND z.n <= 500
  JOIN detkey r ON l.bk = r.bk
  WHERE l.nn_string < r.nn_string
)
"""

# variant-relabeled det pairs: block keys computed per variant string,
# keyed rows relabeled to FULL names before the pair join (mirrors
# blocking.det_candidates(variants=...))
DET_PAIRS_RELABELED = """
detsz AS (SELECT bk, count(*) AS n FROM detkey GROUP BY bk),
detkeyf AS (
  SELECT v.full_nn AS nn_string, k.bk
  FROM detkey k
  JOIN detsz z ON z.bk = k.bk AND z.n > 1 AND z.n <= 500
  JOIN variants v ON v.nn_string = k.nn_string
),
det_pairs AS (
  SELECT l.nn_string AS nn_string_1, r.nn_string AS nn_string_2
  FROM detkeyf l JOIN detkeyf r ON l.bk = r.bk
  WHERE l.nn_string < r.nn_string
)
"""


def lsh_pairs_cte(num_hashes: int = 24, rows_per_band: int = 6,
                  source: str = "nn", relabel: bool = False) -> str:
    """Name-shingle minhash LSH candidate pairs, mirroring
    ``blocking.lsh_candidates`` exactly (band key = '_'-joined minhash
    values of the band, same as Spark's concat_ws over the slice)."""
    mins = ",\n         ".join(
        f"min(({a}::BIGINT * h + {b}) % {P}) AS m{i}"
        for i, (a, b) in enumerate(_lcg_pairs(num_hashes)))
    n_bands = num_hashes // rows_per_band
    band_keys = []
    for b in range(n_bands):
        parts = " || '_' || ".join(
            f"m{b * rows_per_band + j}::VARCHAR"
            for j in range(rows_per_band))
        band_keys.append(parts)
    bands_union = "\n  UNION ALL\n".join(
        f"  SELECT nn_string, {b} AS band, {key} AS bkey FROM sig"
        for b, key in enumerate(band_keys))
    return f"""
sh AS (
  SELECT DISTINCT nn_string, substr(p, i, 2) AS s
  FROM (SELECT nn_string, '*' || nn_string || '*' AS p,
               unnest(generate_series(1, length(nn_string) + 1)) AS i
        FROM {source})
),
hs AS (
  SELECT nn_string,
         ('0x' || substring(md5(s), 1, 15))::BIGINT % {P} AS h
  FROM sh
),
sig AS (
  SELECT nn_string,
         {mins}
  FROM hs GROUP BY nn_string
),
bands AS (
{bands_union}
),
bsz AS (SELECT band, bkey, count(*) AS n FROM bands GROUP BY band, bkey),
bandsg AS (
  SELECT b.nn_string, b.band, b.bkey
  FROM bands b JOIN bsz z ON z.band = b.band AND z.bkey = b.bkey
  WHERE z.n > 1 AND z.n <= 2000
),{'''
bandsf AS (
  SELECT v.full_nn AS nn_string, b.band, b.bkey
  FROM bandsg b JOIN variants v ON v.nn_string = b.nn_string
),''' if relabel else ''}
lsh_pairs AS MATERIALIZED (
  SELECT DISTINCT l.nn_string AS nn_string_1, r.nn_string AS nn_string_2
  FROM {'bandsf' if relabel else 'bandsg'} l
  JOIN {'bandsf' if relabel else 'bandsg'} r
    ON l.band = r.band AND l.bkey = r.bkey
  WHERE l.nn_string < r.nn_string
)
"""


# weighted shingle vectors + cosine (mirrors
# blocking.weighted_shingle_vectors / cosine_verify)
VEC = """
nnparts AS (
  SELECT nn_string,
         string_split(nn_string, ' ')[1] AS fn,
         CASE WHEN instr(nn_string, ' ') > 0
              THEN substr(nn_string, instr(nn_string, ' ') + 1)
              ELSE '' END AS ln
  FROM nn
),
fnsh AS (
  SELECT nn_string, substr(p, i, 2) AS sh,
         1.0 / pow(length(p) - 1, 0.1) AS w
  FROM (SELECT nn_string, '*' || fn || '*' AS p,
               unnest(generate_series(1, length(fn) + 1)) AS i
        FROM nnparts)
),
lnsh AS (
  SELECT nn_string, substr(p, i, 2) AS sh,
         1.4 / pow(length(p) - 1, 0.1) AS w
  FROM (SELECT nn_string, '*' || ln || '*' AS p,
               unnest(generate_series(1, length(ln) + 1)) AS i
        FROM nnparts WHERE ln <> '')
),
vec AS MATERIALIZED (
  SELECT nn_string, sh, sum(w) AS w
  FROM (SELECT * FROM fnsh UNION ALL SELECT * FROM lnsh)
  GROUP BY nn_string, sh
),
vnorm AS MATERIALIZED (
  SELECT nn_string, sum(w * w) AS n2 FROM vec GROUP BY nn_string
)
"""

COS = """
cosd AS (
  SELECT c.nn_string_1, c.nn_string_2, c.det_block,
         round(1 - coalesce(d.dot, 0)
                   / sqrt(n1.n2 * n2.n2), 6) AS cos_dist
  FROM cand c
  LEFT JOIN (
    SELECT c2.nn_string_1, c2.nn_string_2,
           sum(v1.w * v2.w) AS dot
    FROM cand c2
    JOIN vec v1 ON v1.nn_string = c2.nn_string_1
    JOIN vec v2 ON v2.nn_string = c2.nn_string_2 AND v2.sh = v1.sh
    GROUP BY c2.nn_string_1, c2.nn_string_2
  ) d ON d.nn_string_1 = c.nn_string_1 AND d.nn_string_2 = c.nn_string_2
  JOIN vnorm n1 ON n1.nn_string = c.nn_string_1
  JOIN vnorm n2 ON n2.nn_string = c.nn_string_2
)
"""


# pair penalty = mean of the two names' last-name penalties, defaulting
# to max_penalty (0.1) for unknown last names, mirroring
# blocking._named_candidates (reference block.py:938-941, 1367-1368)
NAMED = """
named AS (
  SELECT c.nn_string_1, c.nn_string_2, c.det_block, c.cos_dist,
         (coalesce(p1.commonness_penalty, 0.1)
          + coalesce(p2.commonness_penalty, 0.1)) / 2 AS penalty
  FROM cosd c
  LEFT JOIN pen p1
    ON p1.last_name = CASE WHEN instr(c.nn_string_1, ' ') > 0
         THEN substr(c.nn_string_1, instr(c.nn_string_1, ' ') + 1)
         ELSE '' END
  LEFT JOIN pen p2
    ON p2.last_name = CASE WHEN instr(c.nn_string_2, ' ') > 0
         THEN substr(c.nn_string_2, instr(c.nn_string_2, ' ') + 1)
         ELSE '' END
)
"""


def candidates_cte(num_hashes: int = 24, cos_bar: float = 0.4,
                   det_cos_bar: float = 0.55) -> str:
    """Full blocking output (exact ∪ det ∪ LSH + cosine + penalty bars),
    mirroring ``blocking.candidate_nn_pairs`` (penalty TIGHTENS the
    bar: cos + penalty <= bar)."""
    return f"""
{AN.strip()},
{NN.strip()},
{PEN.strip()},
{VARIANTS.strip()},
{detkey_cte("vnames").strip()},
{DET_PAIRS_RELABELED.strip()},
{lsh_pairs_cte(num_hashes, source="vnames", relabel=True).strip()},
cand AS MATERIALIZED (
  SELECT nn_string_1, nn_string_2, max(det_block) AS det_block
  FROM (
    SELECT nn_string_1, nn_string_2, 0 AS det_block FROM lsh_pairs
    UNION ALL
    SELECT nn_string_1, nn_string_2, 1 AS det_block FROM det_pairs
  ) GROUP BY nn_string_1, nn_string_2
),
{VEC.strip()},
{COS.strip()},
{NAMED.strip()},
cand_final AS (
  SELECT nn_string AS nn_string_1, nn_string AS nn_string_2,
         0.0 AS cos_dist
  FROM nn WHERE n_total > 1
  UNION ALL
  SELECT nn_string_1, nn_string_2, cos_dist
  FROM named
  WHERE cos_dist + penalty <= {cos_bar}
     OR (det_block = 1 AND cos_dist + penalty <= {det_cos_bar})
)
"""


def bs_candidates_cte(num_hashes: int = 24, an_cte: str | None = None
                      ) -> str:
    """Blockstring-level blocking output with the reference's F15 bars
    (``block.py:969-981``; dob edit distance −1 when missing, min-age
    absval fallback), mirroring
    ``blocking.candidate_blockstring_pairs`` (default DEFAULT_BARS).
    ``an_cte`` swaps in an alternative all-names CTE (config-schema
    queries) — it must expose nn_string/last_name/dob/age/drop_from_nm.
    """
    return f"""
{(an_cte or AN).strip()},
{NN.strip()},
{PEN.strip()},
{VARIANTS.strip()},
{detkey_cte("vnames").strip()},
{DET_PAIRS_RELABELED.strip()},
{lsh_pairs_cte(num_hashes, source="vnames", relabel=True).strip()},
cand AS MATERIALIZED (
  SELECT nn_string_1, nn_string_2, max(det_block) AS det_block
  FROM (
    SELECT nn_string_1, nn_string_2, 0 AS det_block FROM lsh_pairs
    UNION ALL
    SELECT nn_string_1, nn_string_2, 1 AS det_block FROM det_pairs
  ) GROUP BY nn_string_1, nn_string_2
),
{VEC.strip()},
{COS.strip()},
{NAMED.strip()},
named_pruned AS MATERIALIZED (
  SELECT * FROM named WHERE cos_dist + penalty <= 0.55
),
bst AS MATERIALIZED (
  SELECT nn_string, dob, count(*) AS n_rec,
         list_sort(list_distinct(list(try_cast(age AS DOUBLE))
                                 FILTER (WHERE age <> ''))) AS ages,
         nn_string || '::' || dob AS blockstring
  FROM an WHERE drop_from_nm = 0
  GROUP BY nn_string, dob
),
bsp AS (
  SELECT n.cos_dist, n.penalty, n.det_block,
         b1.blockstring AS blockstring_1,
         b2.blockstring AS blockstring_2,
         CASE WHEN b1.dob = '' OR b2.dob = '' THEN -1
              ELSE levenshtein(b1.dob, b2.dob) END AS dob_ed,
         list_min(flatten(list_transform(b1.ages,
             x -> list_transform(b2.ages, y -> abs(x - y))))) AS age_diff
  FROM named_pruned n
  JOIN bst b1 ON b1.nn_string = n.nn_string_1
  JOIN bst b2 ON b2.nn_string = n.nn_string_2
),
near_bs AS (
  SELECT blockstring_1, blockstring_2, cos_dist
  FROM bsp
  WHERE (cos_dist + penalty <= 0.30 AND dob_ed >= 0 AND dob_ed <= 2)
     OR (cos_dist + penalty <= 0.40 AND dob_ed >= 0 AND dob_ed <= 1)
     OR (cos_dist + penalty <= 0.26 AND dob_ed = -1
         AND (age_diff IS NULL OR age_diff <= 3))
     OR (det_block = 1 AND cos_dist + penalty <= 0.55
         AND ((dob_ed >= 0 AND dob_ed <= 2)
              OR (dob_ed = -1 AND (age_diff IS NULL OR age_diff <= 3))))
),
cand_bs AS (
  SELECT b1.blockstring AS blockstring_1,
         b2.blockstring AS blockstring_2, 0.0 AS cos_dist
  FROM bst b1 JOIN bst b2 ON b1.nn_string = b2.nn_string
  WHERE (b1.blockstring < b2.blockstring
         OR (b1.blockstring = b2.blockstring AND b1.n_rec > 1))
    AND ((CASE WHEN b1.dob = '' OR b2.dob = '' THEN -1
               ELSE levenshtein(b1.dob, b2.dob) END BETWEEN 0 AND 2)
         OR ((b1.dob = '' OR b2.dob = '')
             AND (list_min(flatten(list_transform(b1.ages,
                      x -> list_transform(b2.ages, y -> abs(x - y)))))
                  IS NULL
                  OR list_min(flatten(list_transform(b1.ages,
                      x -> list_transform(b2.ages, y -> abs(x - y)))))
                     <= 3)))
  UNION ALL
  SELECT * FROM near_bs
)
"""


# ---------------------------------------------------------------------------
# public oracle texts (ER)
# ---------------------------------------------------------------------------

def er_preprocess() -> str:
    return f"""
WITH person AS ({PERSON}),
{AN.strip()}
SELECT record_id, first_name, last_name, dob, gender, age, uid,
       blockstring, drop_from_nm
FROM an
"""


def er_blockstring_nn() -> str:
    """P16 round-trip (``utils/utils.py:267-290``): first two ::-parts
    of the blockstring are the nn_string."""
    return f"""
WITH person AS ({PERSON}),
{AN.strip()}
SELECT record_id, blockstring,
       split_part(blockstring, '::', 1) || '::' ||
       split_part(blockstring, '::', 2) AS nn_string
FROM an
"""


def er_mustlinks() -> str:
    return f"""
WITH person AS ({PERSON}),
{AN.strip()},
{ML.strip()}
SELECT * FROM ml
"""


PERSON_UID2 = person_records_uid2_oracle_cte("orders")

# all-names CTE over the two-UniqueID derivation: identical cleaning,
# uid2 rides along
AN_UID2 = AN.replace("dob, gender, age, uid,", "dob, gender, age, uid, uid2,")
assert AN_UID2 != AN, "AN select list changed — update AN_UID2 splice"


def er_mustlinks_multi() -> str:
    """J1 over SEVERAL UniqueID variables: per-variable self-joins
    unioned then de-duplicated on the record pair (reference
    ``generate_must_links.py:160-193``).  blockstring/drop_from_nm are
    per-record so DISTINCT over all columns == pair-level dedup."""
    per_var = "\n  UNION ALL\n".join(f"""
  SELECT a.record_id  AS record_id_1,
         b.record_id  AS record_id_2,
         a.blockstring AS blockstring_1,
         b.blockstring AS blockstring_2,
         a.drop_from_nm AS drop_from_nm_1,
         b.drop_from_nm AS drop_from_nm_2
  FROM an a JOIN an b ON a.{u} = b.{u}
  WHERE a.{u} <> '' AND b.{u} <> ''
    AND (a.blockstring < b.blockstring
         OR (a.blockstring = b.blockstring
             AND a.record_id < b.record_id))""".rstrip()
        for u in ("uid", "uid2"))
    return f"""
WITH person AS ({PERSON_UID2}),
{AN_UID2.strip()}
SELECT DISTINCT * FROM (
{per_var}
)
"""


def _label3_sql(c1: str, c2: str, leven_thresh: int = 1) -> str:
    return f"""CASE WHEN {c1}='' OR {c2}='' THEN ''
       WHEN {c1} = {c2} THEN '1'
       WHEN levenshtein({c1}, {c2}) <= {leven_thresh} THEN ''
       ELSE '0' END"""


def er_labels_multi() -> str:
    """F14 consensus labels over two UniqueID variables (reference
    ``comparison_functions.py:349-396``): per-variable 3-state labels
    plus the all-agree consensus, over the full candidate record-pair
    expansion."""
    return f"""
WITH person AS ({PERSON_UID2}),
{bs_candidates_cte(an_cte=AN_UID2).strip()},
an2 AS (SELECT *, nn_string || '::' || dob AS bs
        FROM an WHERE drop_from_nm = 0),
rp AS (
  SELECT a1.record_id AS record_id_1, a2.record_id AS record_id_2,
         a1.uid AS uid_1, a2.uid AS uid_2,
         a1.uid2 AS uid2_1, a2.uid2 AS uid2_2
  FROM cand_bs c
  JOIN an2 a1 ON a1.bs = c.blockstring_1
  JOIN an2 a2 ON a2.bs = c.blockstring_2
  WHERE c.blockstring_1 <> c.blockstring_2
     OR a1.record_id < a2.record_id
),
lab AS (
  SELECT record_id_1 || '__' || record_id_2 AS dr_id,
    {_label3_sql("uid_1", "uid_2")} AS label_uid,
    {_label3_sql("uid2_1", "uid2_2")} AS label_uid2
  FROM rp
)
SELECT dr_id, label_uid, label_uid2,
  CASE WHEN (label_uid='0')::INT + (label_uid2='0')::INT = 0
            AND (label_uid='1')::INT + (label_uid2='1')::INT > 0
       THEN '1'
       WHEN (label_uid='0')::INT + (label_uid2='0')::INT > 0
            AND (label_uid='1')::INT + (label_uid2='1')::INT = 0
       THEN '0'
       ELSE '' END AS label
FROM lab
"""


def er_blockstats() -> str:
    return f"""
WITH person AS ({PERSON}),
{AN.strip()},
{NN.strip()}
SELECT nn_string, n_total FROM nn
"""


def er_penalty() -> str:
    return f"""
WITH person AS ({PERSON}),
{AN.strip()},
{PEN.strip()}
SELECT last_name, commonness_penalty FROM pen
"""


def er_det_candidates() -> str:
    return f"""
WITH person AS ({PERSON}),
{AN.strip()},
{NN.strip()},
{DETKEY.strip()},
{DET_PAIRS.strip()}
SELECT nn_string_1, nn_string_2 FROM det_pairs
"""


def er_lsh_candidates(num_hashes: int = 24, rows_per_band: int = 6) -> str:
    return f"""
WITH person AS ({PERSON}),
{AN.strip()},
{NN.strip()},
{lsh_pairs_cte(num_hashes, rows_per_band).strip()}
SELECT nn_string_1, nn_string_2 FROM lsh_pairs
"""


def er_candidates() -> str:
    return f"""
WITH person AS ({PERSON}),
{candidates_cte().strip()}
SELECT nn_string_1, nn_string_2, cos_dist FROM cand_final
"""


def er_candidates_bs() -> str:
    return f"""
WITH person AS ({PERSON}),
{bs_candidates_cte().strip()}
SELECT blockstring_1, blockstring_2, cos_dist FROM cand_bs
"""


def er_candidates_cov() -> str:
    """U3 — covered_pair flag + uncovered must-link injection
    (reference ``block.py:741-829, 872-904``): candidate blockstring
    pairs get covered_pair=1; non-equal-blockstring must-link pairs
    missing from the candidate set (order-normalized key) are appended
    with covered_pair=0 and the true weighted-shingle cosine distance
    (reusing the vec/vnorm CTEs of the candidate chain)."""
    return f"""
WITH person AS ({PERSON}),
{bs_candidates_cte().strip()},
{ML.strip()},
tp AS (
  SELECT DISTINCT
         least(b1, b2) AS blockstring_1,
         greatest(b1, b2) AS blockstring_2
  FROM (
    SELECT string_split(m.blockstring_1, '::')[1] || ' '
           || string_split(m.blockstring_1, '::')[2] || '::'
           || string_split(m.blockstring_1, '::')[3] AS b1,
           string_split(m.blockstring_2, '::')[1] || ' '
           || string_split(m.blockstring_2, '::')[2] || '::'
           || string_split(m.blockstring_2, '::')[3] AS b2
    FROM ml m
    WHERE m.drop_from_nm_1 = 0 AND m.drop_from_nm_2 = 0
  )
  WHERE b1 <> b2
),
ckeys AS (
  SELECT least(blockstring_1, blockstring_2) AS blockstring_1,
         greatest(blockstring_1, blockstring_2) AS blockstring_2
  FROM cand_bs
),
up AS (
  SELECT t.blockstring_1, t.blockstring_2,
         string_split(t.blockstring_1, '::')[1] AS nn1,
         string_split(t.blockstring_2, '::')[1] AS nn2
  FROM tp t
  ANTI JOIN ckeys c
    ON c.blockstring_1 = t.blockstring_1
   AND c.blockstring_2 = t.blockstring_2
),
upcos AS (
  SELECT up.blockstring_1, up.blockstring_2,
         round(1 - coalesce(d.dot, 0) / sqrt(n1.n2 * n2.n2), 6)
            AS cos_dist
  FROM up
  LEFT JOIN (
    SELECT u2.blockstring_1, u2.blockstring_2, sum(v1.w * v2.w) AS dot
    FROM up u2
    JOIN vec v1 ON v1.nn_string = u2.nn1
    JOIN vec v2 ON v2.nn_string = u2.nn2 AND v2.sh = v1.sh
    GROUP BY u2.blockstring_1, u2.blockstring_2
  ) d ON d.blockstring_1 = up.blockstring_1
     AND d.blockstring_2 = up.blockstring_2
  JOIN vnorm n1 ON n1.nn_string = up.nn1
  JOIN vnorm n2 ON n2.nn_string = up.nn2
)
SELECT blockstring_1, blockstring_2, round(cos_dist, 6) AS cos_dist,
       1 AS covered_pair
FROM cand_bs
UNION ALL
SELECT blockstring_1, blockstring_2, cos_dist, 0 AS covered_pair
FROM upcos
"""


def er_pair_features() -> str:
    """Record-pair expansion (blockstring level) + the cross-engine-
    checkable feature subset (everything except soundex/nysiis, which
    have no DuckDB equivalent — those are covered by pytest goldens)."""
    return f"""
WITH person AS ({PERSON}),
{bs_candidates_cte().strip()},
an2 AS (SELECT *, nn_string || '::' || dob AS bs
        FROM an WHERE drop_from_nm = 0),
rp AS (
  SELECT c.cos_dist,
         a1.record_id AS record_id_1, a2.record_id AS record_id_2,
         a1.first_name AS fn1, a2.first_name AS fn2,
         a1.last_name AS ln1, a2.last_name AS ln2,
         a1.dob AS dob1, a2.dob AS dob2,
         a1.age AS age1, a2.age AS age2,
         a1.gender AS g1, a2.gender AS g2,
         a1.uid AS uid_1, a2.uid AS uid_2
  FROM cand_bs c
  JOIN an2 a1 ON a1.bs = c.blockstring_1
  JOIN an2 a2 ON a2.bs = c.blockstring_2
  WHERE c.blockstring_1 <> c.blockstring_2
     OR a1.record_id < a2.record_id
)
SELECT record_id_1 || '__' || record_id_2 AS dr_id,
  CASE WHEN fn1='' OR fn2='' THEN 1.0 ELSE 0.0 END AS var_first_name_missing,
  CASE WHEN fn1='' OR fn2='' THEN NULL
       ELSE levenshtein(fn1, fn2)::DOUBLE END AS var_first_name_edit_dist,
  CASE WHEN fn1='' OR fn2='' THEN NULL
       ELSE round(1 - jaro_winkler_similarity(fn1, fn2), 6)
       END AS var_first_name_jw_dist,
  CASE WHEN ln1='' OR ln2='' THEN 1.0 ELSE 0.0 END AS var_last_name_missing,
  CASE WHEN ln1='' OR ln2='' THEN NULL
       ELSE levenshtein(ln1, ln2)::DOUBLE END AS var_last_name_edit_dist,
  CASE WHEN ln1='' OR ln2='' THEN NULL
       ELSE round(1 - jaro_winkler_similarity(ln1, ln2), 6)
       END AS var_last_name_jw_dist,
  CASE WHEN dob1='' OR dob2='' THEN 1.0 ELSE 0.0 END AS var_dob_missing,
  CASE WHEN dob1='' OR dob2='' THEN NULL
       ELSE levenshtein(dob1, dob2)::DOUBLE END AS var_dob_edit_dist,
  CASE WHEN dob1='' OR dob2='' THEN NULL
       ELSE abs(date_diff('day', dob2::DATE, dob1::DATE))::DOUBLE
       END AS var_dob_day_diff,
  CASE WHEN age1='' OR age2='' THEN 1.0 ELSE 0.0 END AS var_age_missing,
  CASE WHEN age1='' OR age2='' THEN NULL
       ELSE abs(age1::DOUBLE - age2::DOUBLE) END AS var_age_num_diff,
  CASE WHEN g1='' OR g2='' THEN 1.0 ELSE 0.0 END AS var_gender_missing,
  CASE WHEN g1='' OR g2='' THEN NULL
       ELSE (g1 = g2)::INT::DOUBLE END AS var_gender_exact_match,
  CASE WHEN uid_1='' OR uid_2='' THEN ''
       WHEN uid_1 = uid_2 THEN '1'
       WHEN levenshtein(uid_1, uid_2) <= 1 THEN ''
       ELSE '0' END AS label
FROM rp
"""


def er_cc_mustlinks() -> str:
    """Connected components over the must-link graph: recursive
    min-label propagation (transitive closure of "reachable from a
    smaller id") — an independent formulation of the same semantics as
    the large-star/small-star Spark implementation."""
    return f"""
WITH RECURSIVE person AS ({PERSON}),
{AN.strip()},
{ML.strip()},
edges AS (
  SELECT record_id_1 AS src, record_id_2 AS dst FROM ml
  UNION
  SELECT record_id_2, record_id_1 FROM ml
),
nodes AS (SELECT DISTINCT record_id FROM an WHERE drop_from_nm = 0),
reach(node, lbl) AS (
  SELECT record_id, record_id FROM nodes
  UNION
  SELECT e.dst, r.lbl
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.lbl < e.dst
)
SELECT node AS record_id, min(lbl) AS cluster_id
FROM reach GROUP BY node
"""


RP_CTE = """
an2 AS (SELECT *, nn_string || '::' || dob AS bs
        FROM an WHERE drop_from_nm = 0),
rp AS (
  SELECT c.cos_dist,
         a1.record_id AS record_id_1, a2.record_id AS record_id_2,
         a1.first_name AS fn1, a2.first_name AS fn2,
         a1.last_name AS ln1, a2.last_name AS ln2,
         a1.dob AS dob1, a2.dob AS dob2,
         a1.age AS age1, a2.age AS age2,
         a1.gender AS g1, a2.gender AS g2,
         a1.uid AS uid_1, a2.uid AS uid_2
  FROM cand_bs c
  JOIN an2 a1 ON a1.bs = c.blockstring_1
  JOIN an2 a2 ON a2.bs = c.blockstring_2
  WHERE c.blockstring_1 <> c.blockstring_2
     OR a1.record_id < a2.record_id
)
"""


def _det_scored_with() -> str:
    """Shared WITH-prefix of the deterministic :class:`ExprScorer`
    twins: candidate blockstring pairs → record pairs → pair features →
    per-model routing + linear scores.  ``scored`` keeps ``label`` so
    the flipped0 twin can filter on it."""
    from namematch_spark.operators.model import deterministic_model_set
    ms = deterministic_model_set()
    basic = ms.models["basic"]
    nodob = ms.models["no_dob"]
    return f"""
WITH person AS ({PERSON}),
{bs_candidates_cte().strip()},
{RP_CTE.strip()},
feat AS (
  SELECT record_id_1, record_id_2,
         record_id_1 || '__' || record_id_2 AS dr_id,
  CASE WHEN fn1='' OR fn2='' THEN NULL
       ELSE levenshtein(fn1, fn2)::DOUBLE END AS var_first_name_edit_dist,
  CASE WHEN ln1='' OR ln2='' THEN NULL
       ELSE levenshtein(ln1, ln2)::DOUBLE END AS var_last_name_edit_dist,
  CASE WHEN dob1='' OR dob2='' THEN 1.0 ELSE 0.0 END AS var_dob_missing,
  CASE WHEN dob1='' OR dob2='' THEN NULL
       ELSE levenshtein(dob1, dob2)::DOUBLE END AS var_dob_edit_dist,
  CASE WHEN age1='' OR age2='' THEN NULL
       ELSE abs(age1::DOUBLE - age2::DOUBLE) END AS var_age_num_diff,
  CASE WHEN g1='' OR g2='' THEN NULL
       ELSE (g1 = g2)::INT::DOUBLE END AS var_gender_exact_match,
  CASE WHEN uid_1='' OR uid_2='' THEN ''
       WHEN uid_1 = uid_2 THEN '1'
       WHEN levenshtein(uid_1, uid_2) <= 1 THEN ''
       ELSE '0' END AS label
  FROM rp
),
scored AS (
  SELECT dr_id, record_id_1, record_id_2, label,
         CASE WHEN var_dob_missing = 1.0 THEN 'no_dob'
              ELSE 'basic' END AS model_to_use,
         CASE WHEN var_dob_missing = 1.0 THEN {nodob.model.sql()}
              ELSE {basic.model.sql()} END AS phat,
         CASE WHEN label = '1' THEN 1 ELSE 0 END AS gt
  FROM feat
)"""


def _det_threshold_case(basic_threshold: float = 0.5) -> str:
    """Per-model threshold CASE of ``potential_links_model_set``."""
    from namematch_spark.operators.model import deterministic_model_set
    ms = deterministic_model_set(basic_threshold=basic_threshold)
    return (f"CASE WHEN model_to_use = 'no_dob' "
            f"THEN {ms.models['no_dob'].threshold!r} "
            f"ELSE {ms.models['basic'].threshold!r} END")


def er_potential_links_det() -> str:
    """M4/M6 machinery with the deterministic :class:`ExprScorer`
    stand-in (``operators/model.py``): model_to_use routing, per-model
    linear scores, per-model thresholds, gt override — the exact SQL
    mirror of ``score_with_model_set`` + ``potential_links_model_set``
    minus the RF (the only non-expressible piece).  Reference flow:
    ``predict.py:88-141`` scoring → ``predict.py:109-134`` threshold
    filter."""
    return f"""{_det_scored_with()}
SELECT dr_id, record_id_1, record_id_2, model_to_use, phat, gt
FROM scored
WHERE phat >= {_det_threshold_case()}
   OR gt = 1
"""


def er_flipped0_det() -> str:
    """M6 flipped0 set (reference ``fit_model.py:724-760`` →
    ``flipped0_potential_links.csv``): labeled-0 pairs the model scores
    ABOVE their model's threshold — the potential-links filter composed
    with ``label = '0'``, exactly the CLI artifact's definition
    (``cli.py`` flipped0_potential_edges.csv).  Threshold 0.03 — below
    the det scorer's labeled-0 tail (phat 0.05 at sf0.01) so the
    checked set is non-empty; the machinery is identical at any
    threshold."""
    return f"""{_det_scored_with()}
SELECT dr_id, record_id_1, record_id_2, model_to_use, label, phat
FROM scored
WHERE (phat >= {_det_threshold_case(0.03)} OR gt = 1)
  AND label = '0'
"""


def er_selection_weight_det() -> str:
    """M3 selection-bias weight (reference ``predict.py:229-233`` +
    ``fit_model.py:424-426``): ``selection_weight =
    (prob_match_train + 1) / (p_selected + 1)`` with the ExprScorer
    stand-ins for both the match scorer (basic terms) and the selection
    scorer (no-dob terms).  IEEE double division over already
    bit-matching 6-dp inputs, so the raw doubles compare exactly."""
    from namematch_spark.operators.model import deterministic_model_set
    ms = deterministic_model_set()
    basic = ms.models["basic"]
    nodob = ms.models["no_dob"]
    return f"""{_det_scored_with()},
selbase AS (
  SELECT dr_id, record_id_1, record_id_2,
         {basic.model.sql()} AS phat,
         {nodob.model.sql()} AS p_selected
  FROM feat
)
SELECT dr_id, record_id_1, record_id_2, phat, p_selected,
       (0.05 + 1) / (p_selected + 1) AS selection_weight
FROM selbase
"""


def er_clusters_det() -> str:
    """G1-G5 end-to-end with deterministic edge scores — the FULL
    constrained clustering value check, conflict components included.

    The greedy constrained replay (reference loop ``cluster.py:611-726``)
    is sequential per component; per-component order restricted from the
    global (gt desc, phat desc, dr_id) order is exactly what the Spark
    ``applyInPandas`` replay executes.  Here the same loop is expressed
    as a DuckDB recursive CTE: state rows carry (component, record,
    cluster-id, cluster-uid), iteration k applies each component's k-th
    ranked edge simultaneously (window-function lookups over the
    recursive working table — components are independent, so parallel
    per-component steps are order-equivalent to the reference's global
    sequential loop).  The ≤1-distinct-uid auto constraint
    (``cluster.py:272-324``, leven_thresh=None) reduces to a single
    cluster-uid summary value, which makes the merge validity check
    O(1) per row.  Clean components (no uid conflict) come from
    recursive min-label connected components; singletons fall out of
    the same CTE.
    """
    return f"""
WITH RECURSIVE person AS ({PERSON}),
{bs_candidates_cte().strip()},
{ML.strip()},
{RP_CTE.strip()},
pot AS MATERIALIZED (
  SELECT record_id_1 AS r1, record_id_2 AS r2,
         record_id_1 || '__' || record_id_2 AS dr_id,
         0 AS gt, 1 - cos_dist AS phat
  FROM rp
  WHERE NOT (uid_1 <> '' AND uid_2 <> '' AND uid_1 <> uid_2)
),
mle AS (
  SELECT record_id_1 AS r1, record_id_2 AS r2,
         record_id_1 || '__' || record_id_2 AS dr_id,
         1 AS gt, 1.0 AS phat
  FROM ml WHERE drop_from_nm_1 = 0 AND drop_from_nm_2 = 0
),
alledges AS MATERIALIZED (
  SELECT * FROM pot UNION ALL SELECT * FROM mle
),
cedges AS (
  SELECT r1 AS src, r2 AS dst FROM alledges
  UNION
  SELECT r2, r1 FROM alledges
),
nodes AS (SELECT DISTINCT record_id FROM an2),
reach(node, lbl) AS (
  SELECT record_id, record_id FROM nodes
  UNION
  SELECT e.dst, r.lbl
  FROM reach r JOIN cedges e ON e.src = r.node
  WHERE r.lbl < e.dst
),
comp AS MATERIALIZED (
  SELECT node AS record_id, min(lbl) AS comp_id
  FROM reach GROUP BY node
),
cstat AS (
  SELECT c.comp_id,
         count(DISTINCT CASE WHEN a.uid <> '' THEN a.uid END) AS n_uid
  FROM comp c JOIN an2 a USING (record_id)
  GROUP BY c.comp_id
),
dirty AS (SELECT comp_id FROM cstat WHERE n_uid > 1),
dedges AS MATERIALIZED (
  SELECT e.r1, e.r2, e.gt, e.phat, c.comp_id,
         row_number() OVER (PARTITION BY c.comp_id
                            ORDER BY e.gt DESC, e.phat DESC, e.dr_id)
             AS rk
  FROM alledges e
  JOIN comp c ON c.record_id = e.r1
  WHERE c.comp_id IN (SELECT comp_id FROM dirty)
),
drecs AS MATERIALIZED (
  SELECT c.comp_id, a.record_id, a.uid
  FROM comp c JOIN an2 a USING (record_id)
  WHERE c.comp_id IN (SELECT comp_id FROM dirty)
),
state AS (
  SELECT 0 AS k, comp_id, record_id, record_id AS cid, uid AS cuid
  FROM drecs
  UNION ALL
  SELECT k + 1, comp_id, record_id,
         CASE WHEN ok AND cid IN (c1, c2) THEN least(c1, c2)
              ELSE cid END,
         CASE WHEN ok AND cid IN (c1, c2)
              THEN (CASE WHEN uu1 <> '' THEN uu1 ELSE uu2 END)
              ELSE cuid END
  FROM (
    SELECT s.k, s.comp_id, s.record_id, s.cid, s.cuid,
       max(CASE WHEN s.record_id = e.r1 THEN s.cid END)
           OVER (PARTITION BY s.comp_id) AS c1,
       max(CASE WHEN s.record_id = e.r2 THEN s.cid END)
           OVER (PARTITION BY s.comp_id) AS c2,
       max(CASE WHEN s.record_id = e.r1 THEN s.cuid END)
           OVER (PARTITION BY s.comp_id) AS uu1,
       max(CASE WHEN s.record_id = e.r2 THEN s.cuid END)
           OVER (PARTITION BY s.comp_id) AS uu2
    FROM state s JOIN dedges e
      ON e.comp_id = s.comp_id AND e.rk = s.k + 1
  ) t(k, comp_id, record_id, cid, cuid, c1, c2, uu1, uu2),
  LATERAL (SELECT c1 <> c2
           AND NOT (uu1 <> '' AND uu2 <> '' AND uu1 <> uu2) AS ok) v
),
greedy AS (
  SELECT record_id, cid AS cluster_id FROM (
    SELECT record_id, cid,
           row_number() OVER (PARTITION BY record_id
                              ORDER BY k DESC) AS rn
    FROM state) WHERE rn = 1
)
SELECT record_id, comp_id AS cluster_id FROM comp
WHERE comp_id NOT IN (SELECT comp_id FROM dirty)
UNION ALL
SELECT record_id, cluster_id FROM greedy
"""


def er_output() -> str:
    """Output stage over the deterministic must-link clustering: raw
    values restored into the cleaned name columns
    (``generate_output.py:104-116``), cluster ids left-joined (dropped
    records keep NULL)."""
    return f"""
WITH RECURSIVE person AS ({PERSON}),
{AN.strip()},
{ML.strip()},
edges AS (
  SELECT record_id_1 AS src, record_id_2 AS dst FROM ml
  UNION
  SELECT record_id_2, record_id_1 FROM ml
),
nodes AS (SELECT DISTINCT record_id FROM an WHERE drop_from_nm = 0),
reach(node, lbl) AS (
  SELECT record_id, record_id FROM nodes
  UNION
  SELECT e.dst, r.lbl
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.lbl < e.dst
),
cc AS (SELECT node AS record_id, min(lbl) AS cluster_id
       FROM reach GROUP BY node)
SELECT an.record_id,
       p.first_name, p.last_name,
       an.dob, an.gender, an.age, an.uid,
       an.blockstring, an.drop_from_nm,
       cc.cluster_id
FROM an
JOIN person p ON p.record_id = an.record_id
LEFT JOIN cc ON cc.record_id = an.record_id
"""


def er_phat_hist() -> str:
    """A10 — the report's phat histogram binning
    (``model_evaluation_functions.py:279-287``): 0.1-wide buckets over
    the deterministic potential-links twin.  Bucket edges are safe to
    compare because the det twin's phat doubles already hash-match."""
    return f"""
WITH pl AS ({er_potential_links_det()})
SELECT floor(phat * 10) / 10 AS bucket, count(*) AS n
FROM pl
GROUP BY 1
"""


def er_cluster_sizes() -> str:
    """A9 — the report's cluster-size frequency table (two-level count
    aggregation) over the must-link connected components."""
    return f"""
WITH cl AS ({er_cc_mustlinks()})
SELECT size, count(*) AS n_clusters
FROM (SELECT cluster_id, count(*) AS size FROM cl GROUP BY 1)
GROUP BY 1
"""


def er_incremental_block() -> str:
    """Incremental blocking parity (reference ``block.py:467-532``):
    the index-driven incremental candidate set must equal the full
    rebuild's blockstring pairs restricted to pairs touching a name
    seen in a ``file_type='new'`` record (deterministic new-record
    rule: numeric record-id suffix % 5 = 0, portable in both
    engines)."""
    return f"""
WITH person AS ({PERSON}),
{bs_candidates_cte().strip()},
newnames AS (
  SELECT DISTINCT nn_string FROM an
  WHERE drop_from_nm = 0
    AND (try_cast(substr(record_id, 6) AS BIGINT) % 5) = 0
)
SELECT blockstring_1, blockstring_2, cos_dist FROM cand_bs
WHERE split_part(blockstring_1, '::', 1)
        IN (SELECT nn_string FROM newnames)
   OR split_part(blockstring_2, '::', 1)
        IN (SELECT nn_string FROM newnames)
"""


def er_incremental() -> str:
    """Incremental clustering over the deterministic must-link graph:
    records whose uid is divisible by 5 carry a prior cluster id
    (``prev_<uid>``); clusters containing them keep that id
    (reference cluster.py:140-144,364-381 id-stability semantics)."""
    return f"""
WITH RECURSIVE person AS ({PERSON}),
{AN.strip()},
{ML.strip()},
edges AS (
  SELECT record_id_1 AS src, record_id_2 AS dst FROM ml
  WHERE drop_from_nm_1 = 0 AND drop_from_nm_2 = 0
  UNION
  SELECT record_id_2, record_id_1 FROM ml
  WHERE drop_from_nm_1 = 0 AND drop_from_nm_2 = 0
),
nodes AS (SELECT DISTINCT record_id FROM an WHERE drop_from_nm = 0),
reach(node, lbl) AS (
  SELECT record_id, record_id FROM nodes
  UNION
  SELECT e.dst, r.lbl
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.lbl < e.dst
),
cc AS (SELECT node AS record_id, min(lbl) AS cluster_id
       FROM reach GROUP BY node),
eidmap AS (
  SELECT cc.cluster_id, min('prev_' || an.uid) AS eid
  FROM cc JOIN an ON an.record_id = cc.record_id
  WHERE an.uid <> '' AND an.uid::BIGINT % 5 = 0
  GROUP BY cc.cluster_id
)
SELECT cc.record_id,
       coalesce(e.eid, cc.cluster_id) AS cluster_id
FROM cc LEFT JOIN eidmap e ON e.cluster_id = cc.cluster_id
"""


def er_nameprob_features() -> str:
    """Name-probability features over the candidate record pairs: the
    six kept count-percentile features (``generate_data_rows.py:
    253-259``), the swap-repair decision (``comparison_functions.py:
    77-146``) and the 5-gram log P(name) (``counter.py:22-43``) — all
    pure SQL (explode + group + window + log-sum)."""
    return f"""
WITH person AS ({PERSON}),
{bs_candidates_cte().strip()},
an2 AS (SELECT *, nn_string || '::' || dob AS bs
        FROM an WHERE drop_from_nm = 0),
rp AS (
  SELECT a1.record_id AS record_id_1, a2.record_id AS record_id_2,
         a1.first_name AS fn1, a1.last_name AS ln1,
         a2.first_name AS fn2, a2.last_name AS ln2
  FROM cand_bs c
  JOIN an2 a1 ON a1.bs = c.blockstring_1
  JOIN an2 a2 ON a2.bs = c.blockstring_2
  WHERE c.blockstring_1 <> c.blockstring_2
     OR a1.record_id < a2.record_id
),
nps AS (SELECT '*' || replace(first_name, ' ', '') || ' '
               || replace(last_name, ' ', '') || '*' AS s,
               replace(first_name, ' ', '') AS f,
               replace(last_name, ' ', '') AS l
        FROM an WHERE drop_from_nm = 0),
grams AS (
  SELECT substr(s, i, 5) AS gram
  FROM (SELECT s, unnest(generate_series(1, length(s) - 4)) AS i
        FROM nps WHERE length(s) >= 5)
  UNION ALL
  SELECT substr(s, i, 4)
  FROM (SELECT s, unnest(generate_series(1, length(s) - 3)) AS i
        FROM nps WHERE length(s) >= 4)
),
gcnt AS (SELECT gram, count(*) AS cnt FROM grams GROUP BY gram),
dn AS (SELECT DISTINCT s FROM nps),
npos AS (SELECT s, substr(s, i, 5) AS g5, substr(s, i, 4) AS g4
         FROM (SELECT s, unnest(generate_series(1, length(s) - 4)) AS i
               FROM dn WHERE length(s) >= 5)),
nprob AS (
  SELECT npos.s,
         sum(ln((coalesce(c5.cnt, 0) + 0.001)
                / (coalesce(c4.cnt, 0) + 0.001))) AS log_prob,
         exp(sum(ln((coalesce(c5.cnt, 0) + 0.001)
                    / (coalesce(c4.cnt, 0) + 0.001)))) AS prob
  FROM npos LEFT JOIN gcnt c5 ON c5.gram = npos.g5
            LEFT JOIN gcnt c4 ON c4.gram = npos.g4
  GROUP BY npos.s
),
pcn AS (SELECT s AS v, count(*) AS c FROM nps GROUP BY s),
pctl_name AS (SELECT v, round(rank() OVER (ORDER BY c)::DOUBLE
                              / (SELECT count(*) FROM pcn), 2) AS p
              FROM pcn),
pcf AS (SELECT f AS v, count(*) AS c FROM nps GROUP BY f),
pctl_fn AS (SELECT v, round(rank() OVER (ORDER BY c)::DOUBLE
                            / (SELECT count(*) FROM pcf), 2) AS p
            FROM pcf),
pcl AS (SELECT l AS v, count(*) AS c FROM nps GROUP BY l),
pctl_ln AS (SELECT v, round(rank() OVER (ORDER BY c)::DOUBLE
                            / (SELECT count(*) FROM pcl), 2) AS p
            FROM pcl),
feat AS (
  SELECT record_id_1 || '__' || record_id_2 AS dr_id,
         '*' || replace(fn1, ' ', '') || ' '
             || replace(ln1, ' ', '') || '*' AS s1,
         '*' || replace(fn2, ' ', '') || ' '
             || replace(ln2, ' ', '') || '*' AS s2,
         replace(fn1, ' ', '') AS f1, replace(fn2, ' ', '') AS f2,
         replace(ln1, ' ', '') AS l1, replace(ln2, ' ', '') AS l2,
         levenshtein(fn1 || ln1, fn2 || ln2) AS name_ed,
         levenshtein(ln1 || fn1, fn2 || ln2) AS rev_ed
  FROM rp
)
SELECT f.dr_id,
       abs(n1.p - n2.p) AS diff_count_pctl_name,
       greatest(n1.p, n2.p) AS max_count_pctl_name,
       abs(f1p.p - f2p.p) AS diff_count_pctl_fn,
       greatest(f1p.p, f2p.p) AS max_count_pctl_fn,
       abs(l1p.p - l2p.p) AS diff_count_pctl_ln,
       greatest(l1p.p, l2p.p) AS max_count_pctl_ln,
       CASE WHEN f.rev_ed < f.name_ed
            THEN (p2.prob < p1.prob)::INT + 1 ELSE 0 END
          AS switched_name,
       round(p1.log_prob, 6) AS log_prob_name_1
FROM feat f
JOIN pctl_name n1 ON n1.v = f.s1
JOIN pctl_name n2 ON n2.v = f.s2
JOIN pctl_fn f1p ON f1p.v = f.f1
JOIN pctl_fn f2p ON f2p.v = f.f2
JOIN pctl_ln l1p ON l1p.v = f.l1
JOIN pctl_ln l2p ON l2p.v = f.l2
JOIN nprob p1 ON p1.s = f.s1
JOIN nprob p2 ON p2.s = f.s2
"""


# ---------------------------------------------------------------------------
# config-driven schema queries (two data files, Geography/Address/extra
# Categorical) — mirrors schema.preprocess_with_schema over
# configs.DEMO_CONFIG
# ---------------------------------------------------------------------------

def _suffix_case_sql(tok: str) -> str:
    from namematch_spark.schema import ADDRESS_SUFFIX_MAP
    whens = " ".join(f"WHEN '{k}' THEN '{v}'"
                     for k, v in ADDRESS_SUFFIX_MAP.items())
    return f"CASE {tok} {whens} ELSE '' END"


def _cfg_an_cte() -> str:
    """The config all-names CTE: per-variable processing mirrored in SQL
    (clean names reduce to hyphen→space for the synthetic alphabet; the
    Address parse mirrors ``schema.address_cols`` regexes; Geography
    mirrors ``schema.geography_col``)."""
    from namematch_spark.sources.records import _CITY
    cities = ", ".join(f"'{c}'" for c in _CITY)
    return f"""
pv AS (
  SELECT o_orderkey,
         first_name,
         replace(last_name, '-', ' ') AS last_name,
         dob, age, gender,
         CASE WHEN upper(trim(city)) IN ({cities})
              THEN upper(trim(city)) ELSE '' END AS city,
         CASE WHEN trim(geo_x) <> '' AND trim(geo_y) <> ''
              THEN trim(geo_x) || ',' || trim(geo_y)
              ELSE '' END AS home_geo,
         regexp_extract(a2, '^(\\d+)\\b', 1) AS address_street_number,
         CASE WHEN {_suffix_case_sql("rest_toks[-1]")} <> ''
                   AND len(rest_toks) > 1
              THEN array_to_string(rest_toks[1:len(rest_toks) - 1], ' ')
              ELSE rest END AS address_street_name,
         {_suffix_case_sql("rest_toks[-1]")} AS address_street_type,
         uid,
         first_name || ' ' || replace(last_name, '-', ' ') AS nn_string,
         first_name || '::' || replace(last_name, '-', ' ')
            || '::' || dob AS blockstring
  FROM (
    SELECT *,
           trim(regexp_replace(a2, '^\\d+\\s*', '')) AS rest,
           string_split(trim(regexp_replace(a2, '^\\d+\\s*', '')), ' ')
              AS rest_toks
    FROM (
      SELECT *,
             trim(regexp_replace(
                 regexp_replace(
                     CASE WHEN lower(trim(address)) IN
                               ('redacted', 'redact') THEN ''
                          ELSE lower(trim(address)) END,
                     '[.,#]', ' ', 'g'),
                 '\\s+', ' ', 'g')) AS a2
      FROM person
    )
  )
),
an AS (
  SELECT 'ord__' || CAST(o_orderkey AS VARCHAR) AS record_id,
         'new' AS file_type, 'ord' AS dataset,
         * EXCLUDE (o_orderkey), 0 AS drop_from_nm
  FROM pv WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT 'hist__' || CAST(o_orderkey AS VARCHAR) AS record_id,
         'existing' AS file_type, 'hist' AS dataset,
         * EXCLUDE (o_orderkey), 0 AS drop_from_nm
  FROM pv WHERE o_orderkey % 7 = 0
)
"""


CFG_AN_COLS = ["record_id", "file_type", "dataset", "first_name",
               "last_name", "dob", "age", "gender", "city", "home_geo",
               "address_street_number", "address_street_name",
               "address_street_type", "uid", "blockstring",
               "drop_from_nm"]


def er_config_preprocess() -> str:
    from namematch_spark.sources.records import \
        person_records_ext_oracle_cte
    return f"""
WITH person AS ({person_records_ext_oracle_cte("orders")}),
{_cfg_an_cte().strip()}
SELECT {", ".join(CFG_AN_COLS)} FROM an
"""


def er_blockstats_ft() -> str:
    """A1 in full: nn_string counts pivoted by file_type
    (``block.py:1291-1326``)."""
    from namematch_spark.sources.records import \
        person_records_ext_oracle_cte
    return f"""
WITH person AS ({person_records_ext_oracle_cte("orders")}),
{_cfg_an_cte().strip()}
SELECT nn_string,
       sum(CASE WHEN file_type = 'new' THEN 1 ELSE 0 END)::BIGINT
          AS n_new,
       sum(CASE WHEN file_type = 'existing' THEN 1 ELSE 0 END)::BIGINT
          AS n_existing,
       count(*) AS n_total
FROM an WHERE drop_from_nm = 0
GROUP BY nn_string
"""


def _str_feat_sql(v: str, c1: str, c2: str) -> str:
    return f"""
  CASE WHEN {c1}='' OR {c2}='' THEN 1.0 ELSE 0.0 END AS var_{v}_missing,
  CASE WHEN {c1}='' OR {c2}='' THEN NULL
       ELSE levenshtein({c1}, {c2})::DOUBLE END AS var_{v}_edit_dist,
  CASE WHEN {c1}='' OR {c2}='' THEN NULL
       ELSE round(1 - jaro_winkler_similarity({c1}, {c2}), 6)
       END AS var_{v}_jw_dist"""


def _cat_feat_sql(v: str, c1: str, c2: str) -> str:
    return f"""
  CASE WHEN {c1}='' OR {c2}='' THEN 1.0 ELSE 0.0 END AS var_{v}_missing,
  CASE WHEN {c1}='' OR {c2}='' THEN NULL
       ELSE ({c1} = {c2})::INT::DOUBLE END AS var_{v}_exact_match"""


def er_config_pair_features() -> str:
    """Record-pair features for the DEMO config's variable set: strings,
    date, numeric, two categoricals, Geography (euclidean over "x,y")
    and the three parsed Address sub-fields."""
    from namematch_spark.sources.records import \
        person_records_ext_oracle_cte
    return f"""
WITH person AS ({person_records_ext_oracle_cte("orders")}),
{bs_candidates_cte(an_cte=_cfg_an_cte()).strip()},
rp AS (
  SELECT a1.record_id AS record_id_1, a2.record_id AS record_id_2,
         a1.first_name AS fn1, a2.first_name AS fn2,
         a1.last_name AS ln1, a2.last_name AS ln2,
         a1.dob AS dob1, a2.dob AS dob2,
         a1.age AS age1, a2.age AS age2,
         a1.gender AS g1, a2.gender AS g2,
         a1.city AS city1, a2.city AS city2,
         a1.home_geo AS geo1, a2.home_geo AS geo2,
         a1.address_street_number AS hn1,
         a2.address_street_number AS hn2,
         a1.address_street_name AS sn1, a2.address_street_name AS sn2,
         a1.address_street_type AS st1, a2.address_street_type AS st2,
         a1.uid AS uid_1, a2.uid AS uid_2
  FROM cand_bs c
  JOIN an a1 ON a1.nn_string || '::' || a1.dob = c.blockstring_1
            AND a1.drop_from_nm = 0
  JOIN an a2 ON a2.nn_string || '::' || a2.dob = c.blockstring_2
            AND a2.drop_from_nm = 0
  WHERE c.blockstring_1 <> c.blockstring_2
     OR a1.record_id < a2.record_id
)
SELECT record_id_1 || '__' || record_id_2 AS dr_id,
{_str_feat_sql("first_name", "fn1", "fn2")},
{_str_feat_sql("last_name", "ln1", "ln2")},
  CASE WHEN dob1='' OR dob2='' THEN 1.0 ELSE 0.0 END AS var_dob_missing,
  CASE WHEN dob1='' OR dob2='' THEN NULL
       ELSE levenshtein(dob1, dob2)::DOUBLE END AS var_dob_edit_dist,
  CASE WHEN dob1='' OR dob2='' THEN NULL
       ELSE abs(date_diff('day', dob2::DATE, dob1::DATE))::DOUBLE
       END AS var_dob_day_diff,
  CASE WHEN age1='' OR age2='' THEN 1.0 ELSE 0.0 END AS var_age_missing,
  CASE WHEN age1='' OR age2='' THEN NULL
       ELSE abs(age1::DOUBLE - age2::DOUBLE) END AS var_age_num_diff,
{_cat_feat_sql("gender", "g1", "g2")},
{_cat_feat_sql("city", "city1", "city2")},
  CASE WHEN geo1='' OR geo2='' THEN 1.0 ELSE 0.0
       END AS var_home_geo_missing,
  CASE WHEN geo1='' OR geo2='' THEN NULL
       ELSE round(sqrt(
            pow(string_split(geo1, ',')[1]::DOUBLE
                - string_split(geo2, ',')[1]::DOUBLE, 2)
          + pow(string_split(geo1, ',')[2]::DOUBLE
                - string_split(geo2, ',')[2]::DOUBLE, 2)), 6)
       END AS var_home_geo_geog_dist,
{_str_feat_sql("address_street_number", "hn1", "hn2")},
{_str_feat_sql("address_street_name", "sn1", "sn2")},
{_cat_feat_sql("address_street_type", "st1", "st2")},
  CASE WHEN uid_1='' OR uid_2='' THEN ''
       WHEN uid_1 = uid_2 THEN '1'
       WHEN levenshtein(uid_1, uid_2) <= 1 THEN ''
       ELSE '0' END AS label
FROM rp
"""


# ---------------------------------------------------------------------------
# web-pages graft oracles: the BASELINE input shape
# (url, warc_ts, html, text, lang) — the oracle rebuilds the EXPECTED
# extracted text independently from the person derivation, so a
# hash-match here evidences the north-rule byte-identical-extraction
# invariant cross-engine.
# ---------------------------------------------------------------------------

_WP_TEXT_SQL = """
array_to_string(list_filter([
    record_id,
    trim(first_name || ' ' || last_name),
    trim('DOB: ' || dob),
    trim('Gender: ' || gender),
    trim('Age: ' || age),
    uid,
    'junk & boilerplate'
  ], x -> x <> ''), chr(10))
"""


def wp_extract() -> str:
    return f"""
WITH person AS ({PERSON})
SELECT 'https://example.org/profile/' || record_id AS url,
       {_WP_TEXT_SQL.strip()} AS text
FROM person
"""


def wp_records() -> str:
    """Round trip: pages → extraction → parsed records must recover the
    original person fields exactly."""
    return f"""
WITH person AS ({PERSON})
SELECT record_id, first_name, last_name, dob, gender, age, uid
FROM person
"""


# ---------------------------------------------------------------------------
# documents / embeddings oracles
# ---------------------------------------------------------------------------

def doc_dedup_exact() -> str:
    return """
WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents)
SELECT h.doc_id, g.canonical_id, g.group_size
FROM h JOIN (
  SELECT hh, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM h GROUP BY hh
) g ON g.hh = h.hh
"""


DOC_SHINGLES = """
words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents
),
shing AS (
  SELECT doc_id,
         list_distinct([array_to_string(ws[i:i+2], ' ')
                        for i in range(1, len(ws) - 1)]) AS sh
  FROM words WHERE len(ws) >= 3
)
"""


def doc_minhash_lsh(threshold: float = 0.7) -> str:
    """Oracle = exact brute-force Jaccard ≥ t over word-3-shingle sets.
    The Spark side (LSH candidates + exact verify) must equal this when
    LSH recall is 1.0 at these parameters — which rows_per_band=1
    guarantees for any pair sharing ≥1 of 16 minhashes (P(miss) ≤
    (1-t)^16 ≈ 4e-9 at t=0.7)."""
    return f"""
WITH {DOC_SHINGLES.strip()}
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
             6) AS jaccard
FROM shing a JOIN shing b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      >= {threshold}
"""


def doc_minhash_lsh_banded(threshold: float = 0.7,
                           num_hashes: int = 16,
                           rows_per_band: int = 4,
                           max_bucket: int = 5000) -> str:
    """Banded-LSH near-dup oracle (the SCALE configuration — bands of
    ``rows_per_band`` minhashes, sub-linear candidate volume, recall
    1−(1−s^r)^b < 1 by design).  Unlike :func:`doc_minhash_lsh` (which
    pins rows_per_band=1 so the exact brute-force set is reproduced),
    this replicates the BANDING itself in SQL — same md5-mod-P hash
    chain, same LCG (a,b) streams, same '_'-joined band keys as
    ``dedup.minhash_lsh_dedup`` — then verifies candidates with exact
    string-shingle Jaccard, mirroring the Spark plan step for step."""
    mins = ",\n         ".join(
        f"list_min(list_transform(hv, h -> ({a}::BIGINT * h + {b})"
        f" % {P})) AS m{i}"
        for i, (a, b) in enumerate(_lcg_pairs(num_hashes)))
    n_bands = num_hashes // rows_per_band
    bands_union = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, {key} AS bkey FROM sig".format(
            b=b, key=" || '_' || ".join(
                f"m{b * rows_per_band + j}::VARCHAR"
                for j in range(rows_per_band)))
        for b in range(n_bands))
    return f"""
WITH {DOC_SHINGLES.strip()},
hs AS (
  SELECT doc_id, sh,
         list_transform(sh, s ->
             ('0x' || substring(md5(s), 1, 15))::BIGINT % {P}) AS hv
  FROM shing
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hs
),
bands AS (
{bands_union}
),
bsz AS (SELECT band, bkey, count(*) AS n FROM bands GROUP BY band, bkey),
bandsg AS (
  SELECT b.doc_id, b.band, b.bkey
  FROM bands b JOIN bsz z ON z.band = b.band AND z.bkey = b.bkey
  WHERE z.n > 1 AND z.n <= {max_bucket}
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2
  FROM bandsg l JOIN bandsg r ON l.band = r.band AND l.bkey = r.bkey
  WHERE l.doc_id < r.doc_id
)
SELECT c.doc_id_1, c.doc_id_2,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
             6) AS jaccard
FROM cand c
JOIN shing a ON a.doc_id = c.doc_id_1
JOIN shing b ON b.doc_id = c.doc_id_2
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      >= {threshold}
"""


def doc_ngram_jaccard(threshold: float = 0.5) -> str:
    return f"""
WITH {DOC_SHINGLES.strip()}
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
             6) AS jaccard
FROM shing a JOIN shing b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) > 0
  AND len(list_intersect(a.sh, b.sh))::DOUBLE
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      >= {threshold}
"""


def doc_simhash_pairs(bits: int = 32, max_hamming: int = 3) -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits))
    fp_expr = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {2 ** i}::BIGINT ELSE 0 END"
        for i in range(bits))
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(list_distinct(
             string_split_regex(lower(trim(text)), '\\s+'))) AS w
  FROM documents
),
wh AS (
  SELECT doc_id,
         ('0x' || substring(md5(w), 1, 15))::BIGINT AS h
  FROM words
),
v AS (
  SELECT doc_id,
         {votes}
  FROM wh GROUP BY doc_id
),
fp AS (
  SELECT doc_id, {fp_expr} AS fp FROM v
)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       bit_count(xor(a.fp, b.fp)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""


def doc_profile() -> str:
    from namematch_spark.operators.textstats import LANG_PROFILES
    ratios = {}
    for lang, words in LANG_PROFILES.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        ratios[lang] = (
            f"round(len(list_filter(ws, w -> w IN ({inlist})))::DOUBLE"
            f" / greatest(len(ws), 1), 6)")
    lang_case = "CASE"
    # argmax with profile-order tiebreak (strictly-greater chain,
    # mirroring textstats.lang_id)
    langs = list(LANG_PROFILES)
    conds = []
    for i, lang in enumerate(langs):
        gt = " AND ".join(
            f"r_{lang} > r_{other}" for other in langs[:i])
        ge = " AND ".join(
            f"r_{lang} >= r_{other}" for other in langs[i + 1:])
        cond = " AND ".join(x for x in [gt, ge, f"r_{lang} > 0"] if x)
        conds.append(f" WHEN {cond} THEN '{lang}'")
    lang_case += "".join(conds) + " ELSE 'und' END"
    ratio_cols = ",\n         ".join(
        f"{expr} AS r_{lang}" for lang, expr in ratios.items())
    return f"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\\s+') AS ws,
         length(text) AS nc
  FROM documents
),
r AS (
  SELECT doc_id, text, ws, nc,
         {ratio_cols}
  FROM base
),
prof AS (
  SELECT doc_id,
         {lang_case} AS pred_lang,
         CASE WHEN trim(text) = '' THEN 0 ELSE len(ws) END AS n_tokens,
         len(regexp_extract_all(lower(text),
             '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_subwords,
         round(
           (CASE WHEN nc BETWEEN 50 AND 50000 THEN 0.25 ELSE 0 END)
         + (CASE WHEN (nc - len(ws) + 1)::DOUBLE / greatest(len(ws),1)
                 BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0 END)
         + (CASE WHEN r_en >= 0.01 THEN 0.25 ELSE 0 END)
         + (CASE WHEN (nc - length(regexp_replace(text,
                  '[^\\w\\s]', '', 'g')))::DOUBLE / greatest(nc,1)
                 <= 0.2 THEN 0.25 ELSE 0 END), 2) AS quality
  FROM r
)
SELECT p.doc_id, p.pred_lang, p.n_tokens, p.n_subwords, p.quality,
       f.fingerprint
FROM prof p JOIN (
  SELECT doc_id,
         min(('0x' || substring(md5(g), 1, 15))::BIGINT % {P})
            AS fingerprint
  FROM (
    SELECT doc_id, substr(t, i, 8) AS g
    FROM (SELECT doc_id, lower(trim(text)) AS t,
                 unnest(generate_series(1,
                     greatest(length(lower(trim(text))) - 7, 1))) AS i
          FROM documents)
  ) GROUP BY doc_id
) f ON f.doc_id = p.doc_id
"""


def emb_knn(k: int = 5) -> str:
    return f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]))), 6) AS sim
  FROM embeddings q, embeddings c
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {k}
"""


def _hyperplane_bucket_sql(num_planes: int, dim: int,
                           seed: int = 777) -> str:
    """Bucket id per vector, mirroring ``similarity._hyperplane_sig``
    bit-for-bit (same LCG plane constants, same widen-to-double
    sequential dot product)."""
    from namematch_spark.operators.similarity import hyperplane_components
    terms = []
    for p, comps in enumerate(
            hyperplane_components(num_planes, dim, seed=seed)):
        lits = ", ".join(repr(float(c)) for c in comps)
        terms.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], [{lits}]) > 0"
            f" THEN {2 ** p}::BIGINT ELSE 0 END")
    return " + ".join(terms)


def _bucket_table_sql(num_planes: int, num_tables: int, dim: int) -> str:
    """CTE ``b(vec_id, embedding, bkt0..bkt{L-1})`` — the multi-table
    bucket assignment mirroring ``similarity._table_buckets`` (seeds
    777 + 1000t)."""
    cols = ",\n         ".join(
        f"{_hyperplane_bucket_sql(num_planes, dim, seed=777 + 1000 * t)}"
        f" AS bkt{t}" for t in range(num_tables))
    return f"""
b AS (
  SELECT vec_id, embedding,
         {cols}
  FROM embeddings
)
"""


def emb_knn_lsh(k: int = 5, num_planes: int = 8, num_tables: int = 4,
                dim: int = 64) -> str:
    """Oracle for the multi-table LSH kNN: identical bucket assignment
    (OR over tables) + within-bucket exact cosine + rank — the scale
    path checked exactly, not just by recall."""
    joins = "\n  UNION\n".join(
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id\n"
        f"  FROM b q JOIN b c ON q.bkt{t} = c.bkt{t} "
        f"AND q.vec_id <> c.vec_id" for t in range(num_tables))
    return f"""
WITH {_bucket_table_sql(num_planes, num_tables, dim).strip()},
cand AS (
{joins}
),
pairs AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(
           list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]))), 6) AS sim
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {k}
"""


def emb_near_dup_lsh(threshold: float = 0.35, num_planes: int = 8,
                     num_tables: int = 4, dim: int = 64) -> str:
    """Oracle for the multi-table LSH near-dup path (default
    ``cosine_near_dup``)."""
    joins = "\n  UNION\n".join(
        f"  SELECT l.vec_id AS vec_id_1, r.vec_id AS vec_id_2\n"
        f"  FROM b l JOIN b r ON l.bkt{t} = r.bkt{t} "
        f"AND l.vec_id < r.vec_id" for t in range(num_tables))
    return f"""
WITH {_bucket_table_sql(num_planes, num_tables, dim).strip()},
cand AS (
{joins}
)
SELECT cand.vec_id_1, cand.vec_id_2,
       round(
         list_dot_product(a.embedding::DOUBLE[], c.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                  a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(c.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]))), 6) AS sim
FROM cand
JOIN embeddings a ON a.vec_id = cand.vec_id_1
JOIN embeddings c ON c.vec_id = cand.vec_id_2
WHERE list_dot_product(a.embedding::DOUBLE[], c.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                               a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(c.embedding::DOUBLE[],
                                 c.embedding::DOUBLE[])))
      >= {threshold}
"""


def emb_near_dup(threshold: float = 0.35) -> str:
    return f"""
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round(
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                  a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]))), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                               a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[])))
      >= {threshold}
"""


def mm_features() -> str:
    return """
SELECT doc_id::VARCHAR AS media_id,
       'image/fake' AS mime,
       octet_length(encode(text))::BIGINT AS n_bytes,
       sha256(text) AS sha256,
       true AS decode_ok
FROM documents
"""


# ---------------------------------------------------------------------------
# relational demos over TPC-H tables
# ---------------------------------------------------------------------------

def agg_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def win_top_orders() -> str:
    return """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def join_nation_revenue() -> str:
    return """
SELECT n.n_name AS nation,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


def events_hourly() -> str:
    return """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""
