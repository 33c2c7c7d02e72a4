"""Deterministic person-record derivation over the TPC-H ``orders`` table.

The graft's correctness gate compares Spark DataFrame results against a
DuckDB oracle over the same parquet tables, so the ER pipeline's *input*
must be derivable identically in both engines.  ``PERSON_RECORDS_SQL`` is a
single portable ANSI-SQL text (verified to parse and evaluate identically in
Spark SQL and DuckDB) that turns each ``orders`` row into one person record:

* the **entity** is the customer (``o_custkey``) — several orders per
  customer yield several records per true entity, mirroring the reference's
  multiple-records-per-person model
  (``/root/reference/namematch/process_input_data.py:330-339``);
* names come from small modular pools so common names create **hot blocks**
  (the skew case the 100 TB design must survive);
* a deterministic perturbation keyed on ``o_orderkey % 11`` injects typos,
  transposed characters, missing dates, hyphenated last names and
  initial-only first names — the same dirty-data cases the reference's test
  fixtures encode (``/root/reference/tests/unit/data/raw_data.csv``);
* ``uid`` (ground truth) is revealed for ~2/3 of records and blank
  otherwise, mirroring the reference's partially-labeled UniqueID model
  (``/root/reference/namematch/generate_must_links.py:52-53``).

Missing values are the empty string ``''``, never NULL, per the reference's
``na_filter=False`` convention (``process_input_data.py:86-92``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FIRST = ["JAMES", "MARY", "ROBERT", "PATRICIA", "JOHN", "JENNIFER",
          "MICHAEL", "LINDA", "DAVID", "ELIZABETH", "WILLIAM", "BARBARA",
          "RICHARD", "SUSAN", "JOSEPH", "JESSICA", "THOMAS", "SARAH",
          "CHARLES"]
_LAST = ["SMITH", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "GARCIA",
         "MILLER", "DAVIS", "RODRIGUEZ", "MARTINEZ", "HERNANDEZ", "LOPEZ",
         "GONZALEZ", "WILSON", "ANDERSON", "THOMAS", "TAYLOR", "MOORE",
         "JACKSON", "MARTIN", "LEE", "PEREZ", "THOMPSON"]
_HYPH = ["NGUYEN", "KIM", "PATEL", "SINGH", "CHEN", "ALI", "KHAN"]

# syllable pools for diverse (non-hot) surnames; coprime moduli 29/31
# make (fn, ln) unique per entity below custkey ~17k while shared
# syllables keep realistic cross-name similarity for the LSH path
_SYL_A = ["KAR", "VOL", "BER", "NOR", "TAL", "MOR", "LIN", "HAR", "WEN",
          "FOR", "GAL", "PER", "SOL", "VAN", "KEL", "DOR", "MAL", "RUN",
          "SEL", "TOR", "BAL", "MIR", "NAK", "LOM", "RAV", "DUN", "HOL",
          "FEN", "GRE"]
_SYL_B = ["SEN", "TON", "SON", "DALE", "FORD", "WELL", "WOOD", "STONE",
          "BROOK", "FIELD", "WORTH", "LAND", "MONT", "VALE", "BURN",
          "SHAW", "COMB", "WICK", "THORP", "BECK", "HURST", "MERE",
          "DENE", "HOLT", "GATE", "CROFT", "MOOR", "RIDGE", "FELL",
          "HAM", "COTE"]


def _case(expr: str, pool: list[str]) -> str:
    branches = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(pool))
    return f"CASE {expr} {branches} END"


# Base (unperturbed) per-entity attributes, keyed on o_custkey.
# Name realism at scale: 10% of entities ("hot", o_custkey % 10 = 0)
# draw last names from the bare 23-name pool — these are the common-name
# hot blocks the blocking layer must survive; the other 90% compose a
# surname from two syllable pools (29 x 31 coprime moduli), which keeps
# (fn, ln) unique per entity below custkey ~17k while shared syllables
# preserve realistic cross-name shingle similarity for the LSH path.
_BASE = f"""
SELECT
  o_orderkey,
  o_custkey,
  {_case(f"o_custkey % {len(_FIRST)}", _FIRST)} AS fn0,
  CASE WHEN o_custkey % 10 = 0
       THEN {_case(f"o_custkey % {len(_LAST)}", _LAST)}
       ELSE {_case(f"o_custkey % {len(_SYL_A)}", _SYL_A)}
            || {_case(f"o_custkey % {len(_SYL_B)}", _SYL_B)}
       END AS ln0,
  {_case(f"o_custkey % {len(_HYPH)}", _HYPH)} AS ln_alt,
  CAST(make_date(1950 + o_custkey % 45,
                 1 + o_custkey % 12,
                 1 + o_custkey % 28) AS VARCHAR(10)) AS dob0,
  CASE o_custkey % 2 WHEN 0 THEN 'M' ELSE 'F' END AS gender,
  CAST(74 - o_custkey % 45 AS VARCHAR(3)) AS age,
  o_orderkey % 11 AS perturb
FROM {{orders}}
"""

#: One person record per orders row.  Portable across Spark SQL and DuckDB.
PERSON_RECORDS_SQL = f"""
SELECT
  'ord__' || CAST(o_orderkey AS VARCHAR(20)) AS record_id,
  CASE WHEN perturb = 4
       THEN SUBSTR(fn0, 1, 1)
       WHEN perturb = 0
       THEN SUBSTR(fn0, 1, 1) || SUBSTR(fn0, 3)
       ELSE fn0 END AS first_name,
  CASE WHEN perturb = 1
       THEN SUBSTR(ln0, 1, 1) || SUBSTR(ln0, 3, 1)
            || SUBSTR(ln0, 2, 1) || SUBSTR(ln0, 4)
       WHEN perturb = 3
       THEN ln0 || '-' || ln_alt
       ELSE ln0 END AS last_name,
  CASE WHEN perturb = 2 THEN '' ELSE dob0 END AS dob,
  gender,
  CASE WHEN perturb = 5 THEN '' ELSE age END AS age,
  CASE WHEN o_orderkey % 3 = 0
       THEN ''
       ELSE CAST(o_custkey AS VARCHAR(20)) END AS uid,
  CAST(o_custkey AS VARCHAR(20)) AS true_entity
FROM ({_BASE.strip()}) b
""".strip()


#: Two-UniqueID derivation (reference core use case: SSN + agency ID,
#: ``generate_must_links.py:160-184``).  Wraps ``PERSON_RECORDS_SQL``
#: with a second id column keyed on the same true entity but revealed /
#: corrupted on DIFFERENT moduli, so the consensus surfaces are
#: exercised: records where ``uid`` is blank may still must-link via
#: ``uid2``; orderkey % 7 rows carry a WRONG agency id (points at the
#: next entity), creating uid-vs-uid2 label conflicts that consensus
#: must demote to ``''``.  record_id = 'ord__' || o_orderkey, so the
#: orderkey is recoverable as SUBSTR(record_id, 6) in both engines.
PERSON_RECORDS_UID2_SQL = f"""
SELECT p.*,
  CASE WHEN CAST(SUBSTR(p.record_id, 6) AS BIGINT) % 5 = 0
       THEN ''
       WHEN CAST(SUBSTR(p.record_id, 6) AS BIGINT) % 7 = 0
       THEN 'A' || CAST(CAST(p.true_entity AS BIGINT) + 1 AS VARCHAR(20))
       ELSE 'A' || p.true_entity END AS uid2
FROM ({{person}}) p
""".strip()


def person_records_uid2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side two-UniqueID derivation."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("__nm_orders")
    return spark.sql(PERSON_RECORDS_UID2_SQL.format(
        person=PERSON_RECORDS_SQL.format(orders="__nm_orders")))


def person_records_uid2_oracle_cte(orders_view: str = "orders") -> str:
    return PERSON_RECORDS_UID2_SQL.format(
        person=PERSON_RECORDS_SQL.format(orders=orders_view))


_STREET = ["maple", "oak", "cedar", "elm", "birch", "walnut", "spruce",
           "willow", "ashwood", "lakeview", "hillcrest", "riverside",
           "sunset"]
_SUFFIX = ["st", "ave", "rd", "blvd", "ln", "dr", "ct"]
_CITY = ["SPRINGFIELD", "RIVERTON", "LAKEWOOD", "FAIRVIEW", "GREENVILLE",
         "BRISTOL", "CLAYTON", "DAYTON"]

#: Extended derivation for the config-driven schema queries: the same
#: person core plus a raw full-address string (Address compare type,
#: 1-column parse path), split geo coordinates (Geography, 2-column
#: merge path) and a city (Categorical).  Kept separate from
#: ``PERSON_RECORDS_SQL`` so the round-1 oracle surfaces stay
#: byte-stable; shares the ``_BASE`` CTE.  Perturbations: 6 → address
#: missing, 7 → one geo coordinate missing (merge must yield ``''``),
#: 8 → invalid city (whitelisted out).
PERSON_RECORDS_EXT_SQL = f"""
SELECT
  o_orderkey,
  CASE WHEN perturb = 4
       THEN SUBSTR(fn0, 1, 1)
       WHEN perturb = 0
       THEN SUBSTR(fn0, 1, 1) || SUBSTR(fn0, 3)
       ELSE fn0 END AS first_name,
  CASE WHEN perturb = 1
       THEN SUBSTR(ln0, 1, 1) || SUBSTR(ln0, 3, 1)
            || SUBSTR(ln0, 2, 1) || SUBSTR(ln0, 4)
       WHEN perturb = 3
       THEN ln0 || '-' || ln_alt
       ELSE ln0 END AS last_name,
  CASE WHEN perturb = 2 THEN '' ELSE dob0 END AS dob,
  gender,
  CASE WHEN perturb = 5 THEN '' ELSE age END AS age,
  CASE WHEN o_orderkey % 3 = 0
       THEN ''
       ELSE CAST(o_custkey AS VARCHAR(20)) END AS uid,
  CASE WHEN perturb = 6 THEN ''
       ELSE CAST(1 + o_custkey % 9899 AS VARCHAR(5)) || ' '
            || {_case(f"o_custkey % {len(_STREET)}", _STREET)} || ' '
            || {_case(f"o_custkey % {len(_SUFFIX)}", _SUFFIX)}
       END AS address,
  CAST(4100 + o_custkey % 200 AS VARCHAR(5)) AS geo_x,
  CASE WHEN perturb = 7 THEN ''
       ELSE CAST(8700 + o_custkey % 300 AS VARCHAR(5)) END AS geo_y,
  CASE WHEN perturb = 8 THEN 'XXX'
       ELSE {_case(f"o_custkey % {len(_CITY)}", _CITY)} END AS city
FROM ({_BASE.strip()}) b
""".strip()


def person_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side derivation: register ``orders`` and run the shared SQL."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("__nm_orders")
    return spark.sql(PERSON_RECORDS_SQL.format(orders="__nm_orders"))


def person_records_oracle_cte(orders_view: str = "orders") -> str:
    """The same derivation as a CTE body for DuckDB oracle SQL."""
    return PERSON_RECORDS_SQL.format(orders=orders_view)


def person_records_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side extended derivation (config-schema queries)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("__nm_orders")
    return spark.sql(PERSON_RECORDS_EXT_SQL.format(orders="__nm_orders"))


def person_records_ext_oracle_cte(orders_view: str = "orders") -> str:
    return PERSON_RECORDS_EXT_SQL.format(orders=orders_view)
