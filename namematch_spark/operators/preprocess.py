"""Stage 1 — preprocessing (reference: ``process_input_data.py``).

Every transform here is a native Catalyst expression (no Python UDFs):
column pruning, predicate pushdown and whole-stage codegen all apply, so
this stage is a single narrow map over the input scan at any scale.

Operator inventory coverage (SURVEY.md §2.2): P1–P2 record tagging,
P5 numeric check, P6 date check, P7 categorical whitelist, P8 strip/upper,
P9 last-name cleanup, P10 set_missing, P11/P12/P13 drop rules →
``drop_from_nm`` flag, P14 nn-string cleaning, P15 blockstring build,
P16 blockstring parse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Suffix tokens stripped from name strings (reference
#: ``utils/utils.py:199-224``).
_NAME_SUFFIXES = ["JR", "SR", "III", "II", "IV"]

BLOCKSTRING_SEP = "::"


def clean_name(col: Column, last_name: bool = False) -> Column:
    """P9 + P14 — canonical name cleaning, as chained native expressions.

    Reference ``clean_nn_string`` (``utils/utils.py:199-224``): uppercase,
    strip generational suffixes (``\\bJR\\b`` etc. ANYWHERE in the
    string, not just at the end), drop non-``[A-Z ]`` characters
    (hyphens become spaces first, per P9
    ``process_input_data.py:397-400``), collapse runs of spaces, trim.
    With ``last_name=True`` the P9 last-name-column rule ``"MC " →
    "MC"`` (``process_input_data.py:398``) is applied first, before the
    hyphen replacement — matching the reference's order.
    """
    c = F.upper(F.trim(col))
    if last_name:
        c = F.regexp_replace(c, r"MC ", "MC")
    c = F.regexp_replace(c, r"-", " ")
    for suf in _NAME_SUFFIXES:
        c = F.regexp_replace(c, rf"\b{suf}\b", "")
    c = F.regexp_replace(c, r"[^A-Z ]", "")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def check_date(col: Column, fmt: str = "yyyy-MM-dd") -> Column:
    """P6 — parse with the user format; emit ``yyyy-MM-dd`` or ``''``
    (reference ``process_input_data.py:288-299``)."""
    parsed = F.try_to_timestamp(col, F.lit(fmt))
    return F.coalesce(F.date_format(parsed, "yyyy-MM-dd"), F.lit(""))


def check_numeric(col: Column) -> Column:
    """P5 — non-numeric → ``''`` (reference
    ``process_input_data.py:281-286``); value stays a string."""
    return F.when(col.try_cast("double").isNotNull(), col).otherwise(F.lit(""))


def check_categorical(col: Column, options: list[str]) -> Column:
    """P7 — whitelist check (reference ``process_input_data.py:301-307``)."""
    return F.when(col.isin(options), col).otherwise(F.lit(""))


def set_missing(col: Column, values: list[str]) -> Column:
    """P10 — listed values → ``''`` (``process_input_data.py:432-450``)."""
    if not values:
        return col
    return F.when(col.isin(values), F.lit("")).otherwise(col)


def blockstring(*cols: Column) -> Column:
    """P15 — ``JOHN::SMITH::1993-07-23`` (``utils/utils.py:227-264``)."""
    return F.concat_ws(BLOCKSTRING_SEP, *cols)


def parse_blockstring_nn(col: Column) -> Column:
    """P16 — recover the nn_string (name part) from a blockstring
    (``utils/utils.py:267-290``)."""
    return F.concat_ws(
        BLOCKSTRING_SEP,
        F.split_part(col, F.lit(BLOCKSTRING_SEP), F.lit(1)),
        F.split_part(col, F.lit(BLOCKSTRING_SEP), F.lit(2)),
    )


def drop_flag(rules: list[dict[str, str]], *, id_col: str = "record_id"
              ) -> Column:
    """P12 — auto-drop conjunctions: a row is dropped when it matches ALL
    ``col = val`` of ANY rule (reference ``process_input_data.py:473-504``;
    default rules like JOHN DOE in ``default_parameters.yaml:23-27``).
    Rows are *kept* but flagged, per P13 (``process_input_data.py:427``).
    """
    if not rules:
        return F.lit(0)
    any_rule = F.lit(False)
    for rule in rules:
        this = F.lit(True)
        for c, v in rule.items():
            this = this & (F.col(c) == F.lit(v))
        any_rule = any_rule | this
    return any_rule.cast("int")


DEFAULT_DROP_RULES = [
    {"first_name": "JOHN", "last_name": "DOE"},
    {"first_name": "JANE", "last_name": "DOE"},
    {"first_name": "UNKNOWN"},
    {"last_name": "UNKNOWN"},
]


def spread_input(records: DataFrame) -> DataFrame:
    """Parallelism valve for under-partitioned inputs (guide §2.5
    "input skew" / §6): the bench inputs are single small parquet files,
    so the scan is ONE task and every narrow op before the first
    exchange — including this module's regex-heavy cleaning — runs
    serially regardless of cores (measured 8.3 s of the sf0.1
    ``all_names`` stage on one task).  A cheap row shuffle BEFORE the
    derivation spreads it across the session's shuffle partitions.

    Scale-adaptive, not a constant: inputs that already scan wide
    (a real 100 TB table) pass through untouched — an unconditional
    ``repartition`` there would add a full shuffle of the raw input
    for nothing.
    """
    spark = records.sparkSession
    try:
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n = records.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - e.g. streaming input
        return records
    if n * 2 <= target:
        return records.repartition(target)
    return records


def preprocess(records: DataFrame,
               drop_rules: list[dict[str, str]] | None = None,
               gender_options: tuple[str, ...] = ("M", "F"),
               ) -> DataFrame:
    """Full stage-1 transform: raw person records → all-names table.

    Input columns: ``record_id, first_name, last_name, dob, gender, age,
    uid`` (strings, ``''`` = missing).  Output adds ``blockstring`` and
    ``drop_from_nm`` and preserves raw names as ``tmp_raw__*`` (P14,
    restored at output time per ``generate_output.py:111-113``).
    """
    rules = DEFAULT_DROP_RULES if drop_rules is None else drop_rules
    df = (
        records
        .withColumn("tmp_raw__first_name", F.col("first_name"))
        .withColumn("tmp_raw__last_name", F.col("last_name"))
        .withColumn("first_name", clean_name(F.col("first_name")))
        .withColumn("last_name", clean_name(F.col("last_name"),
                                            last_name=True))
        .withColumn("dob", check_date(F.col("dob")))
        .withColumn("gender", check_categorical(
            F.upper(F.trim(F.col("gender"))), list(gender_options)))
        .withColumn("age", check_numeric(F.col("age")))
    )
    df = df.withColumn(
        "blockstring",
        blockstring(F.col("first_name"), F.col("last_name"), F.col("dob")))
    df = df.withColumn("drop_from_nm", drop_flag(rules))
    return df
