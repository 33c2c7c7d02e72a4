"""Config-driven schema layer: Variables, DataFiles, Schema
(reference: ``data_structures/variable.py:19-82``,
``data_file.py:74-136``, ``parameters.py:128-182``,
``schema.py:29-49``).

The reference's core UX is a YAML/dict config declaring ``data_files``
(each with per-file record-id column and a ``new``/``existing`` tag) and
``variables`` (each with a ``compare_type``, per-file source columns and
optional ``check`` / ``drop`` / ``set_missing`` rules).  This module is
the Spark-native equivalent: plain dataclasses validated at build time,
then compiled into Catalyst expressions by
:func:`preprocess_with_schema` — the whole preprocessing stage stays one
narrow projection per input file regardless of the variable set.

Compare types (``variable.py:44-46``, dispatch
``generate_data_rows.py:267-287``):

========== =============================== ==========================
type        processing                      pairwise features
========== =============================== ==========================
String      strip/upper/clean               8 string distances
LastName    String + hyphen→space           same as String
Date        parse + reformat or ``''``      edit_dist + day_diff
Numeric     numeric check                   abs diff
Categorical whitelist check                 exact match
Geography   "lat,lon" merge/validate        euclidean distance
Address     parse into number/name/type     2×String + Categorical
UniqueID    —                               labels / must-links
ExistingID  —                               incremental cluster seed
========== =============================== ==========================
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_COMPARE_TYPES = {
    "String", "LastName", "Date", "Numeric", "Number", "Categorical",
    "Category", "Geography", "Address", "UniqueID", "ExistingID",
}

#: Street-suffix canonicalization (reference
#: ``process_input_data.py:190-208``).
ADDRESS_SUFFIX_MAP = {
    "ave": "avenue", "avenue": "avenue",
    "blvd": "boulevard", "boulevard": "boulevard",
    "ctr": "center", "center": "center",
    "cir": "circle", "circle": "circle",
    "ct": "court", "court": "court",
    "cv": "cove", "cove": "cove",
    "dr": "drive", "drive": "drive",
    "expy": "expressway", "expressway": "expressway",
    "hts": "heights", "heights": "heights",
    "hwy": "highway", "highway": "highway",
    "jct": "junction", "junction": "junction",
    "ln": "lane", "lane": "lane",
    "lp": "loop", "loop": "loop",
    "pkwy": "parkway", "parkway": "parkway",
    "pl": "place", "place": "place",
    "rd": "road", "road": "road",
    "sq": "square", "square": "square",
    "st": "street", "street": "street",
}


@dataclass
class Variable:
    """One matching field (reference ``variable.py:19-82``)."""
    name: str
    compare_type: str
    #: file nickname → source column name(s).  Geography takes 1 or 2
    #: source columns, Address 1 or 3 (reference
    #: ``process_input_data.py:133-258``); others exactly 1.
    cols: dict[str, str | list[str]] = field(default_factory=dict)
    check: str | list = ""          # "Date - <fmt>" | "Numeric" | options
    drop: list = field(default_factory=list)
    set_missing: list = field(default_factory=list)

    def __post_init__(self):
        if self.compare_type not in VALID_COMPARE_TYPES:
            raise ValueError(
                f"variable {self.name}: unknown compare_type "
                f"{self.compare_type!r} (valid: "
                f"{sorted(VALID_COMPARE_TYPES)})")
        if not isinstance(self.drop, list):
            raise TypeError(f"variable {self.name}: drop must be a list")
        if not isinstance(self.set_missing, list):
            raise TypeError(
                f"variable {self.name}: set_missing must be a list")

    def source_cols(self, nickname: str) -> list[str]:
        v = self.cols[nickname]
        return [v] if isinstance(v, str) else list(v)

    @property
    def date_format(self) -> str:
        """Spark format from a reference-style ``check: Date - %Y-%m-%d``."""
        if isinstance(self.check, str) and self.check.startswith("Date"):
            parts = self.check.split("-", 1)
            if len(parts) == 2 and parts[1].strip():
                py = parts[1].strip()
                return (py.replace("%Y", "yyyy").replace("%m", "MM")
                        .replace("%d", "dd"))
        return "yyyy-MM-dd"


@dataclass
class DataFile:
    """One input dataset (reference ``data_file.py:74-136``)."""
    nickname: str
    record_id_col: str
    file_type: str = "new"          # "new" | "existing"
    delim: str = ","                # kept for CSV sources
    filepath: str = ""              # CLI source path (csv or parquet)

    def __post_init__(self):
        if self.file_type not in ("new", "existing"):
            raise ValueError(
                f"data file {self.nickname}: file_type must be "
                f"'new' or 'existing'")


@dataclass
class Schema:
    """Validated (data_files, variables) pair plus the blocking scheme
    (reference ``schema.py:29-49`` + ``parameters.py:294-299``)."""
    data_files: list[DataFile]
    variables: list[Variable]
    #: blocking scheme (reference ``default_parameters.yaml:30-38``):
    #: cosine over two name variables, edit-distance over one date
    #: variable, absvalue over one numeric backup variable.
    blocking_scheme: dict = field(default_factory=lambda: {
        "cosine_distance": {"variables": ["first_name", "last_name"]},
        "edit_distance": {"variable": "dob"},
        "absvalue_distance": {"variable": "age"},
        "alpha": 1.4, "power": 0.1,
    })

    def __post_init__(self):
        nicknames = [f.nickname for f in self.data_files]
        if len(set(nicknames)) != len(nicknames):
            raise ValueError("duplicate data file nicknames")
        for v in self.variables:
            missing = [n for n in nicknames if n not in v.cols]
            if missing:
                raise ValueError(
                    f"variable {v.name}: no column mapping for data "
                    f"file(s) {missing} (reference "
                    f"variable.py:85-110 semantics)")
        cos_vars = self.blocking_scheme["cosine_distance"]["variables"]
        names = {v.name for v in self.variables}
        for bv in cos_vars:
            if bv not in names:
                raise ValueError(
                    f"blocking variable {bv} is not a declared variable "
                    f"(reference parameters.py:294-299)")

    @classmethod
    def from_dict(cls, cfg: dict) -> "Schema":
        """Build from a reference-style config dict:

        ``{"data_files": {nick: {"record_id_col": ..., "file_type":
        ...}}, "variables": [{"name", "compare_type", "<nick>_col",
        "check", "drop", "set_missing"}, ...], "blocking_scheme": ...}``
        """
        dfs = [DataFile(nickname=nick,
                        record_id_col=d["record_id_col"],
                        file_type=d.get("file_type", "new"),
                        delim=d.get("delim", ","),
                        filepath=d.get("filepath", ""))
               for nick, d in cfg["data_files"].items()]
        variables = []
        for vd in cfg["variables"]:
            cols = {k[:-len("_col")]: v for k, v in vd.items()
                    if k.endswith("_col")}
            variables.append(Variable(
                name=vd["name"], compare_type=vd["compare_type"],
                cols=cols, check=vd.get("check", ""),
                drop=vd.get("drop", []),
                set_missing=vd.get("set_missing", [])))
        kwargs = {}
        if "blocking_scheme" in cfg:
            kwargs["blocking_scheme"] = cfg["blocking_scheme"]
        return cls(data_files=dfs, variables=variables, **kwargs)

    def uid_vars(self) -> list[str]:
        return [v.name for v in self.variables
                if v.compare_type == "UniqueID"]

    def existing_id_var(self) -> str | None:
        for v in self.variables:
            if v.compare_type == "ExistingID":
                return v.name
        return None

    def feature_variables(self) -> list[Variable]:
        return [v for v in self.variables
                if v.compare_type not in ("UniqueID", "ExistingID")]


# ---------------------------------------------------------------------------
# per-compare-type processing expressions (P3-P10, all native Catalyst)
# ---------------------------------------------------------------------------

def geography_col(cols: list[Column]) -> Column:
    """P3 — Geography merge (``process_input_data.py:133-175``): two
    columns become ``"lat,lon"`` when both are present; a single column
    must already contain a comma, else ``''``."""
    if len(cols) == 2:
        c1, c2 = F.trim(cols[0]), F.trim(cols[1])
        return F.when((c1 != "") & (c2 != ""),
                      F.concat(c1, F.lit(","), c2)).otherwise(F.lit(""))
    if len(cols) == 1:
        c = cols[0]
        return F.when((c != "") & ~c.contains(","), F.lit("")).otherwise(c)
    raise ValueError("Geography takes exactly 1 or 2 column names")


def _canon_suffix(tok: Column) -> Column:
    """Street-suffix canonicalization map as a chained CASE (the
    reference's ``add_map`` defaultdict, ``process_input_data.py:
    190-208``); unknown suffixes map to ``''``."""
    expr = F.lit("")
    for k, v in ADDRESS_SUFFIX_MAP.items():
        expr = F.when(tok == k, F.lit(v)).otherwise(expr)
    return expr


def address_cols(cols: list[Column]) -> dict[str, Column]:
    """P4 — Address parse (``process_input_data.py:178-258``) into
    ``address_street_number`` / ``_name`` / ``_type``.

    Three source columns pass through (suffix canonicalized); a single
    full-address string is parsed with native regexes (reimplementation
    of the reference's ``StreetAddressParser`` usage per SURVEY §2.2 P4
    — house = leading digits, type = trailing suffix token when it is a
    known suffix, name = the middle), lowercased like the reference.
    """
    if len(cols) == 3:
        return {
            "address_street_number": F.trim(F.lower(cols[0])),
            "address_street_name": F.trim(F.lower(cols[1])),
            "address_street_type": _canon_suffix(F.trim(F.lower(cols[2]))),
        }
    if len(cols) == 1:
        a = F.lower(F.trim(cols[0]))
        a = F.when(a.isin("redacted", "redact"), F.lit("")).otherwise(a)
        # strip punctuation the way a street parser tokenizes ("St." ==
        # "st"), collapse whitespace
        a = F.regexp_replace(a, r"[.,#]", " ")
        a = F.trim(F.regexp_replace(a, r"\s+", " "))
        house = F.regexp_extract(a, r"^(\d+)\b", 1)
        rest = F.trim(F.regexp_replace(a, r"^\d+\s*", ""))
        toks = F.split(rest, " ")
        last_tok = F.element_at(toks, -1)
        suffix = _canon_suffix(last_tok)
        name = F.when(
            (suffix != "") & (F.size(toks) > 1),
            F.array_join(F.slice(toks, 1, F.size(toks) - 1), " "),
        ).otherwise(rest)
        return {
            "address_street_number": house,
            "address_street_name": name,
            "address_street_type": suffix,
        }
    raise ValueError("Address takes exactly 1 or 3 column names")


def preprocess_with_schema(raw_by_file: dict[str, DataFrame],
                           schema: Schema,
                           drop_rules: list[dict[str, str]] | None = None,
                           ) -> DataFrame:
    """Stage 1 driven by a Schema: per input file, rename/derive every
    variable by compare_type, synthesize record ids (P1,
    ``utils/utils.py:193-196``), tag ``file_type``/``dataset`` constants
    (P2), apply check / set_missing / drop rules, then union the files
    and build the blockstring (P15).

    Output: the all-names table — one row per input record across every
    data file, with ``record_id, file_type, dataset, <variables...>,
    tmp_raw__* , blockstring, drop_from_nm``
    (``process_input_data.py:330-339``).
    """
    from namematch_spark.operators.preprocess import (check_categorical,
                                                      check_date,
                                                      check_numeric,
                                                      clean_name, drop_flag,
                                                      set_missing)
    parts = []
    for df_spec in schema.data_files:
        raw = raw_by_file[df_spec.nickname]
        cols: list[Column] = [
            F.concat(F.lit(df_spec.nickname), F.lit("__"),
                     F.col(df_spec.record_id_col).cast("string"))
            .alias("record_id"),
            F.lit(df_spec.file_type).alias("file_type"),
            F.lit(df_spec.nickname).alias("dataset"),
        ]
        for v in schema.variables:
            src = [F.coalesce(F.col(c).cast("string"), F.lit(""))
                   for c in v.source_cols(df_spec.nickname)]
            if v.compare_type == "Geography":
                out = {v.name: geography_col(src)}
            elif v.compare_type == "Address":
                out = address_cols(src)
            elif v.compare_type == "Date":
                out = {v.name: check_date(src[0], v.date_format)}
            elif v.compare_type in ("Numeric", "Number"):
                out = {v.name: check_numeric(src[0])}
            elif v.compare_type in ("Categorical", "Category"):
                opts = v.check if isinstance(v.check, list) else []
                c = F.upper(F.trim(src[0]))
                out = {v.name: check_categorical(c, opts) if opts else c}
            elif v.compare_type in ("String", "LastName"):
                # raw preserved for output restore (P14,
                # generate_output.py:111-113)
                cols.append(src[0].alias(f"tmp_raw__{v.name}"))
                out = {v.name: clean_name(
                    src[0], last_name=(v.compare_type == "LastName"))}
            else:  # UniqueID / ExistingID: strip only
                out = {v.name: F.trim(src[0])}
            for name, expr in out.items():
                if v.set_missing:
                    expr = set_missing(expr, v.set_missing)
                cols.append(expr.alias(name))
        part = raw.select(*cols)
        # per-variable drop lists → drop flag (P11)
        drop_cond = F.lit(False)
        for v in schema.variables:
            if v.drop:
                drop_cond = drop_cond | F.col(v.name).isin(v.drop)
        part = part.withColumn("__var_drop", drop_cond.cast("int"))
        parts.append(part)

    an = parts[0]
    for p in parts[1:]:
        an = an.unionByName(p)

    # blockstring from the declared blocking scheme (P15)
    cos_vars = schema.blocking_scheme["cosine_distance"]["variables"]
    ed_var = schema.blocking_scheme.get("edit_distance", {}).get("variable")
    bs_cols = [F.col(c) for c in cos_vars]
    if ed_var:
        bs_cols.append(F.col(ed_var))
    an = an.withColumn("blockstring", F.concat_ws("::", *bs_cols))

    # auto-drop conjunctions (P12) + per-variable drop lists (P11) →
    # drop_from_nm flag (P13: rows kept, excluded downstream)
    auto = drop_flag(drop_rules or [])
    an = (an.withColumn("drop_from_nm",
                        F.greatest(F.col("__var_drop"), auto))
          .drop("__var_drop"))
    return an


def nn_string_stats(all_names: DataFrame, cos_vars: list[str]
                    ) -> DataFrame:
    """A1 in full — nn_string counts pivoted by file_type
    (``block.py:1291-1326``): ``n_new`` / ``n_existing`` / ``n_total``
    drive the incremental-mode decision of which names to query."""
    base = (
        all_names.filter(F.col("drop_from_nm") == 0)
        .withColumn("nn_string", F.concat_ws(" ", *cos_vars))
        .groupBy("nn_string")
        .agg(F.sum((F.col("file_type") == "new").cast("int"))
             .alias("n_new"),
             F.sum((F.col("file_type") == "existing").cast("int"))
             .alias("n_existing"),
             F.count("*").alias("n_total"))
    )
    return base
