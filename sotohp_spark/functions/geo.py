"""DMS -> decimal-degrees geo parsing (SURVEY §2 F4).

Behavior re-derived from the reference's Location model
(modules/model package.scala:475-536: latitudeDmsRE/longitudeDmsRE +
DegreeMinuteSeconds.convert, verified against its own test table,
LocationSpec.scala:14-33): a spec like ``3°58'24" S`` parses as
degrees + minutes/60 + seconds/3600, negated for S/W; comma decimal
separators normalize to dots; the seconds mark accepts " '' ′′ ″ and
the minutes mark ' or ′; an invalid spec is a FAILURE — here the
relational analog: null (the F3 quarantine pattern), so bad specs are
routable instead of job-fatal.

Pure JVM column expressions (trim/replace/regexp_extract/arithmetic) —
no UDF, whole-stage codegen, and mirrorable 1:1 in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# groups: 1=degrees 2=minutes 3=seconds 4=hemisphere (quote marks are
# non-capturing so numbering is stable across both engines' regexes)
_DMS_BODY = (
    r"([-+]?\d+)°\s*([-+]?\d+)['′]\s*([-+]?\d+(?:\.\d+)?)"
    r"(?:\"|''|′′|″)\s+"
)


def dms_pattern(kind: str = "lat") -> str:
    refs = "NS" if kind == "lat" else "EW"
    return "^" + _DMS_BODY + f"([{refs}])$"


def dms_to_decimal(col, kind: str = "lat") -> Column:
    """Parse a DMS spec column to signed decimal degrees (null when the
    spec doesn't match the reference grammar)."""
    s = F.regexp_replace(F.trim(col), ",", ".")
    pat = dms_pattern(kind)
    deg = F.regexp_extract(s, pat, 1)
    minutes = F.regexp_extract(s, pat, 2)
    seconds = F.regexp_extract(s, pat, 3)
    ref = F.regexp_extract(s, pat, 4)
    # same summation order as the reference's convert(): d + m/60 + s/3600
    dd = (
        deg.cast("double")
        + minutes.cast("double") / F.lit(60.0)
        + seconds.cast("double") / F.lit(3600.0)
    )
    signed = F.when(ref.isin("N", "E"), dd).otherwise(-dd)
    # regexp_extract returns '' on no match -> tri-state null result
    return F.when(ref != "", signed)


def dms_oracle_expr(spec_sql: str, kind: str = "lat") -> str:
    """The DuckDB mirror of dms_to_decimal over a SQL expression."""
    refs = "NS" if kind == "lat" else "EW"
    # single-quote escaping: every literal ' doubles inside the SQL
    # string (the minutes class [''′] and the '''' seconds variant)
    pat = (
        "^([-+]?\\d+)°\\s*([-+]?\\d+)[''′]\\s*([-+]?\\d+(?:\\.\\d+)?)"
        "(?:\"|''''|′′|″)\\s+([" + refs + "])$"
    )
    s = f"regexp_replace(trim({spec_sql}), ',', '.')"
    return f"""CASE WHEN regexp_extract({s}, '{pat}', 4) <> '' THEN
      (CASE WHEN regexp_extract({s}, '{pat}', 4) IN ('N','E') THEN 1 ELSE -1 END)
      * (CAST(regexp_extract({s}, '{pat}', 1) AS DOUBLE)
         + CAST(regexp_extract({s}, '{pat}', 2) AS DOUBLE) / 60.0
         + CAST(regexp_extract({s}, '{pat}', 3) AS DOUBLE) / 3600.0)
    END"""
