"""Change-summary formatting (X7) + multi-format date parsing (X5/X6).

Reproduces the reference's summary builder
(``backend/analysis/exception_builder.py:35-118``, duplicated in three
frontend modules) as one native Column expression: ``format_string`` +
``when`` cascade — no Python.

Reference semantics per (old, new, field_type):
* both null            -> "no change"
* old null             -> "added: {new}"
* new null             -> "removed: {old}"
* numeric/int/decimal  -> "changed by {delta:+.2f} ({pct:+.2f}%)",
                          pct omitted when old == 0; unparsable ->
                          "from {old} to {new}"
* date                 -> "same date, time changed" (0d), "shifted by
                          1 day" / "-1 day", else "shifted by {d:+d}
                          days"; unparsable -> "from {old} to {new}"
* text (default)       -> "from '{old}' to '{new}'" with 30-char
                          truncation + "..."
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's date formats declared in mapping.yaml:35-39
DATE_FORMATS = ("yyyy-MM-dd", "dd MMM yyyy", "yyyy/MM/dd")


def parse_date_multi(col: Column | str, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """X5: first-successful multi-format date parse (null if none)."""
    col = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(col, F.lit(f)).cast("date") for f in formats]
    return F.coalesce(*attempts)


def _truncate30(col: Column) -> Column:
    return F.when(
        F.length(col) > 30, F.concat(F.substring(col, 1, 30), F.lit("..."))
    ).otherwise(col)


def exception_summary(
    old: Column | str, new: Column | str, field_type: str | None = None
) -> Column:
    """One summary string per exception row (reference
    exception_builder.py:35-118 semantics)."""
    o = (F.col(old) if isinstance(old, str) else old).cast("string")
    n = (F.col(new) if isinstance(new, str) else new).cast("string")

    fallback = F.format_string("from %s to %s", o, n)

    if field_type in ("numeric", "integer", "decimal"):
        ov, nv = o.try_cast("double"), n.try_cast("double")
        delta = nv - ov
        pct = delta / ov * 100.0
        typed = (
            F.when(ov.isNull() | nv.isNull(), fallback)
            .when(ov != 0.0, F.format_string("changed by %+.2f (%+.2f%%)", delta, pct))
            .otherwise(F.format_string("changed by %+.2f", delta))
        )
    elif field_type == "date":
        do, dn = parse_date_multi(o), parse_date_multi(n)
        days = F.datediff(dn, do)  # X6
        typed = (
            F.when(do.isNull() | dn.isNull(), fallback)
            .when(days == 0, F.lit("same date, time changed"))
            .when(days == 1, F.lit("shifted by 1 day"))
            .when(days == -1, F.lit("shifted by -1 day"))
            .otherwise(F.format_string("shifted by %+d days", days))
        )
    else:
        typed = F.format_string("from '%s' to '%s'", _truncate30(o), _truncate30(n))

    return (
        F.when(o.isNull() & n.isNull(), F.lit("no change"))
        .when(o.isNull(), F.format_string("added: %s", n))
        .when(n.isNull(), F.format_string("removed: %s", o))
        .otherwise(typed)
    )
