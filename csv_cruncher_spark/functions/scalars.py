"""Misc scalar functions from the reference's UDF surface (SURVEY.md §2.B).

Only ``startsWith`` remains here — the JSON trio lives in json_funcs.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def starts_with(whole: Column | str, prefix: Column | str) -> Column:
    """Reference parity: startsWith(whole, startx) → BOOLEAN, null-on-null,
    deterministic (/root/reference/src/main/kotlin/cz/dynawest/csvcruncher/
    util/SqlFunctions.kt:17-29). Spark's built-in ``startswith`` has the
    identical contract — this alias exists so the parity mapping is
    explicit and greppable."""
    w = F.col(whole) if isinstance(whole, str) else whole
    p = F.col(prefix) if isinstance(prefix, str) else prefix
    return F.startswith(w, p)
