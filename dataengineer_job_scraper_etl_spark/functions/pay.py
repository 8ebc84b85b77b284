"""C1 — pay extraction.

Reference semantics (main.py:142-149, ``extract_numbers`` applied at
main.py:155-156):

1. ``re.findall(r'£[\\d,]+K?|[\\d,]+ ?GBP', description)``
2. take the **last** match (``numbers[-1]``); null if no match
3. normalize: strip ``£``, ``GBP``, ``,``, space; then the literal
   string replace ``'K' -> '000'``
4. cast to float

Quirks preserved on purpose (golden-tested):
- last-match-wins: ``"£40,000 to £50,000"`` -> 50000.0
- K is a *string* substitution, not arithmetic: ``"£80K"`` -> ``"80000"``
  -> 80000.0, and the degenerate ``"£1,5K"`` -> ``"15000"`` -> 15000.0.

Implemented as a native expression chain (regexp_extract_all ->
try_element_at -> regexp_replace -> replace -> try_cast) so Catalyst
sees it, codegen covers it, and no Python worker is involved — the
reference ran this row-at-a-time in Python (map_elements). ``try_``
variants keep behavior identical under ANSI mode (empty match list /
bad cast -> null, never an error).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PAY_PATTERN = r"£[\d,]+K?|[\d,]+ ?GBP"


def extract_pay(description: Column) -> Column:
    """Nullable double pay from a free-text description."""
    last_match = F.try_element_at(
        F.regexp_extract_all(description, F.lit(PAY_PATTERN), F.lit(0)), F.lit(-1)
    )
    cleaned = F.regexp_replace(last_match, r"£|GBP|,| ", "")
    expanded = F.replace(cleaned, F.lit("K"), F.lit("000"))
    return expanded.try_cast("double")


# The equivalent transformation in portable SQL, used by the oracle
# (DuckDB) side of the correctness harness. Kept adjacent to the Spark
# expression so the two can only drift visibly.
def pay_oracle_sql(description_expr: str) -> str:
    # NB: DuckDB single-quoted literals do not process backslash escapes,
    # so the SQL text must contain exactly one backslash before 'd'.
    rex = f"regexp_extract_all({description_expr}, '£[\\d,]+K?|[\\d,]+ ?GBP')"
    last = f"list_extract({rex}, len({rex}))"
    return (
        f"try_cast(replace(regexp_replace({last}, '£|GBP|,| ', '', 'g'), "
        "'K', '000') AS DOUBLE)"
    )
