"""Cross-engine deterministic rounding.

`round(x, 4)` is NOT portable across engines for comparison purposes: Spark
rounds the double's shortest decimal representation with BigDecimal HALF_UP,
while DuckDB (and most engines) multiply by 10^d and round in float space —
any value whose shortest repr ends in '5' at the (d+1)-th decimal (common for
rationals like counts/total or microseconds/1e6) rounds differently.

`fround4` does the rounding IN FLOAT SPACE on both engines with the exact same
IEEE ops — floor(x·10⁴ + 0.5)/10⁴ — so identical input doubles always produce
identical rounded doubles. SQL twin: the FROUND4 template below.

(For negative values this is round-half-toward-+inf, not half-away-from-zero —
consistent across engines, which is what matters for the oracle gate.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround4(col) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def sql_fround4(expr: str) -> str:
    return f"FLOOR(({expr}) * 10000.0 + 0.5) / 10000.0"
