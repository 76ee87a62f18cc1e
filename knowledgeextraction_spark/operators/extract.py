"""F16: HTML → text extraction (Arrow-batched pandas UDF).

The per-row invariant [NORTH]: extracted text is byte-identical per url
to ``core.textops.extract_text`` — the UDF calls that exact function
(shared code object with the oracle), looping inside the Arrow batch.
Deterministic (NOT marked nondeterministic) so retries/speculation are
safe — SURVEY.md §4 item 5.

Scale notes: this is a narrow map — no shuffle; Catalyst prunes the
``html`` column away downstream of this stage automatically (column
pruning over the parquet/Iceberg scan).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    from ..core.textops import extract_text

    return pd.Series(
        [extract_text(h) if h is not None else None for h in html]
    )


def extracted_text(html_col: str = "html") -> Column:
    return extract_text_udf(html_col)
