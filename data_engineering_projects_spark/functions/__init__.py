"""Reusable Column expression builders — the engine's "macro" layer.

The dbt-macro / pandas-helper analog (SURVEY.md §2.5, §2.8): plain Python
functions returning Catalyst ``Column`` expressions. Everything here is
JVM-side (whole-stage codegen); zero Python UDFs.
"""

from .temporal import (  # noqa: F401
    wday_pandas, wday_sql, period_bucket, time_bucket, hour_of, day_of,
)
from .metrics import (  # noqa: F401
    tti, pti, severity, variability, lottr, exceedance_flag,
    congestion_index, speed_ratio,
)
from .cleaning import clean_range, coalesce0, nullif0  # noqa: F401
from .text import (  # noqa: F401
    normalize_text, tokens, token_count, shingles, md5_hash64, fingerprint,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
