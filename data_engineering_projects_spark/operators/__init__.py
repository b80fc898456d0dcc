"""Composable operators (SURVEY.md §2.3/2.6/2.7 + extension operators)."""

from .topk import topk_limit, topk_rank, topk_keys_semijoin  # noqa: F401
from .windows import lag_diff, pct_change  # noqa: F401
from .pivot import pivot_agg  # noqa: F401
from .setops import union_by_name  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_topk_hof, cosine_topk_blas, ivf_train, ivf_assign, ivf_search,
)
from .skew import salted_join, salted_agg  # noqa: F401
