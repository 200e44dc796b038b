from .aggregate import aggregation, block_transformation, distinct, sort
from .branch import conditional_split, multicast
from .dedupe import dedupe_lww, exact_dedup, top_k_per_group, top_k_per_group_segmented
from .errors import cast_or_route, route_errors
from .joins import cross_join, lookup, merge_join, merge_join_positional
from .rows import column_rename, row_duplication, row_multiplication, row_transformation
from .skew import repartition_by_key, salted_aggregation, salted_count_distinct, with_salt

__all__ = [
    "repartition_by_key",
    "salted_aggregation",
    "salted_count_distinct",
    "with_salt",
    "aggregation",
    "block_transformation",
    "cast_or_route",
    "route_errors",
    "column_rename",
    "conditional_split",
    "cross_join",
    "dedupe_lww",
    "distinct",
    "exact_dedup",
    "lookup",
    "merge_join",
    "merge_join_positional",
    "multicast",
    "row_duplication",
    "row_multiplication",
    "row_transformation",
    "sort",
    "top_k_per_group",
    "top_k_per_group_segmented",
]
