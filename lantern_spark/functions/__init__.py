"""Column-expression function library (the JVM-side fast path)."""

from lantern_spark.functions.distances import (  # noqa: F401
    cos_dist,
    distance,
    hamming_dist,
    inner_dist,
    l1_dist,
    l2_dist,
    l2sq_dist,
)
from lantern_spark.functions.vectors import (  # noqa: F401
    vec_lit,
    vec_norm,
    vec_normalize,
    vec_dot,
    vec_add,
    vec_scale,
    vec_sub,
)
