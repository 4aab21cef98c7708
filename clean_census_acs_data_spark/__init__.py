"""clean_census_acs_data_spark — a brand-new PySpark-native analytics engine.

Re-expresses the capability surface of the reference project
(nisaharan/clean-census-acs-data: parameterized remote scan with source-side
projection/predicate pushdown -> schema normalization/alignment ->
metadata-driven rename -> union -> typed bulk-load sink, with retry,
throttling, fallback and audit) as an idiomatic Spark DataFrame library,
plus the engine-tier relational operators (joins, aggregates, windows,
rollup/cube, top-k, set ops) and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
the reference lacks.

Design stance (SURVEY.md §7): a library of composable DataFrame transforms
+ a thin pipeline runner. Declarative plans; Catalyst does pushdown,
pruning, join selection. Custom code concentrates in the REST source
(mapInPandas), the cleaning/alignment transform library, and extension
operators.
"""

__version__ = "0.1.0"

from clean_census_acs_data_spark.session import get_spark  # noqa: F401
from clean_census_acs_data_spark.io import load_table, TABLES  # noqa: F401
