"""Driver-gate query registry: name → (spark, sf_dir) → DataFrame, plus
DuckDB oracle SQL for everything SQL-expressible."""

from deed_ocr_spark.queries import (
    components,
    extraction,
    relational,
    similarity,
    textpipe,
)

QUERIES = {
    **relational.QUERIES,
    **textpipe.QUERIES,
    **similarity.QUERIES,
    **extraction.QUERIES,
    **components.QUERIES,
}

ORACLES = {
    **relational.ORACLES,
    **textpipe.ORACLES,
    **similarity.ORACLES,
    **extraction.ORACLES,
    **components.ORACLES,
}

assert set(ORACLES) <= set(QUERIES)
