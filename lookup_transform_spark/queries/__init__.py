"""Query tier modules — imported (in original source order) by the registry tail."""

TIER_MODULES = (
    "q_lookup",
    "q_relational",
    "q_curation",
    "q_sources_udf",
    "q_streaming",
    "q_breadth",
    "q_analytic",
    "q_pipeline",
    "q_tpch",
    "q_corpus",
)
