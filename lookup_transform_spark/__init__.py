"""lookup_transform_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the CDAP Lookup batch joiner
(reference: ``src/main/java/io/cdap/plugin/batch/joiner/Lookup.java``)
as idiomatic PySpark, and extends it with the relational / LLM-data-
pipeline / streaming operator tiers catalogued in SURVEY.md §2.

Design stance: declare logical plans with the DataFrame API and let
Catalyst/Tungsten choose physical strategy; Python-side code only
validates, parameterizes, and assembles plans (mirroring the reference,
whose plugin never touches a record at run time — Lookup.java:186-257
emits a declarative JoinDefinition and delegates execution).
"""

from lookup_transform_spark.errors import LookupConfigError, ValidationFailure
from lookup_transform_spark.plans.lookup import LookupSpec

__all__ = ["LookupSpec", "LookupConfigError", "ValidationFailure"]
__version__ = "0.1.0"
