from lookup_transform_spark.plans.lookup import LookupSpec

__all__ = ["LookupSpec"]
