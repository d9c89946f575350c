from hpaste_spark.operators.mutations import OpBase, OpsResult
from hpaste_spark.operators.cache import QueryResultCache, NoOpCache, TestCache

__all__ = ["OpBase", "OpsResult", "QueryResultCache", "NoOpCache", "TestCache"]
