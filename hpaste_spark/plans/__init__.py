from hpaste_spark.plans.query import Query2Builder, ClauseBuilder
from hpaste_spark.plans.job import HJob, HTask

__all__ = ["Query2Builder", "ClauseBuilder", "HJob", "HTask"]
