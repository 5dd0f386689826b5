from kinesis_log_watcher_spark.queries.base import Query, load, register, registry

__all__ = ["Query", "load", "register", "registry"]
