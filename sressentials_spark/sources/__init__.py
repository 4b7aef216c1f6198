"""Sources: log-file scans and the star-schema table registry."""

from sressentials_spark.sources.mongo_log import read_mongo_log
from sressentials_spark.sources.mysql_log import read_mysql_log
from sressentials_spark.sources.tables import load_table, register_views

__all__ = ["read_mongo_log", "read_mysql_log", "load_table", "register_views"]
