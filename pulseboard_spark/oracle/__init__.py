from pulseboard_spark.oracle.sql import ORACLE_SQL  # noqa: F401
