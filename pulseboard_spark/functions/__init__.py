from pulseboard_spark.functions.ids import normalize_id, strip_prefix  # noqa: F401
from pulseboard_spark.functions.core import severity, lww_order_key  # noqa: F401
