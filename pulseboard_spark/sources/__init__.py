from pulseboard_spark.sources.tables import (  # noqa: F401
    load_table,
    load_events,
    entity_events,
    cdp_events,
    TABLES,
)
