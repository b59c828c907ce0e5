"""S6 generator: determinism, mix ratios, duplicate rate, pipeline feed."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulseboard_spark.sources.generator import cdp_event_generator, entity_event_generator


def test_entity_generator_deterministic(spark):
    a = entity_event_generator(spark, 2000, seed=7)
    b = entity_event_generator(spark, 2000, seed=7)
    ha = a.select(F.md5(F.to_json(F.struct(*a.columns))).alias("h")).agg(F.sum(F.crc32("h"))).collect()[0][0]
    hb = b.select(F.md5(F.to_json(F.struct(*b.columns))).alias("h")).agg(F.sum(F.crc32("h"))).collect()[0][0]
    assert ha == hb
    c = entity_event_generator(spark, 2000, seed=8)
    hc = c.select(F.md5(F.to_json(F.struct(*c.columns))).alias("h")).agg(F.sum(F.crc32("h"))).collect()[0][0]
    assert ha != hc


def test_entity_generator_mix_and_dups(spark):
    df = entity_event_generator(spark, 20_000, profile="SASE", seed=1).cache()
    n = df.count()
    mix = {r["type"]: r["count"] for r in df.groupBy("type").count().collect()}
    assert abs(mix["CONN_OPEN"] / n - 0.5) < 0.02
    assert abs(mix["CONN_BYTES"] / n - 0.3) < 0.02
    assert abs(mix["LOGIN"] / n - 0.2) < 0.02
    dup_rate = 1 - df.select("event_id").distinct().count() / n
    assert 0.03 < dup_rate < 0.07  # ~5% duplicate ids (`Simulator.kt:392-407`)
    # values in the reference's ranges
    vr = df.filter(F.col("type") == "CONN_OPEN").agg(F.min("value"), F.max("value")).collect()[0]
    assert vr[0] >= 1 and vr[1] < 100
    df.unpersist()


def test_igaming_mix(spark):
    df = entity_event_generator(spark, 10_000, profile="IGAMING", seed=3)
    mix = {r["type"]: r["count"] for r in df.groupBy("type").count().collect()}
    assert abs(mix["BET_PLACED"] / 10_000 - 0.6) < 0.03


def test_cdp_generator_feeds_pipeline(spark):
    """Generated CDP events must flow through validation + identity + profiles."""
    from pulseboard_spark.operators.identity import valid_cdp_events, components_for, resolve_profiles
    from pulseboard_spark.operators.profiles import build_profiles

    raw = cdp_event_generator(spark, 3000, n_users=10, seed=5)
    mix = {r["ctype"]: r["count"] for r in raw.groupBy("ctype").count().collect()}
    assert abs(mix["IDENTIFY"] / 3000 - 0.2) < 0.03
    assert abs(mix["TRACK"] / 3000 - 0.7) < 0.03
    cvalid = valid_cdp_events(raw).cache()
    evprof = resolve_profiles(cvalid, components_for(cvalid))
    profs = build_profiles(evprof)
    # user-N and anon-N share events, so identity collapses to <= n_users profiles
    assert 0 < profs.count() <= 10
    cvalid.unpersist()
