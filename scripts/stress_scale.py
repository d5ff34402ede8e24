"""Scale probe beyond the testdata SF range: inflate events 64x (~6.4M
rows at sf0.1 base) and re-run flagship kernels; runtime should stay
near-linear in rows if the plan shapes hold."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from feast_java_old_spark.sources.tables import session_builder, load_table
from feast_java_old_spark.operators.materialize import latest_per_key
from feast_java_old_spark.operators.historical import asof_join
from feast_java_old_spark.operators import features, windows

spark = session_builder("stress", master="local[32]", **{
    "spark.sql.shuffle.partitions": "64", "spark.ui.enabled": "false",
    "spark.driver.memory": "48g", "spark.sql.autoBroadcastJoinThreshold": "64MB"}).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

def inflated(mult):
    ev = load_table(spark, sf, "events")
    return (ev.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .select(
            (F.col("user_id") + F.col("__r") * 1000).alias("user_id"),
            F.timestamp_micros(F.unix_micros("ts") + F.col("__r")).alias("event_timestamp"),
            (F.col("event_id") * mult + F.col("__r")).alias("event_id"),
            "event_type", "value"))

def run(name, df):
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)

for mult in (1, 64):
    ev = inflated(mult)
    n = ev.count()
    print(f"--- mult={mult} rows={n}")
    run("latest_per_key", latest_per_key(ev, ["user_id"], "event_timestamp"))
    req = ev.where(F.col("event_id") % 97 == 0).select("user_id", F.col("event_timestamp").alias("request_ts"))
    run("asof_union_window", asof_join(req, ev.select("user_id","event_timestamp","value"), ["user_id"], feature_cols=["value"]))
    run("window_rollup", ev.groupBy("event_type", F.window("event_timestamp", "1 hour")).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")))
    run("ewma", features.ewma_features(ev, ["user_id"], "value", seq_col="event_id"))
    run("mergeable_rollup", features.mergeable_rollup(ev, ["user_id","event_type"], "value"))
