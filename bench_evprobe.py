"""Throwaway diagnostic r17: full suite with event log + per-query timestamps.
NOT part of the bench contract; delete after diagnosis."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench
from feast_java_old_spark.sources.tables import session_builder

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = session_builder(
        "bench-evprobe", master=f"local[{cpus}]",
        **{
            "spark.sql.shuffle.partitions": str(max(int(cpus), 16)),
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "64MB",
            "spark.cleaner.periodicGC.interval": "15s",
            "spark.driver.extraJavaOptions": "-XX:+ExplicitGCInvokesConcurrent -XX:ReservedCodeCacheSize=1g",
            "spark.python.sql.dataFrameDebugging.enabled": "false",
            "spark.sql.ui.retainedExecutions": "50",
            "spark.ui.retainedJobs": "300",
            "spark.ui.retainedStages": "500",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "/tmp/spark-events",
        },
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm(spark, sf_dir)
    import __spark_entry__ as e
    qs = e.queries()
    rows = []
    for name in bench.HEADLINE:
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        spark.catalog.clearCache()
        rows.append({"q": name, "t0": round(t0, 3), "wall": round(el, 3)})
        print(json.dumps(rows[-1]), flush=True)
    json.dump(rows, open("/tmp/evprobe.json", "w"))
    print("APPID", spark.sparkContext.applicationId, flush=True)

if __name__ == "__main__":
    main()
