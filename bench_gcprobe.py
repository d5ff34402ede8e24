"""Throwaway diagnostic r17: per-query wall + JVM GC time/count + safepoint.
NOT part of the bench contract; delete after diagnosis."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench._build_session()
    bench._warm(spark, sf_dir)
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    def gc_stats():
        t = 0; c = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            b = it.next()
            t += b.getCollectionTime(); c += b.getCollectionCount()
        return t, c
    import __spark_entry__ as e
    qs = e.queries()
    rows = []
    for name in bench.HEADLINE:
        g0, c0 = gc_stats()
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        g1, c1 = gc_stats()
        spark.catalog.clearCache()
        rows.append({"q": name, "wall": round(el, 3),
                     "jgc_ms": g1 - g0, "jgc_n": c1 - c0})
        print(json.dumps(rows[-1]), flush=True)
    json.dump(rows, open("/tmp/gcprobe2.json", "w"))

if __name__ == "__main__":
    main()
