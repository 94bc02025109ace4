"""Round-16 drifter protocol (VERDICT r15 next #6): in-session
warm-ordering repeats of sample_quantiles with controls."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gemmsql import get_spark
import __spark_entry__ as e

spark = get_spark("drifter-r16")
sf = "/root/testdata/sf0.1"
qs = e.queries()

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# session warmer (round-13 protocol)
noop(qs["entropy"](spark, sf))

def timed(name):
    t0 = time.perf_counter()
    noop(qs[name](spark, sf))
    return round(time.perf_counter() - t0, 3)

order = (["sample_quantiles", "segment_value_quantiles", "tfrecord_ingest"] * 4
         + ["sample_quantiles"] * 4)
res = {}
for n in order:
    res.setdefault(n, []).append(timed(n))
for n, ts in res.items():
    print("DRIFT", n, ts, file=sys.stderr)
    print("DRIFT", n, ts)
spark.stop()
