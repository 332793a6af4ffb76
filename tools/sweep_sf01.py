"""Full-catalog sweep at sf0.1: count() every entry, flag ZERO-ROWS / errors."""
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
from tigate_spark.catalog import get_catalog
from tigate_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("sweep", cpus=16)
cat = get_catalog()
if len(sys.argv) > 2 and sys.argv[1] == "--only":
    names = sys.argv[2].split(",")
    cat = {n: cat[n] for n in names}
t_all = time.time()
bad = []
heaviest = []
for i, (name, spec) in enumerate(cat.items()):
    t0 = time.time()
    try:
        n = spec.builder(spark, SF).count()
        dt = time.time() - t0
        heaviest.append((dt, name))
        flag = " ZERO-ROWS" if n == 0 else ""
        if flag:
            bad.append(name)
        print(f"[{i+1}/{len(cat)}] {name}: {n} rows ({dt:.1f}s){flag}", flush=True)
    except Exception:
        print(f"[{i+1}/{len(cat)}] {name}: ERROR", flush=True)
        traceback.print_exc(limit=2)
        bad.append(name)
print(f"\ntotal {time.time()-t_all:.0f}s; flagged: {bad}")
print("heaviest:", sorted(heaviest, reverse=True)[:5])
sys.exit(1 if bad else 0)
