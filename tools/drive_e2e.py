"""End-to-end library drive: table create -> fragmented append -> compact ->
cluster -> time travel -> decode-phash check."""
import sys, tempfile, shutil
sys.path.insert(0, "/root/repo")
from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction
from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
from ocel_ocpn_lakehouse_spark.maintenance.verify import verify_checksum_equivalence, verify_decode_phash
from ocel_ocpn_lakehouse_spark.session import get_spark
from pyspark.sql import functions as F

wh = tempfile.mkdtemp(prefix="drive_wh_")
spark = get_spark("drive", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
cat = Catalog(wh)
t = cat.create_table("ocel.images", IMAGE_SCHEMA, TableSpec(
    partition_spec=PartitionSpec.bucket("image_id", 4),
    sort_order=SortOrder.by("phash"),
    properties={"write.target-file-size-bytes": str(512*1024), "compact.small-file-bytes": str(128*1024)}))
t.append(synth_images_df(spark, 600), num_files=12, distribution="fragment")
s1 = t.current_snapshot().snapshot_id
n1 = t.scan(spark).count()
files1 = len(t.live_entries())
st = SystemTables(cat.warehouse)
rc = execute_compaction(spark, t, st, "ocel.images"); t.refresh()
rz = execute_cluster(spark, t, st, "ocel.images", curve="zorder"); t.refresh()
files2 = len(t.live_entries())
n2 = t.scan(spark).count()
ntt = t.scan(spark, snapshot_id=s1).count()
v1 = verify_checksum_equivalence(spark, t, s1)
v2 = verify_decode_phash(spark, t)
print("ROWS", n1, n2, "timetravel", ntt)
print("FILES", files1, "->", files2)
print("COMPACT", rc["status"], "CLUSTER", rz["status"])
print("CHECKSUM_EQ", v1["passed"], "DECODE", v2["passed"])
assert n1 == n2 == ntt == 600 and files2 < files1 and v1["passed"] and v2["passed"]
print("E2E OK")
spark.stop(); shutil.rmtree(wh, ignore_errors=True)
