"""Deployment-mode test: spark-submit --py-files (the north rule's
launch shape), end to end in a fresh JVM.

The cluster launch is ``spark-submit --py-files movement_spark.zip
driver.py``; this test builds the same zip `ensure_shipped` ships,
launches a REAL spark-submit from a foreign cwd with the repo absent
from sys.path, and runs the flagship query — proving the engine is
importable and executable purely from the shipped artifact.
"""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.getOrCreate())
from movement_spark.session import tune_session
from movement_spark.operators.windows import tumbling_token_throughput
from movement_spark.sources.tokens import token_sequences
tune_session(spark)
df = tumbling_token_throughput(token_sequences(spark, sys.argv[1]))
print("ROWS=%d" % df.count())
spark.stop()
"""


def test_spark_submit_py_files(tmp_path, sf_dir):
    pkg_dir = os.path.join(REPO, "movement_spark")
    zip_path = str(tmp_path / "movement_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(sys.executable)), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    out = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--py-files", zip_path, str(driver), sf_dir],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path))  # foreign cwd: repo not importable implicitly
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [ln for ln in out.stdout.splitlines() if ln.startswith("ROWS=")]
    assert rows and int(rows[0].split("=")[1]) > 0


CLUSTER_DRIVER = """
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.getOrCreate())
from movement_spark.session import tune_session
tune_session(spark)
from movement_spark import queries as Q
df = Q.queries()["multimodal_feature_stats"](spark, sys.argv[1])
print("ROWS=%d" % df.count())
spark.stop()
"""


def test_spark_submit_two_executor_cluster(tmp_path, sf_dir):
    """The same --py-files launch against local-cluster[2,...] — TWO
    separate executor JVMs with real serialization boundaries (the
    closest this sandbox gets to a multi-executor cluster). The query
    under test runs a Python/Arrow stage (mapInPandas), so the shipped
    zip must reach the executor-side Python workers, not just the
    driver — the class of bug local[*] structurally cannot catch."""
    pkg_dir = os.path.join(REPO, "movement_spark")
    zip_path = str(tmp_path / "movement_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(CLUSTER_DRIVER)
    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(sys.executable)), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    out = subprocess.run(
        [spark_submit, "--master", "local-cluster[2,2,2048]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path, str(driver), sf_dir],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [ln for ln in out.stdout.splitlines() if ln.startswith("ROWS=")]
    assert rows and int(rows[0].split("=")[1]) > 0
