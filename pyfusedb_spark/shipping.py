"""Ship the engine package to executors (spark-submit --py-files analog).

The north rule requires the pipeline to run via ``spark-submit
--py-files``. When launched any other way (driver cwd outside the repo,
notebook, the graft driver), executors would fail to unpickle our pandas
UDFs with ``ModuleNotFoundError: pyfusedb_spark``. ``ensure_shipped``
zips the package once per session and registers it with
``SparkContext.addPyFile`` — idempotent, a no-op when the module is
already importable on workers via PYTHONPATH.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_shipped(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"pyfusedb_spark-{os.getpid()}-{app_id}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "pyfusedb_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app_id)
