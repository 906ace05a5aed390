"""JVM-native ``sbs1-jvm`` streaming source: packaging + session glue.

The source itself is ~500 lines of Java (``java/src/sbs1/
Sbs1JvmSource.java``) implementing Spark's DataSource V2 streaming API
-- the same multi-receiver design as the Python partitioned reader in
:mod:`.sbs1_source` (drain thread per receiver, blob-granularity
replay buffer with recv backpressure, per-receiver line-count offsets,
bounded data-bearing partitions), with framing moved BELOW Python
(VERDICT r11 ask #1):

- drain + framing run on plain JVM threads -- no GIL, so N receivers
  genuinely parallelize (the Python source's measured one-box ceiling
  was ~300k rows/s with ALL drain threads serialized by the driver
  GIL, BASELINE.md round-11 row);
- partitions carry a handful of large ``byte[]`` blobs through Java
  serialization -- size-proportional, no per-row cost. This is why the
  builtin ``socket`` source union is NOT the answer: its per-row task
  payloads measure ~56k rows/s of addBatch serialization
  (BASELINE.md round-12 row), 5x WORSE than the Python source;
- executor tasks split blobs into lines and emit rows as
  ``UTF8String`` slices pointing into the blob (no per-line copy).

The jar must be on the session's classpath AT JVM LAUNCH
(``spark.jars``): DataSource V2 lookup happens in the driver's
classloader, which ``addJar`` cannot extend after the fact. Use
:func:`jvm_source_conf` when building the session:

    spark = get_spark(..., extra_conf=jvm_source_conf())
    bronze = bronze_from_sbs1_jvm(spark, [("h1", 30003), ...])

The jar is committed; :func:`jvm_source_jar` rebuilds it from source
when missing and a JDK is available (``java/build.sh``).
"""

from __future__ import annotations

import os
import subprocess

_JAVA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "java",
)
_JAR = os.path.join(_JAVA_DIR, "sbs1-jvm-source.jar")


def jvm_source_jar() -> str:
    """Path to the source jar, building it from the committed Java
    source if absent OR STALE (requires javac; the jar itself is
    committed, so this is normally a no-op). Staleness is an mtime
    compare against the .java source and build.sh -- without it, an
    edit to Sbs1JvmSource.java left the committed jar silently serving
    the old class bytes to conftest, the CLI, and every test (ADVICE
    r12)."""
    inputs = [
        os.path.join(_JAVA_DIR, "src", "sbs1", "Sbs1JvmSource.java"),
        os.path.join(_JAVA_DIR, "build.sh"),
    ]
    stale = not os.path.exists(_JAR) or any(
        os.path.exists(p) and os.path.getmtime(p) > os.path.getmtime(_JAR)
        for p in inputs
    )
    if stale:
        subprocess.run(
            ["sh", os.path.join(_JAVA_DIR, "build.sh")],
            check=True,
            capture_output=True,
        )
    return _JAR


def jvm_source_conf() -> dict[str, str]:
    """``extra_conf`` entries that put the source on the session
    classpath. Merge with any other spark.jars entries yourself if the
    deployment already ships jars."""
    return {"spark.jars": jvm_source_jar()}


def jvm_source_available(spark) -> bool:
    """True when the driver JVM can load the source class -- i.e. the
    session was launched with :func:`jvm_source_conf`."""
    try:
        spark._jvm.java.lang.Class.forName(
            "sbs1.Sbs1JvmSource",
            False,
            spark._jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader(),
        )
        return True
    except Exception:
        return False
