"""Build the Graft Catalyst extension jar (jvm/GraftSparkExtensions.scala)
with the Scala compiler that ships inside the pyspark wheel — no external
toolchain. Idempotent: rebuilds only when the source is newer than the jar.

Usage:  python tools/build_extension.py   (prints the jar path)
        from tools.build_extension import ensure_jar; ensure_jar()
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "jvm", "GraftSparkExtensions.scala")
OUT_DIR = os.path.join(REPO, "jvm", "target")
CLASSES = os.path.join(OUT_DIR, "classes")
JAR = os.path.join(OUT_DIR, "graft-spark-extensions.jar")


def _spark_jars() -> str:
    import pyspark
    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def _java_bin(name: str) -> str:
    home = os.environ.get("JAVA_HOME")
    if home and os.path.exists(os.path.join(home, "bin", name)):
        return os.path.join(home, "bin", name)
    return name


def ensure_jar() -> str:
    """Compile + jar if stale; return the jar path."""
    if (os.path.exists(JAR)
            and os.path.getmtime(JAR) >= os.path.getmtime(SRC)):
        return JAR
    jars = _spark_jars()
    cp = os.path.join(jars, "*")
    shutil.rmtree(CLASSES, ignore_errors=True)
    os.makedirs(CLASSES, exist_ok=True)
    # scala-compiler ships in the pyspark wheel; drive it through the JVM
    subprocess.run(
        [_java_bin("java"), "-cp", cp, "scala.tools.nsc.Main",
         "-classpath", cp, "-d", CLASSES, SRC],
        check=True, capture_output=True, text=True)
    subprocess.run(
        [_java_bin("jar"), "cf", JAR, "-C", CLASSES, "."],
        check=True, capture_output=True, text=True)
    return JAR


if __name__ == "__main__":
    try:
        print(ensure_jar())
    except subprocess.CalledProcessError as e:
        sys.stderr.write(e.stderr or str(e))
        sys.exit(1)
