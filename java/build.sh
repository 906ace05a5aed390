#!/bin/sh
# Build the JVM-native SBS-1 source jar (java/src -> java/sbs1-jvm-source.jar).
# Requires javac 17+ and the local Spark install's jars for compile-time API.
set -e
cd "$(dirname "$0")"
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
rm -rf build
mkdir -p build/classes
javac -cp "$SPARK_JARS/*" -d build/classes src/sbs1/Sbs1JvmSource.java
mkdir -p build/classes/META-INF/services
cp src/META-INF/services/org.apache.spark.sql.sources.DataSourceRegister \
   build/classes/META-INF/services/
jar cf sbs1-jvm-source.jar -C build/classes .
echo "built $(pwd)/sbs1-jvm-source.jar"
