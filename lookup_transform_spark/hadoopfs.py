"""Shared py4j Hadoop-FileSystem access.

Index/sink code needs existence checks and renames through the path's
OWN Hadoop ``FileSystem`` — a driver-local ``os.path`` call is False
for every ``hdfs://`` / ``s3a://`` location (and for ``file:`` URIs),
which reads as "no index" / "no staged commit" and silently skips
re-attach or recovery logic. The three lines of py4j plumbing were
previously copied in bucketing, dedup, and the upsert writer; any
hardening (URI normalization, Spark Connect guards) belongs here once.
"""

from __future__ import annotations


def hadoop_fs(spark, path_str: str):
    """``(FileSystem, Path)`` for ``path_str`` via the session's Hadoop
    configuration — the FileSystem is the PATH's own (scheme-resolved),
    not necessarily the default one."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_exists(spark, path_str: str) -> bool:
    """Existence check through the path's own Hadoop FileSystem."""
    fs, jpath = hadoop_fs(spark, path_str)
    return fs.exists(jpath)
