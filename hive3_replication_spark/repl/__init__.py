"""The replication pipeline (SURVEY.md §3): PySpark-native re-expression of
hive3repl.sh — status probe, bootstrap snapshot, incremental replay,
verification ladder, run registry, retry.
"""
