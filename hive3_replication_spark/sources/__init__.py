"""Sources and sinks (SURVEY.md §2.1): parquet scans, delimited-resultset
parsing, JDBC source/sink, snapshot dump/load, log sink, distributed copy.
"""
